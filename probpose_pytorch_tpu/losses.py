"""Losses, fully on-device (TPU-native rebuild of /root/reference/probpose/loss.py).

The reference's composite loss derives its OKS/error training targets by
moving heatmaps to the host and decoding them per-sample in NumPy every step
(loss.py:512-640) — a device->host sync inside the training loop. Here the
same targets are derived from batched decode ops *inside jit*
(see ops/heatmap.py, ops/udp.py, ops/oks.py), so the entire loss — including
target derivation — compiles into the train step.

All loss formulas match the reference term-for-term; parity is tested with
hand-computed NumPy oracles in tests/test_losses.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.codec import Codec, _ProbMapBase
from probpose_pytorch_tpu.ops.heatmap import (
    calc_distances,
    distance_acc,
    heatmap_maximum,
)
from probpose_pytorch_tpu.ops.oks import oks_targets_from_coords

__all__ = [
    "oks_heatmap_loss",
    "binary_cross_entropy",
    "mse_loss",
    "l1_log_loss",
    "pose_pck_accuracy",
    "balanced_binary_accuracy",
    "masked_mae",
    "ProbPoseLoss",
]

_SOBEL_X = np.array(
    [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], np.float32
)
_SOBEL_Y = _SOBEL_X.T.copy()


def _sobel_gradient_sq(x: jax.Array) -> jax.Array:
    """Squared Sobel gradient magnitude with zero ('same') padding — matches
    the reference's smoothness term (loss.py:106-110)."""
    B, K, H, W = x.shape
    inp = x.reshape(B * K, 1, H, W)
    kx = jnp.asarray(_SOBEL_X).reshape(1, 1, 3, 3)
    ky = jnp.asarray(_SOBEL_Y).reshape(1, 1, 3, 3)
    dn = jax.lax.conv_dimension_numbers(inp.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(inp, kx, (1, 1), "SAME", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(inp, ky, (1, 1), "SAME", dimension_numbers=dn)
    return (gx**2 + gy**2).reshape(B, K, H, W)


def _combine_mask(
    target: jax.Array,
    target_weights: jax.Array | None,
    mask: jax.Array | None,
    skip_empty_channel: bool,
) -> jax.Array | None:
    """Reference OKSHeatmapLoss._get_mask semantics (loss.py:145-191)."""
    out = mask
    if target_weights is not None:
        tw = target_weights.reshape(
            target_weights.shape + (1,) * (target.ndim - target_weights.ndim)
        )
        out = tw if out is None else out * tw
    if skip_empty_channel:
        ne = jnp.any(target != 0, axis=(-2, -1), keepdims=True)
        out = ne if out is None else out * ne
    return out


def oks_heatmap_loss(
    output: jax.Array,
    target: jax.Array,
    target_weights: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    oks_type: str = "minus",
    smoothing_weight: float = 0.2,
    gaussian_weight: float = 0.0,
    skip_empty_channel: bool = False,
    per_pixel: bool = False,
    per_keypoint: bool = False,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Expected-OKS heatmap loss (reference OKSHeatmapLoss, loss.py:18-143).

    loss = oks_w * oks_term + smoothing_w * sobel_grad^2 + gaussian_w * mse,
    where oks_term is output*(1-target) ("minus"), (1-output)*target ("plus"),
    or their mean ("both"); reduction per_pixel / per_keypoint / scalar mean.
    """
    assert oks_type in ("minus", "plus", "both")
    B, K, H, W = output.shape
    _mask = _combine_mask(target, target_weights, mask, skip_empty_channel)

    oks_minus = output * (1.0 - target)
    oks_plus = (1.0 - output) * target
    oks = {
        "minus": oks_minus,
        "plus": oks_plus,
        "both": (oks_minus + oks_plus) / 2.0,
    }[oks_type]

    mse = (output - target) ** 2
    gradient = _sobel_gradient_sq(output)

    if _mask is not None:
        oks = oks * _mask
        mse = mse * _mask
        gradient = gradient * _mask

    oks_w = 1.0 - smoothing_weight - gaussian_weight
    if per_pixel:
        loss = smoothing_weight * gradient + oks_w * oks + gaussian_weight * mse
    else:
        max_grad = jnp.max(gradient.reshape(B, K, H * W), axis=-1)
        loss = (
            oks_w * jnp.sum(oks, axis=(2, 3))
            + smoothing_weight * max_grad
            + gaussian_weight * jnp.mean(mse, axis=(2, 3))
        )
        if not per_keypoint:
            loss = jnp.mean(loss)
    return loss * loss_weight


def binary_cross_entropy(
    output: jax.Array,
    target: jax.Array,
    target_weight: jax.Array | None = None,
    *,
    from_probs: bool = False,
    reduction: str = "mean",
    loss_weight: float = 1.0,
) -> jax.Array:
    """BCE on probabilities (`from_probs=True`, the head applies sigmoid) or
    on logits. Reference BCELoss (loss.py:194-260; its `use_sigmoid=True`
    flag means "input already went through sigmoid")."""
    if from_probs:
        # torch.F.binary_cross_entropy clamps its log outputs at -100
        # (the reference's BCELoss rides on it). A 1e-12 epsilon-clip on
        # p is NOT equivalent in f32: 1 - 1e-12 rounds to exactly 1.0, so
        # a saturated sigmoid (p == 1.0, which trained branches reach)
        # yields log(0) = -inf and 0 * -inf = NaN — observed as a
        # train-killing NaN cascade in a long SimCC run. Clip p to the
        # smallest NORMAL f32 at the bottom (XLA flushes subnormals to
        # zero, so an e^-100 bound would silently clip to 0.0 and
        # reintroduce the -inf) and 1 - 2^-24 at the top, keeping both
        # log terms finite (>= -87.3, the f32 analogue of torch's -100
        # clamp); jnp.clip has zero gradient outside its bounds, so a
        # saturated branch gets zero gradient instead of NaN.
        p = jnp.clip(output.astype(jnp.float32), 1.1754944e-38, 1.0 - 6e-8)
        loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    else:
        # Numerically stable logits BCE.
        loss = jnp.maximum(output, 0) - output * target + jnp.log1p(
            jnp.exp(-jnp.abs(output))
        )
    if target_weight is not None:
        if target_weight.ndim == 1:
            target_weight = target_weight[:, None]
        loss = loss * target_weight
    if reduction == "mean":
        loss = jnp.mean(loss)
    elif reduction == "sum":
        loss = jnp.sum(loss)
    return loss * loss_weight


def mse_loss(
    output: jax.Array,
    target: jax.Array,
    target_weight: jax.Array | None = None,
    *,
    loss_weight: float = 1.0,
) -> jax.Array:
    """MSE with the reference's multiplicative weighting (loss.py:263-292):
    mse(output * w, target * w), mean over all elements."""
    if target_weight is not None:
        output = output * target_weight
        target = target * target_weight
    return jnp.mean((output - target) ** 2) * loss_weight


def _smooth_l1(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x**2, ax - 0.5)


def l1_log_loss(
    output: jax.Array,
    target: jax.Array,
    target_weight: jax.Array | None = None,
    *,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Smooth-L1 on log(1+x) — relative-error regression loss
    (reference L1LogLoss, loss.py:295-339)."""
    output = jnp.log1p(output)
    target = jnp.log1p(target)
    if target_weight is not None:
        w = target_weight.reshape(
            target_weight.shape + (1,) * (output.ndim - target_weight.ndim)
        )
        output = output * w
        target = target * w
    return jnp.mean(_smooth_l1(output - target)) * loss_weight


# ---------------------------------------------------------------------------
# Accuracy metrics (on-device)
# ---------------------------------------------------------------------------

def pose_pck_accuracy(
    output: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    thr: float = 0.05,
    normalize: jax.Array | None = None,
    method: str = "argmax",
    conv_ops=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PCK from heatmaps (reference pose_pck_accuracy, loss.py:767-822).
    Returns (per-kpt acc, avg acc, count); counts are traced scalars. Keeps
    the reference's [H, W] (not [W, H]) normalization quirk (loss.py:814).

    method='expected' uses the expected-value decoder and needs `conv_ops`
    from ops.heatmap.build_oks_conv_operators — the reference's 'expected'
    branch is unreachable (it omits the required sigmas, loss.py:820-821);
    here it works.
    """
    N, K, H, W = output.shape
    if normalize is None:
        normalize = jnp.tile(jnp.asarray([[H, W]], jnp.float32), (N, 1))
    if method == "expected":
        if conv_ops is None:
            raise ValueError("method='expected' requires conv_ops")
        from probpose_pytorch_tpu.ops.heatmap import expected_value_decode

        pred, _ = expected_value_decode(output, conv_ops)
        gt, _ = expected_value_decode(target, conv_ops)
    elif method == "argmax":
        pred, _ = heatmap_maximum(output)
        gt, _ = heatmap_maximum(target)
    else:
        raise ValueError(f"invalid method {method!r}")
    d = calc_distances(pred, gt, mask, normalize)  # (K, N)
    acc = jax.vmap(lambda row: distance_acc(row, thr))(d)
    valid = acc >= 0
    cnt = jnp.sum(valid)
    avg = jnp.sum(jnp.where(valid, acc, 0.0)) / jnp.maximum(cnt, 1)
    avg = jnp.where(cnt > 0, avg, 0.0)
    return acc, avg, cnt


def balanced_binary_accuracy(
    dt: jax.Array, gt: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Best balanced binary accuracy over thresholds 0.1 .. 0.95 (step 0.05).

    Deterministic on-device analogue of the reference's get_binary_accuracy
    with force_balanced=True (loss.py:653-697): instead of randomly
    subsampling equal positive/negative sets, we compute the exact balanced
    accuracy (TPR+TNR)/2 — the quantity the reference's subsampling estimates.
    Returns (best_acc, best_threshold); 0 if either class is empty.
    """
    thresholds = jnp.arange(0.1, 1.0, 0.05, dtype=jnp.float32)
    m = mask.reshape(-1)
    d = dt.reshape(-1)
    g = gt.reshape(-1) > 0.5
    pos = m & g
    neg = m & ~g
    npos = jnp.sum(pos)
    nneg = jnp.sum(neg)
    preds = d[:, None] > thresholds[None, :]  # (n, T)
    tpr = jnp.sum(preds & pos[:, None], axis=0) / jnp.maximum(npos, 1)
    tnr = jnp.sum(~preds & neg[:, None], axis=0) / jnp.maximum(nneg, 1)
    bal = (tpr + tnr) / 2.0
    best = jnp.argmax(bal)
    ok = (npos > 0) & (nneg > 0)
    return (
        jnp.where(ok, bal[best], 0.0),
        jnp.where(ok, thresholds[best], 0.0),
    )


def masked_mae(dt: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean absolute error (reference get_mae, loss.py:699-712)."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.abs(dt - gt) * m) / n


# ---------------------------------------------------------------------------
# Composite ProbPose loss
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ProbPoseLoss:
    """Composite 5-term ProbPose loss with in-jit target derivation.

    Rebuild of reference ProbPoseLoss (loss.py:342-712). The decode-based OKS
    and error targets use the codec's argmax+UDP decoder batched on device —
    the reference's per-sample host loop (loss.py:576-585) disappears into
    the compiled step.

    Call signature is functional: `loss(gt, pred)` returns a dict of scalar
    losses (and an accuracy dict when compute_acc=True).
    """

    codec: Codec
    freeze_error: bool = True
    freeze_oks: bool = False
    heatmap_smoothing_weight: float = 0.05
    heatmap_oks_type: str = "minus"

    @property
    def _probmap(self) -> _ProbMapBase:
        return self.codec.probmap

    def _decode_coords(self, heatmaps: jax.Array) -> jax.Array:
        # The decoded coordinates are training *targets*: the reference
        # derives them in NumPy (constants w.r.t. autograd, loss.py:568-585);
        # here the decode is traced, so stop_gradient keeps the semantics
        # (and keeps argmax/UDP non-differentiabilities out of the backward).
        coords, _ = self._probmap.decode(jax.lax.stop_gradient(heatmaps))
        return jax.lax.stop_gradient(coords)

    def __call__(
        self,
        gt: dict[str, jax.Array],
        pred: tuple[jax.Array, ...],
        keypoint_weights: jax.Array | None = None,
        learn_heatmaps_from_zeros: bool = False,
        compute_acc: bool = False,
    ) -> Any:
        dt_heatmaps, dt_probs, dt_vis, dt_oks, dt_errs = pred
        B, C, H, W = dt_heatmaps.shape
        f32 = jnp.float32

        gt_heatmaps = jnp.asarray(gt["heatmaps"], dt_heatmaps.dtype).reshape(
            B, C, H, W
        )
        gt_probs = jnp.asarray(gt["in_image"]).reshape(B, C).astype(jnp.int32)
        gt_annotated = (
            jnp.asarray(gt["keypoints_visible"]).reshape(B, C).astype(jnp.int32)
        )
        gt_vis = (
            jnp.asarray(gt["keypoints_visibility"]).reshape(B, C).astype(jnp.int32)
        )
        if keypoint_weights is None:
            keypoint_weights = jnp.ones((B, C), dt_heatmaps.dtype)
        keypoint_weights = keypoint_weights.reshape(B, C)

        dt_probs = dt_probs.reshape(B, C)
        dt_vis = dt_vis.reshape(B, C)
        dt_oks = dt_oks.reshape(B, C)
        dt_errs = dt_errs.reshape(B, C)

        # ---- derive OKS / error targets from heatmaps, on device ----
        need_decode = (not self.freeze_oks) or (not self.freeze_error)
        if need_decode:
            gt_coords = self._decode_coords(gt_heatmaps.astype(f32))
            dt_coords = self._decode_coords(dt_heatmaps.astype(f32))

        if self.freeze_error:
            gt_errs = jnp.zeros((B, C), dt_errs.dtype)
        else:
            # Euclidean distance between decoded gt and dt coordinates
            # (loss.py:512-548); coordinates are finite by construction here,
            # so the reference's NaN->-1 patch is a no-op.
            gt_errs = jnp.linalg.norm(gt_coords - dt_coords, axis=-1).astype(
                dt_errs.dtype
            )

        if self.freeze_oks:
            gt_oks = jnp.zeros((B, C), dt_oks.dtype)
            oks_weight = jnp.zeros((B,), dt_oks.dtype)
        else:
            gt_oks, oks_weight = oks_targets_from_coords(
                gt_coords,
                dt_coords,
                (gt_probs & gt_annotated).astype(f32),
                self._probmap.sigmas_array,
                (W, H),
            )
            gt_oks = gt_oks.astype(dt_oks.dtype)

        annotated_in = (gt_annotated & (gt_probs > 0.5)).astype(f32)

        # ---- the five loss terms (loss.py:428-464) ----
        heatmap_weights = (
            gt_annotated.astype(dt_heatmaps.dtype)
            if learn_heatmaps_from_zeros
            else keypoint_weights
        )
        heatmap_loss = jnp.mean(
            oks_heatmap_loss(
                dt_heatmaps,
                gt_heatmaps,
                heatmap_weights,
                oks_type=self.heatmap_oks_type,
                smoothing_weight=self.heatmap_smoothing_weight,
                per_pixel=True,
            )
        )
        probability_loss = binary_cross_entropy(
            dt_probs, gt_probs.astype(f32), from_probs=True
        )
        # The reference computes visible/invisible rebalancing weights
        # (loss.py:437-450) but its BCELoss is constructed with
        # use_target_weight=False (loss.py:354), so they are ignored; we
        # mirror the effective behavior (plain mean BCE).
        visibility_loss = binary_cross_entropy(
            dt_vis, gt_vis.astype(f32), from_probs=True
        )
        oks_loss = mse_loss(dt_oks, gt_oks, annotated_in)
        error_loss = l1_log_loss(dt_errs, gt_errs, annotated_in)

        losses = dict(
            kpt=heatmap_loss,
            probability=probability_loss,
            visibility=visibility_loss,
            oks=oks_loss,
            error=error_loss,
        )
        if not compute_acc:
            return losses

        _, acc_pose, _ = pose_pck_accuracy(
            dt_heatmaps.astype(f32),
            gt_heatmaps.astype(f32),
            keypoint_weights > 0.5,
        )
        acc_prob, _ = balanced_binary_accuracy(
            dt_probs, gt_probs.astype(f32), gt_annotated > 0.5
        )
        acc_vis, _ = balanced_binary_accuracy(
            dt_vis, gt_vis.astype(f32), annotated_in > 0.5
        )
        acc_oks = masked_mae(dt_oks, gt_oks, annotated_in > 0.5)
        acc_err = masked_mae(dt_errs, gt_errs, annotated_in > 0.5)
        return losses, dict(
            kpt=acc_pose,
            probability=acc_prob,
            visibility=acc_vis,
            oks=acc_oks,
            error=acc_err,
        )
