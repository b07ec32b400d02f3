"""Composite loss for the SimCC head family (models/simcc.py).

Mirror of `losses.ProbPoseLoss`'s contract — `loss(gt, pred)` with the
same term names (kpt / probability / visibility / oks / error), the same
in-jit target derivation, and the same `compute_acc` metrics — with the
localization term swapped: soft cross-entropy between the per-axis bin
logits and the codec's 1-D Gaussian labels (the SimCC/KLDiscret objective;
equal to KL divergence up to the labels' constant entropy, so gradients
are identical). OKS and error targets decode both the labels and the
logits through the same argmax+parabolic decoder (stop-gradiented — the
decoded coordinates are training constants, like the reference's
NumPy-derived targets, loss.py:550-640).

The reference has no SimCC family; term semantics anchor to reference
loss.py:342-712 via losses.ProbPoseLoss.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.codec_simcc import SimCCCodec, _axis_decode
from probpose_pytorch_tpu.losses import (
    balanced_binary_accuracy,
    binary_cross_entropy,
    l1_log_loss,
    masked_mae,
    mse_loss,
)
from probpose_pytorch_tpu.ops.oks import oks_targets_from_coords

__all__ = ["SimCCLoss"]


def _soft_cross_entropy(
    logits: jax.Array, labels: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted mean of -sum(labels * log_softmax(logits)) over (B, K)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -(labels * logp).sum(axis=-1)
    w = weights.astype(jnp.float32)
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)


@dataclass(frozen=True)
class SimCCLoss:
    codec: SimCCCodec
    freeze_error: bool = True
    freeze_oks: bool = False

    def _decode_bins(self, x_logits, y_logits) -> jax.Array:
        """Logits (or labels: log of a distribution is softmax-invariant,
        and argmax+parabola only needs monotone transforms) -> stop-grad
        (B, K, 2) coordinates in BIN space."""
        cx, _ = _axis_decode(jax.lax.stop_gradient(x_logits))
        cy, _ = _axis_decode(jax.lax.stop_gradient(y_logits))
        return jax.lax.stop_gradient(jnp.stack([cx, cy], axis=-1))

    def __call__(
        self,
        gt: dict[str, jax.Array],
        pred: tuple[Any, ...],
        keypoint_weights: jax.Array | None = None,
        learn_heatmaps_from_zeros: bool = False,
        compute_acc: bool = False,
    ) -> Any:
        (dt_x, dt_y), dt_probs, dt_vis, dt_oks, dt_errs = pred
        B, C = dt_x.shape[:2]
        f32 = jnp.float32

        gt_x = jnp.asarray(gt["x_labels"], f32).reshape(B, C, -1)
        gt_y = jnp.asarray(gt["y_labels"], f32).reshape(B, C, -1)
        gt_probs = jnp.asarray(gt["in_image"]).reshape(B, C).astype(jnp.int32)
        gt_annotated = (
            jnp.asarray(gt["keypoints_visible"]).reshape(B, C).astype(jnp.int32)
        )
        gt_vis = (
            jnp.asarray(gt["keypoints_visibility"])
            .reshape(B, C)
            .astype(jnp.int32)
        )
        if keypoint_weights is None:
            keypoint_weights = jnp.asarray(
                gt.get("keypoint_weights", jnp.ones((B, C))), f32
            )
        keypoint_weights = keypoint_weights.reshape(B, C)

        dt_probs = dt_probs.reshape(B, C)
        dt_vis = dt_vis.reshape(B, C)
        dt_oks = dt_oks.reshape(B, C)
        dt_errs = dt_errs.reshape(B, C)

        # ---- OKS / error targets from decoded coordinates, on device ----
        need_decode = (
            (not self.freeze_oks) or (not self.freeze_error) or compute_acc
        )
        if need_decode:
            eps = 1e-12
            gt_coords = self._decode_bins(
                jnp.log(gt_x + eps), jnp.log(gt_y + eps)
            )
            dt_coords = self._decode_bins(dt_x, dt_y)

        Wb, Hb = self.codec.label.bins
        if self.freeze_error:
            gt_errs = jnp.zeros((B, C), dt_errs.dtype)
        else:
            gt_errs = jnp.linalg.norm(gt_coords - dt_coords, axis=-1).astype(
                dt_errs.dtype
            )

        if self.freeze_oks:
            gt_oks = jnp.zeros((B, C), dt_oks.dtype)
        else:
            gt_oks, _ = oks_targets_from_coords(
                gt_coords,
                dt_coords,
                (gt_probs & gt_annotated).astype(f32),
                self.codec.label.sigmas_array,
                (Wb, Hb),
            )
            gt_oks = gt_oks.astype(dt_oks.dtype)

        annotated_in = (gt_annotated & (gt_probs > 0.5)).astype(f32)

        # ---- the five terms ----
        # ProbMap's learn_heatmaps_from_zeros trains annotated OUT-of-image
        # keypoints toward their (representable) all-zero heatmaps; a
        # softmax bin distribution cannot emit zeros — _axis_labels would
        # renormalize the truncated tail into a confident edge spike — so
        # the closest sound semantic here is annotated AND in-image
        # (off-grid keypoints contribute nothing either way).
        label_weights = (
            annotated_in
            if learn_heatmaps_from_zeros
            else keypoint_weights
        )
        kpt_loss = 0.5 * (
            _soft_cross_entropy(dt_x, gt_x, label_weights)
            + _soft_cross_entropy(dt_y, gt_y, label_weights)
        )
        probability_loss = binary_cross_entropy(
            dt_probs, gt_probs.astype(f32), from_probs=True
        )
        visibility_loss = binary_cross_entropy(
            dt_vis, gt_vis.astype(f32), from_probs=True
        )
        oks_loss = mse_loss(dt_oks, gt_oks, annotated_in)
        error_loss = l1_log_loss(dt_errs, gt_errs, annotated_in)

        losses = dict(
            kpt=kpt_loss,
            probability=probability_loss,
            visibility=visibility_loss,
            oks=oks_loss,
            error=error_loss,
        )
        if not compute_acc:
            return losses

        # PCK@0.05 from decoded coordinates (already decoded above —
        # compute_acc folds into need_decode), normalized per axis by
        # bins/10 — the pose_pck_accuracy convention transplanted to the
        # bin grid.
        norm = jnp.asarray([Wb / 10.0, Hb / 10.0], f32)
        dist = jnp.linalg.norm((gt_coords - dt_coords) / norm, axis=-1)
        mask = keypoint_weights > 0.5
        hits = ((dist < 0.5) & mask).sum()
        acc_pose = hits / jnp.maximum(mask.sum(), 1)
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
