"""On-device data augmentation for top-down pose training.

Greenfield subsystem (SURVEY.md §2.4: the reference has no augmentation
beyond crop/resize). TPU-native design: because cropping already runs on
device (ops/preprocess.py), geometric augmentation is expressed as *box and
keypoint transforms* — random horizontal flip (with left/right keypoint-pair
swapping), random scale/translation jitter of the person box, and photometric
jitter on the crop — all fused into the same jitted program as the train step.

All ops are pure functions of a PRNG key: reproducible and shardable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "AugmentConfig",
    "augment_boxes",
    "half_body_boxes",
    "flip_crops_and_keypoints",
    "rotate_crops",
    "rotate_crops_and_keypoints",
    "color_jitter",
    "average_flip_pred",
    "average_flip_pred_simcc",
    "COCO_FLIP_PAIRS",
]

# Left/right keypoint index pairs for the 17-keypoint COCO skeleton.
COCO_FLIP_PAIRS = (
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16),
)


@dataclass(frozen=True)
class AugmentConfig:
    flip_prob: float = 0.5
    scale_jitter: float = 0.15  # box scale ~ U[1-s, 1+s]
    shift_jitter: float = 0.05  # box shift as a fraction of box size
    # Random in-crop rotation: theta ~ U[-rotation_deg, +rotation_deg] per
    # sample (0 disables). Crop-space affine (corners fill black, exactly
    # the out-of-extent sampling the cropper performs); keypoints rotate
    # with the content and the codec's map-weighting drops any that leave
    # the crop.
    rotation_deg: float = 0.0
    brightness: float = 0.2
    contrast: float = 0.2
    flip_pairs: tuple[tuple[int, int], ...] = COCO_FLIP_PAIRS
    # Random half-body crops (the HRNet/MMPose RandomHalfBody recipe —
    # greenfield, the reference has no augmentation): with probability
    # half_body_prob per sample, when the sample has MORE THAN
    # half_body_min_total labeled keypoints and the randomly chosen half
    # (upper w.p. 0.5) has at least half_body_min_half, the crop box
    # becomes the chosen half's labeled-keypoint bbox, padded to the crop
    # aspect ratio and scaled by half_body_padding. Frame-mode training
    # only (crop-mode batches cannot re-crop). 0 disables.
    half_body_prob: float = 0.0
    half_body_min_total: int = 8
    half_body_min_half: int = 2
    half_body_padding: float = 1.5
    # COCO-17 upper body: nose/eyes/ears/shoulders/elbows/wrists (0-10).
    upper_body_ids: tuple[int, ...] = tuple(range(11))

    @property
    def enabled(self) -> bool:
        return (
            self.flip_prob > 0
            or self.scale_jitter > 0
            or self.shift_jitter > 0
            or self.rotation_deg > 0
            or self.brightness > 0
            or self.contrast > 0
        )


def augment_boxes(
    key: jax.Array, boxes: jax.Array, cfg: AugmentConfig
) -> jax.Array:
    """Random scale/shift jitter of (B, 4) xywh boxes about their centers."""
    B = boxes.shape[0]
    k1, k2 = jax.random.split(key)
    scale = 1.0 + cfg.scale_jitter * jax.random.uniform(
        k1, (B, 1), minval=-1.0, maxval=1.0
    )
    shift = cfg.shift_jitter * jax.random.uniform(
        k2, (B, 2), minval=-1.0, maxval=1.0
    )
    cx = boxes[:, 0:1] + boxes[:, 2:3] / 2 + shift[:, 0:1] * boxes[:, 2:3]
    cy = boxes[:, 1:2] + boxes[:, 3:4] / 2 + shift[:, 1:2] * boxes[:, 3:4]
    w = boxes[:, 2:3] * scale
    h = boxes[:, 3:4] * scale
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=1)


def half_body_boxes(
    key: jax.Array,
    boxes: jax.Array,
    keypoints: jax.Array,
    labeled: jax.Array,
    cfg: AugmentConfig,
    aspect: float | None = None,
) -> jax.Array:
    """Random half-body crop boxes, fused into the frame-mode train step.

    The HRNet `half_body_transform` / MMPose `RandomHalfBody` recipe as a
    pure where-select (no data-dependent control flow, jit/shard-safe):
    per sample, draw apply ~ Bern(half_body_prob) and a 50/50 upper/lower
    coin; when apply AND total labeled > half_body_min_total AND the
    chosen half has >= half_body_min_half labeled keypoints, replace the
    (B, 4) frame-space xywh box with the half's labeled-keypoint bbox,
    padded to `aspect` (crop W/H, matching data.coco.expand_bbox) and
    scaled by half_body_padding about its center. `keypoints` are
    FRAME-space (B, K, 2); `labeled` is (B, K), >0 where annotated.
    Keypoints that fall outside the new crop are handled downstream by
    the codec's map weighting, exactly like box jitter.
    """
    B, K, _ = keypoints.shape
    upper = np.zeros((K,), bool)
    upper[[i for i in cfg.upper_body_ids if i < K]] = True
    upper = jnp.asarray(upper)
    k1, k2 = jax.random.split(key)
    lab = labeled > 0
    upper_lab = upper[None, :] & lab
    lower_lab = ~upper[None, :] & lab
    # HRNet's selection: the coin picks upper only when upper has enough
    # labeled keypoints, otherwise it falls through to lower; a too-small
    # lower then invalidates the sample (no reverse fallback).
    coin = jax.random.bernoulli(k1, 0.5, (B,))
    use_upper = coin & (upper_lab.sum(axis=1) >= cfg.half_body_min_half)
    half = jnp.where(use_upper[:, None], upper_lab, lower_lab)
    apply = (
        (jax.random.uniform(k2, (B,)) < cfg.half_body_prob)
        & (lab.sum(axis=1) > cfg.half_body_min_total)
        & (half.sum(axis=1) >= cfg.half_body_min_half)
    )

    big = jnp.float32(1e9)
    x = keypoints[..., 0].astype(jnp.float32)
    y = keypoints[..., 1].astype(jnp.float32)
    xmin = jnp.min(jnp.where(half, x, big), axis=1)
    xmax = jnp.max(jnp.where(half, x, -big), axis=1)
    ymin = jnp.min(jnp.where(half, y, big), axis=1)
    ymax = jnp.max(jnp.where(half, y, -big), axis=1)
    cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
    # Floor at 1 px: min_half labeled keypoints can still be collinear,
    # and a zero-size box would degenerate the crop affine.
    w = jnp.maximum(xmax - xmin, 1.0)
    h = jnp.maximum(ymax - ymin, 1.0)
    if aspect is not None:
        wide = w > h * aspect
        h = jnp.where(wide, w / aspect, h)
        w = jnp.where(wide, w, h * aspect)
    w = w * cfg.half_body_padding
    h = h * cfg.half_body_padding
    nb = jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=1)
    return jnp.where(apply[:, None], nb, boxes.astype(jnp.float32))


def _swap_pairs(arr: jax.Array, pairs: Sequence[tuple[int, int]]) -> jax.Array:
    """Swap left/right keypoint channels along axis 1."""
    K = arr.shape[1]
    perm = np.arange(K)
    for a, b in pairs:
        if a < K and b < K:
            perm[a], perm[b] = perm[b], perm[a]
    return arr[:, jnp.asarray(perm)]


def flip_crops_and_keypoints(
    key: jax.Array,
    crops: jax.Array,
    keypoints: jax.Array,
    visible: jax.Array,
    visibility: jax.Array,
    cfg: AugmentConfig,
):
    """Random horizontal flip of (B, H, W, C) crops with matching keypoint
    mirroring and left/right identity swaps."""
    B, H, W, _ = crops.shape
    flip = jax.random.bernoulli(key, cfg.flip_prob, (B,))
    flipped = crops[:, :, ::-1, :]
    crops = jnp.where(flip[:, None, None, None], flipped, crops)

    kx = W - 1 - keypoints[..., 0]
    flipped_kpts = _swap_pairs(
        jnp.stack([kx, keypoints[..., 1]], axis=-1), cfg.flip_pairs
    )
    keypoints = jnp.where(flip[:, None, None], flipped_kpts, keypoints)
    visible = jnp.where(
        flip[:, None], _swap_pairs(visible, cfg.flip_pairs), visible
    )
    visibility = jnp.where(
        flip[:, None], _swap_pairs(visibility, cfg.flip_pairs), visibility
    )
    return crops, keypoints, visible, visibility


def rotate_crops(
    images: jax.Array, keypoints: jax.Array, theta: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Rotate (B, H, W, C) crops and their (B, K, 2) crop-space keypoints
    by per-sample angles `theta` (radians, counter-clockwise in image
    coordinates) about the crop center.

    Pixels: inverse-map bilinear resample (4-tap gather) with black
    outside the crop — the same out-of-extent convention as the cropper
    (ops/preprocess.py). Keypoints: the forward rotation, so they stay on
    the rotated content. Rotation is not axis-separable, hence the gather
    formulation rather than the cropper's band matmuls."""
    B, H, W, C = images.shape
    cos = jnp.cos(theta).astype(jnp.float32)
    sin = jnp.sin(theta).astype(jnp.float32)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dx, dy = xx - cx, yy - cy
    # destination -> source: R(-theta)
    sx = cos[:, None, None] * dx + sin[:, None, None] * dy + cx
    sy = -sin[:, None, None] * dx + cos[:, None, None] * dy + cy
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = sx - x0, sy - y0
    imgs = images.astype(jnp.float32)

    def tap(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        g = jax.vmap(lambda im, ys, xs: im[ys, xs])(imgs, iyc, ixc)
        return jnp.where(valid[..., None], g, 0.0)

    out = (
        ((1 - wx) * (1 - wy))[..., None] * tap(x0, y0)
        + (wx * (1 - wy))[..., None] * tap(x0 + 1, y0)
        + ((1 - wx) * wy)[..., None] * tap(x0, y0 + 1)
        + (wx * wy)[..., None] * tap(x0 + 1, y0 + 1)
    )
    kx = keypoints[..., 0] - cx
    ky = keypoints[..., 1] - cy
    nkx = cos[:, None] * kx - sin[:, None] * ky + cx
    nky = sin[:, None] * kx + cos[:, None] * ky + cy
    return out.astype(images.dtype), jnp.stack([nkx, nky], axis=-1).astype(
        keypoints.dtype
    )


def rotate_crops_and_keypoints(
    key: jax.Array,
    images: jax.Array,
    keypoints: jax.Array,
    cfg: "AugmentConfig",
) -> tuple[jax.Array, jax.Array]:
    """Random per-sample rotation theta ~ U[-rotation_deg, +rotation_deg]."""
    if cfg.rotation_deg <= 0:
        return images, keypoints
    B = images.shape[0]
    theta = jax.random.uniform(
        key, (B,), minval=-1.0, maxval=1.0
    ) * jnp.deg2rad(cfg.rotation_deg)
    return rotate_crops(images, keypoints, theta)


def color_jitter(
    key: jax.Array, crops: jax.Array, cfg: AugmentConfig
) -> jax.Array:
    """Per-sample brightness/contrast jitter on [0, 1] float crops."""
    B = crops.shape[0]
    k1, k2 = jax.random.split(key)
    b = cfg.brightness * jax.random.uniform(k1, (B, 1, 1, 1), minval=-1, maxval=1)
    c = 1.0 + cfg.contrast * jax.random.uniform(
        k2, (B, 1, 1, 1), minval=-1, maxval=1
    )
    mean = jnp.mean(crops, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((crops - mean) * c + mean + b, 0.0, 1.0)


def average_flip_pred(
    pred: tuple[jax.Array, ...],
    pred_flipped: tuple[jax.Array, ...],
    pairs: Sequence[tuple[int, int]],
) -> tuple[jax.Array, ...]:
    """Average a head 5-tuple with its horizontally-flipped twin (flip-test
    TTA). `pred_flipped` is the model's output on the W-mirrored crops; its
    heatmaps mirror back along W and swap left/right channels, the per-
    keypoint scalars (probability/visibility/oks/error, each (B, K, 1, 1))
    swap channels only. Under the codec's x_hm ∈ [0, W_hm−1] affine
    (codec.py:131-133) an array reverse along W is the exact mirror, so no
    sub-pixel shift correction is needed (unlike shift_heatmap conventions
    tied to align-corners-false codecs)."""
    hm, *scalars = pred
    hm_f, *scalars_f = pred_flipped
    out = [(hm + _swap_pairs(hm_f[..., ::-1], pairs)) * 0.5]
    for s, sf in zip(scalars, scalars_f):
        out.append((s + _swap_pairs(sf, pairs)) * 0.5)
    return tuple(out)


def _mirror_x_bins(p: jax.Array, split_ratio: float) -> jax.Array:
    """Probability-space mirror of x-axis SimCC bin distributions.

    The crop mirror x -> (W-1) - x maps bin b -> Wb - split - b (for
    integer split ratios; bin b sits at pixel b/split), i.e. an array
    reverse followed by a left shift of split-1 bins. Mass that maps off
    the grid (the last split-1 bins, corresponding to x < 0) zero-fills.
    Non-integer ratios round to the nearest bin (sub-half-bin error)."""
    rev = p[..., ::-1]
    s = int(round(split_ratio)) - 1
    if s > 0:
        rev = jnp.concatenate(
            [rev[..., s:], jnp.zeros_like(rev[..., :s])], axis=-1
        )
    return rev


def average_flip_pred_simcc(
    pred: tuple,
    pred_flipped: tuple,
    pairs: Sequence[tuple[int, int]],
    split_ratio: float,
) -> tuple:
    """Flip-test averaging for the SimCC head family.

    Averaging happens in probability space (per-axis softmax), because
    logits from the two forwards are not on a shared scale; the averaged
    distribution returns as log-probabilities, which downstream softmax
    decoding maps back exactly (softmax(log p) == p). x distributions
    mirror via `_mirror_x_bins`; y distributions only swap left/right
    keypoint channels; scalars swap channels like the heatmap path."""
    (x, y), *scalars = pred
    (xf, yf), *scalars_f = pred_flipped
    f32 = jnp.float32
    px = jax.nn.softmax(x.astype(f32), axis=-1)
    py = jax.nn.softmax(y.astype(f32), axis=-1)
    pxf = jax.nn.softmax(xf.astype(f32), axis=-1)
    pyf = jax.nn.softmax(yf.astype(f32), axis=-1)
    avg_x = 0.5 * (px + _swap_pairs(_mirror_x_bins(pxf, split_ratio), pairs))
    avg_y = 0.5 * (py + _swap_pairs(pyf, pairs))
    out = [(jnp.log(avg_x + 1e-12), jnp.log(avg_y + 1e-12))]
    for s, sf in zip(scalars, scalars_f):
        out.append((s + _swap_pairs(sf, pairs)) * 0.5)
    return tuple(out)
