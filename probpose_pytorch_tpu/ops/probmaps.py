"""On-device OKS probability-map target encoding.

TPU-native rebuild of reference `generate_probmaps`
(/root/reference/probpose/codec.py:11-70), which loops in Python over
(instance, keypoint) and materializes a dense np.indices grid per keypoint on
the CPU inside DataLoader workers (dataset.py:128). Here the whole batch is a
single broadcasted XLA expression — (B, K, H, W) in one fused kernel — so
target encoding moves from the host data path into the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["oks_spread", "generate_probmaps"]


def oks_spread(
    kpt_sigmas: jax.Array | np.ndarray,
    heatmap_size: tuple[int, int],
    sigma: float,
) -> jax.Array:
    """Per-keypoint spread `s` of the OKS map.

    Matches reference codec.py:48,60-64: s = clip((2*sigma_k)^2 * bbox_area * 2,
    0.55, 3.0) with bbox_area = sqrt(H/1.25 * W/1.25); a positive fixed `sigma`
    overrides the per-keypoint value entirely (the ProbMap default, sigma=2.0,
    takes this branch; ArgMaxProbMap's default sigma=-1 keeps per-keypoint s).
    """
    W, H = heatmap_size
    bbox_area = np.sqrt(H / 1.25 * W / 1.25)
    s = (jnp.asarray(kpt_sigmas, jnp.float32) * 2.0) ** 2 * bbox_area * 2.0
    s = jnp.clip(s, 0.55, 3.0)
    if sigma is not None and sigma > 0:
        s = jnp.full_like(s, sigma)
    return s


def generate_probmaps(
    heatmap_size: tuple[int, int],
    keypoints: jax.Array,
    keypoints_visible: jax.Array,
    kpt_sigmas: jax.Array | np.ndarray,
    sigma: float = 0.55,
) -> tuple[jax.Array, jax.Array]:
    """Generate expected-OKS target maps for a batch of single-instance poses.

    Args:
        heatmap_size: (W, H).
        keypoints: (B, K, 2) keypoint coordinates in heatmap space.
        keypoints_visible: (B, K) visibility weights (>= 0.5 means labeled).
        kpt_sigmas: (K,) COCO-style per-keypoint sigmas.
        sigma: fixed spread override when > 0 (codec.py:63-64).

    Returns:
        heatmaps: (B, K, H, W) float32 OKS maps (zero for unlabeled keypoints).
        keypoint_weights: (B, K) float32 — the visibility weight, replaced by
            1/0 {map has any nonzero pixel} for labeled keypoints
            (codec.py:68; a keypoint far outside the map underflows to weight 0).
    """
    W, H = heatmap_size
    keypoints = jnp.asarray(keypoints, jnp.float32)
    vis = jnp.asarray(keypoints_visible, jnp.float32)

    s = oks_spread(kpt_sigmas, heatmap_size, sigma)  # (K,)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs[None, None, None, :] - keypoints[:, :, 0, None, None]  # (B,K,1,W)
    dy = ys[None, None, :, None] - keypoints[:, :, 1, None, None]  # (B,K,H,1)
    dist2 = dx**2 + dy**2  # (B, K, H, W)
    maps = jnp.exp(-dist2 / (2.0 * s[None, :, None, None]))

    labeled = vis >= 0.5
    maps = jnp.where(labeled[:, :, None, None], maps, 0.0)

    nonzero = jnp.max(maps, axis=(2, 3)) > 0
    weights = jnp.where(labeled, nonzero.astype(jnp.float32), vis)
    return maps, weights
