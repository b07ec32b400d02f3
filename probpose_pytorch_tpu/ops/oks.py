"""Object Keypoint Similarity (OKS), on-device and batched.

Rebuild of the per-sample NumPy `compute_oks` loop the reference runs on the
host every training step (/root/reference/probpose/loss.py:599-632, 715-764).
Here the whole batch is one fused XLA expression so OKS-target derivation can
live inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["per_keypoint_oks", "oks_targets_from_coords"]

_EPS = float(np.spacing(1))


def per_keypoint_oks(
    gt_kpts: jax.Array,
    dt_kpts: jax.Array,
    gt_vis: jax.Array,
    sigmas: jax.Array | np.ndarray,
    area: jax.Array | float,
) -> jax.Array:
    """Per-keypoint OKS between ground-truth and predicted coordinates.

    Matches reference `compute_oks(..., use_area=False, per_kpt=True)`
    (loss.py:715-757) for the visible-keypoints case: e = d^2 / (2*sigma)^2 /
    (0.53*area + eps) / 2, oks = exp(-e), zeroed where gt is invisible.

    Args:
        gt_kpts, dt_kpts: (..., K, 2).
        gt_vis: (..., K) visibility (> 0 means visible).
        sigmas: (K,) per-keypoint sigmas.
        area: bbox area (the reference passes heatmap W*H; the 0.53 factor is
            applied here, mirroring loss.py:751).

    Returns:
        (..., K) float32 OKS values.
    """
    sig = jnp.asarray(sigmas, jnp.float32)
    var = (2.0 * sig) ** 2
    dx = dt_kpts[..., 0] - gt_kpts[..., 0]
    dy = dt_kpts[..., 1] - gt_kpts[..., 1]
    tmparea = area * 0.53
    e = (dx**2 + dy**2) / var / (tmparea + _EPS) / 2.0
    oks = jnp.exp(-e)
    return jnp.where(gt_vis > 0, oks, 0.0).astype(jnp.float32)


def oks_targets_from_coords(
    gt_coords: jax.Array,
    dt_coords: jax.Array,
    weight: jax.Array,
    sigmas: jax.Array | np.ndarray,
    heatmap_size: tuple[int, int],
) -> tuple[jax.Array, jax.Array]:
    """Batched OKS training targets from decoded coordinates.

    On-device rebuild of reference `ProbPoseLoss._oks_from_heatmaps`
    (loss.py:550-640) minus the heatmap decoding (done by the caller):
    coordinates are zeroed by the weight, visibility is weight*2, samples with
    no valid keypoint get all-zero OKS and zero sample weight.

    Args:
        gt_coords, dt_coords: (B, K, 2) decoded coordinates (input space, as
            the reference decodes them — while `area` stays in heatmap space,
            a reference quirk kept for parity).
        weight: (B, K) 0/1 — annotated AND in-image (loss.py:394).
        sigmas: (K,).
        heatmap_size: (W, H).

    Returns:
        target_oks: (B, K) float32.
        oks_weight: (B,) float32 — 0 for samples with no valid keypoint.
    """
    W, H = heatmap_size
    w = weight.astype(jnp.float32)
    g = gt_coords * w[..., None]
    d = dt_coords * w[..., None]
    vis = w * 2.0
    oks = per_keypoint_oks(g, d, vis, sigmas, float(W * H))
    any_valid = jnp.any(vis > 0, axis=-1)
    oks = jnp.where(any_valid[:, None], oks, 0.0)
    return oks, any_valid.astype(jnp.float32)
