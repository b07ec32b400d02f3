"""DarkPose/UDP sub-pixel refinement, batched and on-device.

TPU-native rebuild of the reference's CPU path
(/root/reference/probpose/codec.py:284-375): per-channel cv2.GaussianBlur
with a zero border ring + per-instance NumPy loop with np.linalg.pinv on 2x2
Hessians. Here:

* The modulation blur is a separable Gaussian expressed as two batched
  matmuls against precomputed band operators (same trick as ops/heatmap.py).
  The reference zero-pads each map by the kernel radius before blurring and
  crops back (codec.py:308-311), so for the cropped interior the boundary
  condition is exactly **zero padding** — no cv2 border mode needs matching.
* The 2x2 Hessian pseudo-inverse is a closed-form symmetric eigen-decomposition
  (batched), replacing np.linalg.pinv (codec.py:371).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GaussianBlurOperators",
    "build_gaussian_blur_operators",
    "gaussian_blur_modulate",
    "refine_keypoints_dark_udp",
]

_PRECISION = jax.lax.Precision.HIGHEST


class GaussianBlurOperators(NamedTuple):
    row_op: np.ndarray  # (H, H)
    col_op: np.ndarray  # (W, W)


def _cv2_gaussian_kernel(ksize: int) -> np.ndarray:
    """1-D Gaussian kernel matching cv2.getGaussianKernel(ksize, 0):
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8, normalized to sum 1."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    t = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    g = np.exp(-(t**2) / (2.0 * sigma**2))
    return g / g.sum()


def _zeropad_conv1d_operator(g: np.ndarray, n: int) -> np.ndarray:
    """(n, n) operator for centered 1-D correlation with zero boundary."""
    d = len(g)
    r = d // 2
    M = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for t in range(-r, r + 1):
            m = i + t
            if 0 <= m < n:
                M[i, m] += g[t + r]
    return M


@functools.lru_cache(maxsize=32)
def _build_blur_cached(ksize: int, H: int, W: int) -> GaussianBlurOperators:
    g = _cv2_gaussian_kernel(ksize)
    return GaussianBlurOperators(
        row_op=_zeropad_conv1d_operator(g, H).astype(np.float32),
        col_op=_zeropad_conv1d_operator(g, W).astype(np.float32),
    )


def build_gaussian_blur_operators(
    blur_kernel_size: int, H: int, W: int
) -> GaussianBlurOperators:
    assert blur_kernel_size % 2 == 1
    return _build_blur_cached(int(blur_kernel_size), int(H), int(W))


def gaussian_blur_modulate(
    heatmaps: jax.Array, ops: GaussianBlurOperators
) -> jax.Array:
    """Blur each (..., H, W) map and rescale it back to its original max.

    Matches reference `gaussian_blur` (codec.py:284-313): blur, then multiply
    by origin_max / (new_max + 1e-12).
    """
    row_op = jnp.asarray(ops.row_op)
    col_op = jnp.asarray(ops.col_op)
    origin_max = jnp.max(heatmaps, axis=(-2, -1), keepdims=True)
    y = jnp.einsum("wv,...hv->...hw", col_op, heatmaps, precision=_PRECISION)
    blurred = jnp.einsum("hg,...gw->...hw", row_op, y, precision=_PRECISION)
    new_max = jnp.max(blurred, axis=(-2, -1), keepdims=True)
    return blurred * (origin_max / (new_max + 1e-12))


def _sym2x2_pinv(a: jax.Array, b: jax.Array, c: jax.Array):
    """Batched closed-form pseudo-inverse of symmetric [[a, b], [b, c]].

    Eigen-based, mimicking np.linalg.pinv's relative cutoff (rcond ~1e-15
    scaled by the largest |eigenvalue|). Returns the three unique entries of
    the (symmetric) pinv.
    """
    mean = (a + c) / 2.0
    # Guard the sqrt: the radicand is >= 0 mathematically.
    rad = jnp.sqrt(jnp.maximum(((a - c) / 2.0) ** 2 + b**2, 0.0))
    l1 = mean + rad
    l2 = mean - rad
    cutoff = 1e-15 * jnp.maximum(jnp.abs(l1), jnp.abs(l2))

    def inv_eig(lam):
        keep = jnp.abs(lam) > cutoff
        return jnp.where(keep, 1.0 / jnp.where(keep, lam, 1.0), 0.0)

    il1, il2 = inv_eig(l1), inv_eig(l2)

    # Eigenvector for l1: prefer (b, l1 - a); fall back to axis vectors when
    # the matrix is (near-)diagonal.
    vx = jnp.where(jnp.abs(b) > 0, b, jnp.where(a >= c, 1.0, 0.0))
    vy = jnp.where(jnp.abs(b) > 0, l1 - a, jnp.where(a >= c, 0.0, 1.0))
    norm = jnp.sqrt(vx**2 + vy**2)
    norm = jnp.where(norm > 0, norm, 1.0)
    vx, vy = vx / norm, vy / norm
    # pinv = il1 * v v^T + il2 * u u^T with u = (-vy, vx).
    pa = il1 * vx * vx + il2 * vy * vy
    pb = il1 * vx * vy - il2 * vx * vy
    pc = il1 * vy * vy + il2 * vx * vx
    return pa, pb, pc


def refine_keypoints_dark_udp(
    keypoints: jax.Array,
    heatmaps: jax.Array,
    blur_ops: GaussianBlurOperators,
    max_step: float | None = None,
) -> jax.Array:
    """Distribution-aware (DarkPose/UDP) refinement of argmax keypoints.

    Batched rebuild of reference `refine_keypoints_dark_udp`
    (codec.py:315-375): Gaussian modulation -> clip(1e-3, 50) -> log ->
    edge-pad by 1 -> first/second central differences at the (integer) peak ->
    Newton step with the Hessian pseudo-inverse.

    Args:
        keypoints: (B, K, 2) float (x, y) peak locations (as from
            `heatmap_maximum`; -1 entries follow the reference's arithmetic and
            read the padded corner).
        heatmaps: (B, K, H, W).
        blur_ops: from `build_gaussian_blur_operators`.
        max_step: optional clamp on the Newton step magnitude (px). The
            reference leaves degenerate-Hessian steps unbounded (they reach
            tens of px and are meaningless); None preserves that behavior,
            a value like 1.0 bounds refinement to its valid sub-pixel regime.

    Returns:
        (B, K, 2) refined float32 keypoints.
    """
    B, K, H, W = heatmaps.shape
    hm = gaussian_blur_modulate(heatmaps, blur_ops)
    hm = jnp.log(jnp.clip(hm, 1e-3, 50.0))
    hm = jnp.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    Wp = W + 2
    flat = hm.reshape(B, K, (H + 2) * Wp)

    # Truncation toward zero matches the reference's .astype(int)
    # (codec.py:352); peak coords are non-negative or exactly -1.
    x = keypoints[..., 0].astype(jnp.int32) + 1
    y = keypoints[..., 1].astype(jnp.int32) + 1
    base = x + y * Wp

    def at(offset: int) -> jax.Array:
        return jnp.take_along_axis(flat, (base + offset)[..., None], axis=-1)[
            ..., 0
        ]

    i_ = at(0)
    ix1 = at(1)
    iy1 = at(Wp)
    ix1y1 = at(Wp + 1)
    ix1_y1_ = at(-Wp - 1)
    ix1_ = at(-1)
    iy1_ = at(-Wp)

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2.0 * i_ + ix1_
    dyy = iy1 - 2.0 * i_ + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2.0 * i_ - ix1_ - iy1_ + ix1_y1_)

    eps = float(np.finfo(np.float32).eps)
    pa, pb, pc = _sym2x2_pinv(dxx + eps, dxy, dyy + eps)
    step_x = pa * dx + pb * dy
    step_y = pb * dx + pc * dy
    step = jnp.stack([step_x, step_y], axis=-1)
    if max_step is not None:
        norm = jnp.linalg.norm(step, axis=-1, keepdims=True)
        step = step * jnp.minimum(1.0, max_step / jnp.maximum(norm, 1e-12))
    return (keypoints - step).astype(jnp.float32)
