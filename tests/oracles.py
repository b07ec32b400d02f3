"""Independent NumPy/SciPy/OpenCV oracles for parity testing.

These re-derive the reference semantics (cited by file:line in each op's
docstring) from the math, in plain NumPy — the reference repo's own
"two backends must agree" discipline (its tests/test_heatmap.py), with our
JAX ops as the second backend.
"""

from __future__ import annotations

import numpy as np


def oks_s_values(sigmas: np.ndarray, H: int, W: int) -> np.ndarray:
    bbox_area = np.sqrt(H / 1.25 * W / 1.25)
    return np.clip((2.0 * sigmas) ** 2 * bbox_area * 2.0, 0.55, 3.0)


def oks_kernel(s: float) -> np.ndarray:
    radius = int(np.ceil(3 * s))
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    dx, dy = np.meshgrid(t, t)
    k = np.exp(-(dx**2 + dy**2) / (2 * s))
    return k / k.sum()


def scipy_oks_convolve(heatmaps: np.ndarray, sigmas: np.ndarray) -> np.ndarray:
    """Per-keypoint reflect-boundary convolution via scipy.ndimage."""
    from scipy.ndimage import convolve

    B, K, H, W = heatmaps.shape
    svals = oks_s_values(sigmas, H, W)
    out = np.zeros_like(heatmaps, dtype=np.float64)
    for k in range(K):
        kern = oks_kernel(svals[k])
        for b in range(B):
            out[b, k] = convolve(
                heatmaps[b, k].astype(np.float64), kern, mode="reflect"
            )
    return out


def numpy_probmaps(
    heatmap_size: tuple[int, int],
    keypoints: np.ndarray,
    visible: np.ndarray,
    sigmas: np.ndarray,
    sigma: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense-grid OKS map generation, one keypoint at a time."""
    W, H = heatmap_size
    B, K, _ = keypoints.shape
    maps = np.zeros((B, K, H, W), np.float32)
    weights = visible.astype(np.float32).copy()
    bbox_area = np.sqrt(H / 1.25 * W / 1.25)
    yy, xx = np.indices((H, W))
    for b in range(B):
        for k in range(K):
            if visible[b, k] < 0.5:
                continue
            d2 = (xx - keypoints[b, k, 0]) ** 2 + (yy - keypoints[b, k, 1]) ** 2
            s = np.clip((2 * sigmas[k]) ** 2 * bbox_area * 2, 0.55, 3.0)
            if sigma is not None and sigma > 0:
                s = sigma
            m = np.exp(-d2 / (2 * s)).astype(np.float32)
            maps[b, k] = m
            weights[b, k] = float(m.max() > 0)
    return maps, weights


def numpy_argmax_decode(heatmaps: np.ndarray):
    """Row-major argmax with -1 for empty channels."""
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, K, -1)
    idx = flat.argmax(-1)
    vals = flat.max(-1)
    locs = np.stack([idx % W, idx // W], -1).astype(np.float32)
    locs[vals <= 0] = -1
    return locs, vals


def cv2_udp_refine(
    keypoints: np.ndarray, heatmaps: np.ndarray, blur_kernel_size: int
) -> np.ndarray:
    """UDP refinement oracle: cv2.GaussianBlur modulation of zero-padded maps,
    log, edge pad, central differences, np.linalg.pinv Newton step."""
    import cv2

    kpts = keypoints.copy().astype(np.float64)
    B, K = kpts.shape[:2]
    H, W = heatmaps.shape[2:]
    border = (blur_kernel_size - 1) // 2
    hm = np.zeros_like(heatmaps)
    for b in range(B):
        for k in range(K):
            omax = heatmaps[b, k].max()
            dr = np.zeros((H + 2 * border, W + 2 * border), np.float32)
            dr[border:-border, border:-border] = heatmaps[b, k]
            dr = cv2.GaussianBlur(dr, (blur_kernel_size, blur_kernel_size), 0)
            m = dr[border:-border, border:-border].copy()
            hm[b, k] = m * (omax / (m.max() + 1e-12))
    hm = np.log(np.clip(hm, 1e-3, 50.0))
    pad = np.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    Wp = W + 2
    eps = np.finfo(np.float32).eps
    for b in range(B):
        flat = pad[b].reshape(K, -1)
        x = kpts[b, :, 0].astype(int) + 1
        y = kpts[b, :, 1].astype(int) + 1
        base = x + y * Wp
        rows = np.arange(K)

        def g(off):
            return flat[rows, base + off]

        i_, ix1, iy1 = g(0), g(1), g(Wp)
        ix1y1, ix1_y1_ = g(Wp + 1), g(-Wp - 1)
        ix1_, iy1_ = g(-1), g(-Wp)
        dx = 0.5 * (ix1 - ix1_)
        dy = 0.5 * (iy1 - iy1_)
        dxx = ix1 - 2 * i_ + ix1_
        dyy = iy1 - 2 * i_ + iy1_
        dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2 * i_ - ix1_ - iy1_ + ix1_y1_)
        for k in range(K):
            hess = np.array([[dxx[k], dxy[k]], [dxy[k], dyy[k]]])
            hess = np.linalg.pinv(hess + eps * np.eye(2))
            kpts[b, k] -= hess @ np.array([dx[k], dy[k]])
    return kpts.astype(np.float32)
