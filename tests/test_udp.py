"""Parity tests for DarkPose/UDP refinement against a cv2/NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.ops.heatmap import heatmap_maximum
from probpose_pytorch_tpu.ops.udp import (
    build_gaussian_blur_operators,
    gaussian_blur_modulate,
    refine_keypoints_dark_udp,
)

from oracles import cv2_udp_refine, numpy_probmaps


def _heatmaps(B=3, K=6, H=64, W=48, seed=0):
    rng = np.random.default_rng(seed)
    kpts = rng.uniform([1, 1], [W - 2, H - 2], size=(B, K, 2)).astype(np.float32)
    sigmas = rng.uniform(0.03, 0.12, size=(K,)).astype(np.float32)
    maps, _ = numpy_probmaps((W, H), kpts, np.ones((B, K)), sigmas, -1.0)
    maps += 0.02 * rng.random((B, K, H, W), dtype=np.float32)
    return np.clip(maps, 0, 1).astype(np.float32)


def test_gaussian_blur_matches_cv2():
    import cv2

    hm = _heatmaps(B=2, K=3)
    B, K, H, W = hm.shape
    kernel = 11
    border = (kernel - 1) // 2
    ref = np.zeros_like(hm)
    for b in range(B):
        for k in range(K):
            omax = hm[b, k].max()
            dr = np.zeros((H + 2 * border, W + 2 * border), np.float32)
            dr[border:-border, border:-border] = hm[b, k]
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            m = dr[border:-border, border:-border].copy()
            ref[b, k] = m * (omax / (m.max() + 1e-12))

    ops = build_gaussian_blur_operators(kernel, H, W)
    ours = np.asarray(gaussian_blur_modulate(jnp.asarray(hm), ops))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_udp_refine_matches_oracle():
    hm = _heatmaps(B=3, K=6, seed=4)
    B, K, H, W = hm.shape
    locs, _ = heatmap_maximum(jnp.asarray(hm))
    ops = build_gaussian_blur_operators(11, H, W)
    ours = np.asarray(
        jax.jit(refine_keypoints_dark_udp)(locs, jnp.asarray(hm), ops)
    )
    ref = cv2_udp_refine(np.asarray(locs), hm, 11)
    drift = np.abs(ours - ref).max()
    assert drift <= 1e-3, f"UDP refine drift {drift} px exceeds 1e-3"


def test_udp_refine_empty_heatmap_stays_finite():
    # Empty channels give locs=-1 (corner reads in the padded map); the
    # refinement must stay finite and essentially unmoved (flat log map).
    hm = np.zeros((1, 2, 32, 32), np.float32)
    hm[0, 1, 10, 10] = 1.0
    locs, _ = heatmap_maximum(jnp.asarray(hm))
    ops = build_gaussian_blur_operators(11, 32, 32)
    out = np.asarray(refine_keypoints_dark_udp(locs, jnp.asarray(hm), ops))
    assert np.isfinite(out).all()
    ref = cv2_udp_refine(np.asarray(locs), hm.copy(), 11)
    np.testing.assert_allclose(out, ref, atol=1e-3)
