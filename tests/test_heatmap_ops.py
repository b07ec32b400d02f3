"""Parity tests for the heatmap op layer against SciPy/NumPy oracles.

Generalizes the reference's own backend-parity harness
(reference tests/test_heatmap.py: scipy vs torch at rtol 1e-5 / atol 1e-8)
to numpy-oracle vs jitted-XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.ops.heatmap import (
    build_oks_conv_operators,
    expected_value_decode,
    heatmap_maximum,
    oks_conv,
    subpixel_refine,
)
from probpose_pytorch_tpu.ops.probmaps import generate_probmaps

from oracles import numpy_argmax_decode, numpy_probmaps, scipy_oks_convolve


def _realistic_heatmaps(B, K, H, W, seed=0, noise=0.05):
    """Probmap-shaped heatmaps with noise: smooth, one clear peak each —
    the decode op's actual input distribution."""
    rng = np.random.default_rng(seed)
    kpts = rng.uniform([2, 2], [W - 3, H - 3], size=(B, K, 2)).astype(np.float32)
    sigmas = rng.uniform(0.02, 0.12, size=(K,)).astype(np.float32)
    maps, _ = numpy_probmaps((W, H), kpts, np.ones((B, K)), sigmas, -1.0)
    maps = maps + noise * rng.random((B, K, H, W), dtype=np.float32)
    return np.clip(maps, 0, 1).astype(np.float32), sigmas, kpts


class TestOKSConv:
    def test_matches_scipy_reflect_convolve(self):
        rng = np.random.default_rng(1)
        B, K, H, W = 2, 6, 64, 48
        hm = rng.random((B, K, H, W), dtype=np.float32)
        sigmas = rng.uniform(0.02, 0.3, size=(K,)).astype(np.float32)

        ours = np.asarray(
            jax.jit(oks_conv)(
                jnp.asarray(hm), build_oks_conv_operators(sigmas, H, W)
            )
        )
        ref = scipy_oks_convolve(hm, sigmas)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_clipped_sigma_extremes(self):
        # sigma extremes exercise both clip bounds of s in [0.55, 3.0]
        rng = np.random.default_rng(2)
        H, W = 96, 96
        hm = rng.random((1, 2, H, W), dtype=np.float32)
        sigmas = np.array([1e-4, 5.0], np.float32)
        ours = np.asarray(
            oks_conv(jnp.asarray(hm), build_oks_conv_operators(sigmas, H, W))
        )
        ref = scipy_oks_convolve(hm, sigmas)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestArgmax:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        hm = rng.random((4, 5, 32, 24), dtype=np.float32)
        hm[0, 0] = 0.0  # empty channel -> locs -1
        hm[1, 2] = -np.abs(hm[1, 2])  # all-negative -> locs -1
        locs, vals = jax.jit(heatmap_maximum)(jnp.asarray(hm))
        ref_locs, ref_vals = numpy_argmax_decode(hm)
        np.testing.assert_array_equal(np.asarray(locs), ref_locs)
        np.testing.assert_allclose(np.asarray(vals), ref_vals)

    def test_tie_breaking_first_index(self):
        hm = np.zeros((1, 1, 8, 8), np.float32)
        hm[0, 0, 2, 3] = 1.0
        hm[0, 0, 5, 1] = 1.0
        locs, _ = heatmap_maximum(jnp.asarray(hm))
        assert tuple(np.asarray(locs)[0, 0]) == (3.0, 2.0)


class TestSubpixel:
    def test_newton_step_formula(self):
        # Hand-checkable case: quadratic bump, analytic refinement.
        H, W = 17, 17
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
        cx, cy = 8.3, 7.6
        hm = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 6.0)[None, None]
        locs, _ = heatmap_maximum(jnp.asarray(hm, jnp.float32))
        refined = subpixel_refine(jnp.asarray(hm, jnp.float32), locs)
        refined = np.asarray(refined)[0, 0]
        assert abs(refined[0] - cx) < 0.05
        assert abs(refined[1] - cy) < 0.05

    def test_border_peaks_not_refined(self):
        hm = np.zeros((1, 1, 8, 8), np.float32)
        hm[0, 0, 0, 7] = 1.0
        locs, _ = heatmap_maximum(jnp.asarray(hm))
        refined = subpixel_refine(jnp.asarray(hm), locs)
        np.testing.assert_array_equal(np.asarray(refined), np.asarray(locs))


class TestExpectedValueDecode:
    @pytest.mark.parametrize("shape", [(3, 8, 64, 48), (2, 17, 96, 96)])
    def test_decode_drift_vs_oracle(self, shape):
        """North-star bar: <= 1e-3 px drift vs the reference decode chain."""
        B, K, H, W = shape
        hm, sigmas, _ = _realistic_heatmaps(B, K, H, W, seed=shape[-1])
        ops = build_oks_conv_operators(sigmas, H, W)
        locs, vals = jax.jit(expected_value_decode)(jnp.asarray(hm), ops)

        # Oracle: scipy convolve -> argmax -> subpixel -> raw-value readout.
        conv = scipy_oks_convolve(hm, sigmas)
        ref_locs, _ = numpy_argmax_decode(conv.astype(np.float32))
        flat = conv.reshape(B * K, H, W)
        rl = ref_locs.reshape(B * K, 2).copy()
        x, y = rl[:, 0].astype(int), rl[:, 1].astype(int)
        valid = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
        r = np.arange(B * K)[valid]
        xv, yv = x[valid], y[valid]
        dx = (flat[r, yv, xv + 1] - flat[r, yv, xv - 1]) / 2
        dy = (flat[r, yv + 1, xv] - flat[r, yv - 1, xv]) / 2
        dxx = flat[r, yv, xv + 1] + flat[r, yv, xv - 1] - 2 * flat[r, yv, xv]
        dyy = flat[r, yv + 1, xv] + flat[r, yv - 1, xv] - 2 * flat[r, yv, xv]
        dxx = np.where(dxx != 0, dxx, 1e-6)
        dyy = np.where(dyy != 0, dyy, 1e-6)
        rl[valid, 0] -= (dx / dxx).astype(np.float32)
        rl[valid, 1] -= (dy / dyy).astype(np.float32)
        ref_locs = rl.reshape(B, K, 2)

        drift = np.abs(np.asarray(locs) - ref_locs).max()
        assert drift <= 1e-3, f"decode drift {drift} px exceeds 1e-3"

        # Score = raw heatmap at the rounded *integer* argmax.
        ri = np.clip(np.round(ref_locs), 0, None)  # refined ~ int here
        xi = np.clip(x.reshape(B, K), 0, W - 1)
        yi = np.clip(y.reshape(B, K), 0, H - 1)
        ref_vals = hm[
            np.arange(B)[:, None], np.arange(K)[None, :], yi, xi
        ]
        np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-6)

    def test_float64_exactness_of_algorithm(self):
        """With x64 enabled, the operator formulation is exact vs scipy."""
        B, K, H, W = 1, 3, 48, 40
        rng = np.random.default_rng(7)
        hm = rng.random((B, K, H, W))
        sigmas = np.array([0.05, 0.1, 0.2])
        with jax.enable_x64(True):
            ops = build_oks_conv_operators(sigmas, H, W)
            row = jnp.asarray(ops.row_op, jnp.float64)
            col = jnp.asarray(ops.col_op, jnp.float64)
            y = jnp.einsum("kwv,bkhv->bkhw", col, jnp.asarray(hm))
            ours = np.asarray(jnp.einsum("khg,bkgw->bkhw", row, y))
        # Rebuild operators in f64 for a strict check.
        ref = scipy_oks_convolve(hm.astype(np.float32), sigmas).astype(
            np.float64
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


class TestProbmaps:
    @pytest.mark.parametrize("sigma", [-1.0, 2.0, 0.55])
    def test_matches_numpy_oracle(self, sigma):
        rng = np.random.default_rng(11)
        B, K, H, W = 3, 7, 96, 72
        kpts = rng.uniform(-20, 110, size=(B, K, 2)).astype(np.float32)
        vis = (rng.random((B, K)) > 0.3).astype(np.float32)
        sigmas = rng.uniform(0.02, 0.2, size=(K,)).astype(np.float32)

        maps, weights = jax.jit(
            generate_probmaps, static_argnums=(0, 4)
        )((W, H), jnp.asarray(kpts), jnp.asarray(vis), sigmas, sigma)
        ref_maps, ref_weights = numpy_probmaps((W, H), kpts, vis, sigmas, sigma)
        np.testing.assert_allclose(np.asarray(maps), ref_maps, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(weights), ref_weights)

    def test_far_keypoint_underflows_to_zero_weight(self):
        # A keypoint far outside the map underflows exp -> weight 0
        # (reference codec.py:68 keeps the max()>0 check for this reason).
        maps, weights = generate_probmaps(
            (64, 64),
            jnp.asarray([[[5000.0, 5000.0]]]),
            jnp.ones((1, 1)),
            np.array([0.05], np.float32),
            -1.0,
        )
        assert float(jnp.max(maps)) == 0.0
        assert float(weights[0, 0]) == 0.0
