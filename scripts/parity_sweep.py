"""Statistical decode-parity sweep: many random (geometry, sigmas, content)
configurations, expected-value decode vs the SciPy oracle chain.

Produces the evidence table behind the north-star "<=1e-3 px drift" claim.
Run on CPU (tests' environment) or TPU; prints per-config and aggregate
drift stats.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.ops.heatmap import (
    build_oks_conv_operators,
    expected_value_decode,
)
from oracles import numpy_argmax_decode, numpy_probmaps, scipy_oks_convolve

CONFIGS = [
    # (B, K, H, W, sigma_lo, sigma_hi, noise)
    (8, 17, 64, 48, 0.02, 0.12, 0.05),
    (8, 17, 96, 96, 0.02, 0.12, 0.05),
    (4, 20, 96, 96, 0.04, 0.06, 0.08),  # reference train geometry
    (8, 17, 48, 64, 0.01, 0.3, 0.02),
    (16, 5, 32, 24, 0.05, 0.2, 0.05),
    (4, 17, 128, 96, 0.02, 0.12, 0.1),
]


def oracle_decode(hm, sigmas):
    B, K, H, W = hm.shape
    conv = scipy_oks_convolve(hm, sigmas)
    locs, _ = numpy_argmax_decode(conv.astype(np.float32))
    flat = conv.reshape(B * K, H, W)
    rl = locs.reshape(B * K, 2).copy()
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
    return rl.reshape(B, K, 2)


def main():
    print(f"backend: {jax.default_backend()}")
    all_drifts = []
    print(f"{'config':28s} {'max px':>10s} {'p99 px':>10s} {'median px':>10s}")
    for seed, (B, K, H, W, slo, shi, noise) in enumerate(CONFIGS):
        rng = np.random.default_rng(seed)
        kpts = rng.uniform([2, 2], [W - 3, H - 3], (B, K, 2)).astype(np.float32)
        sigmas = rng.uniform(slo, shi, (K,)).astype(np.float32)
        maps, _ = numpy_probmaps((W, H), kpts, np.ones((B, K)), sigmas, -1.0)
        hm = np.clip(
            maps + noise * rng.random((B, K, H, W), dtype=np.float32), 0, 1
        ).astype(np.float32)
        ops = build_oks_conv_operators(sigmas, H, W)
        locs, _ = jax.jit(expected_value_decode)(jnp.asarray(hm), ops)
        ref = oracle_decode(hm, sigmas)
        d = np.abs(np.asarray(locs) - ref).max(-1).ravel()
        all_drifts.append(d)
        print(
            f"B{B} K{K} {H}x{W} s[{slo},{shi}]   "
            f"{d.max():10.2e} {np.percentile(d, 99):10.2e} {np.median(d):10.2e}"
        )
    d = np.concatenate(all_drifts)
    print(
        f"\naggregate over {len(d)} keypoints: max {d.max():.2e} px, "
        f"p99 {np.percentile(d, 99):.2e} px "
        f"({'PASS' if d.max() <= 1e-3 else 'FAIL'} vs 1e-3 north-star bar)"
    )


if __name__ == "__main__":
    main()
