"""Pallas kernel tests (CPU interpret mode; real-TPU execution is covered by
bench/profiling runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.ops.pallas import sparsemax_pallas
from probpose_pytorch_tpu.ops.sparsemax import sparsemax


def test_matches_xla_sparsemax():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(4, 17, 256)).astype(np.float32) * 2
    a = np.asarray(sparsemax_pallas(jnp.asarray(z), interpret=True))
    b = np.asarray(sparsemax(jnp.asarray(z)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_simplex_property():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(32, 384)).astype(np.float32) * 5
    p = np.asarray(sparsemax_pallas(jnp.asarray(z), interpret=True))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert p.min() >= 0


def test_ragged_rows_masked_grid():
    # R not a multiple of the row tile exercises the grid remainder path.
    rng = np.random.default_rng(2)
    z = rng.normal(size=(130, 256)).astype(np.float32)
    p = np.asarray(sparsemax_pallas(jnp.asarray(z), interpret=True))
    ref = np.asarray(sparsemax(jnp.asarray(z)))
    np.testing.assert_allclose(p, ref, atol=1e-6)


def test_fused_decode_matches_xla_path():
    from probpose_pytorch_tpu.ops.heatmap import (
        build_oks_conv_operators,
        expected_value_decode,
    )
    from probpose_pytorch_tpu.ops.pallas import expected_value_decode_pallas

    rng = np.random.default_rng(0)
    B, K, H, W = 5, 4, 64, 48
    # realistic single-peak maps
    from oracles import numpy_probmaps

    kpts = rng.uniform([3, 3], [W - 4, H - 4], (B, K, 2)).astype(np.float32)
    sigmas = rng.uniform(0.03, 0.12, (K,)).astype(np.float32)
    maps, _ = numpy_probmaps((W, H), kpts, np.ones((B, K)), sigmas, -1.0)
    maps = np.clip(
        maps + 0.03 * rng.random((B, K, H, W), dtype=np.float32), 0, 1
    ).astype(np.float32)

    ops = build_oks_conv_operators(sigmas, H, W)
    locs_ref, vals_ref = expected_value_decode(jnp.asarray(maps), ops)
    locs, vals = expected_value_decode_pallas(
        jnp.asarray(maps), ops, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(locs), np.asarray(locs_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(vals_ref), atol=1e-6
    )


def test_fused_attention_matches_einsum():
    from probpose_pytorch_tpu.ops.pallas import fused_attention

    rng = np.random.default_rng(0)
    B, N, H, D = 3, 192, 6, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    )
    ref = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D)
    ref = jax.nn.softmax(ref, axis=-1)
    ref = jnp.einsum("bhnm,bmhd->bnhd", ref, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_group_remainder():
    from probpose_pytorch_tpu.ops.pallas import fused_attention

    rng = np.random.default_rng(1)
    B, N, H, D = 1, 64, 3, 32  # B*H=3 not a multiple of group
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
        for _ in range(3)
    )
    out = fused_attention(q, k, v, group=2, interpret=True)
    ref = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D)
    ref = jax.nn.softmax(ref, axis=-1)
    ref = jnp.einsum("bhnm,bmhd->bnhd", ref, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
