"""Pallas kernel tests (CPU interpret mode; real-TPU execution is covered by
bench/profiling runs)."""

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
