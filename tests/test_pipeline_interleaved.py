"""Circular-interleaved (virtual-stage) 1F1B
(parallel/pipeline.py:pipeline_1f1b_interleaved + circular_chunk_order).

Parity contract on the virtual CPU mesh: for any (S, V, M) geometry the
engine's (loss, trunk grads, loss-side grads, dx) must equal sequential
autodiff over the LOGICAL block order — with trunk params and grads in the
circular depth layout (device shard = its V strided chunks). V=1 must
reproduce the plain `pipeline_1f1b` schedule exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.parallel import make_mesh
from probpose_pytorch_tpu.parallel.pipeline import (
    circular_chunk_order,
    pipeline_1f1b,
    pipeline_1f1b_interleaved,
)


def _toy_stacked(depth=8, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(depth, dim, dim) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(depth, dim) * 0.1, jnp.float32),
    }


def _toy_block(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _loss_params(dim=8, out=3, seed=9):
    rng = np.random.RandomState(seed)
    return {"w": jnp.asarray(rng.randn(dim, out) * 0.2, jnp.float32)}


def _loss_fn(lp, h, t):
    return jnp.mean((h @ lp["w"] - t) ** 2)


def _data(B=16, n=5, dim=8, out=3, seed=1):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, n, dim) * 0.5, jnp.float32)
    t = jnp.asarray(rng.randn(B, n, out) * 0.5, jnp.float32)
    return x, t


def _seq_ref(stacked_logical, lp, x, t):
    def total(p, lp, xin):
        h = xin
        depth = p["w"].shape[0]
        for i in range(depth):
            h = _toy_block(
                jax.tree_util.tree_map(lambda a: a[i], p), h
            )
        return _loss_fn(lp, h, t)

    return jax.value_and_grad(total, argnums=(0, 1, 2))(
        stacked_logical, lp, x
    )


def _to_circular(stacked, S, V):
    order = np.asarray(circular_chunk_order(stacked["w"].shape[0], S, V))
    return jax.tree_util.tree_map(lambda a: a[order], stacked), order


def _check(got, want, rtol=1e-5, atol=1e-6):
    for g, w in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol
        )


class TestCircularOrder:
    def test_permutation_roundtrip(self):
        order = circular_chunk_order(16, 4, 2)
        assert sorted(order) == list(range(16))
        inv = np.argsort(order)
        assert [order[i] for i in inv] == list(range(16))

    def test_chunk_to_device_map(self):
        # depth 8, S=2, V=2, L'=2: device 0 holds chunks 0,2 = logical
        # blocks [0,1, 4,5]; device 1 chunks 1,3 = [2,3, 6,7].
        assert circular_chunk_order(8, 2, 2) == [0, 1, 4, 5, 2, 3, 6, 7]

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match="divisible"):
            circular_chunk_order(6, 2, 2)


class TestInterleaved1F1B:
    @pytest.mark.parametrize("pp,v,m,b", [
        (2, 2, 4, 16),   # basic S=2, V=2
        (4, 2, 8, 16),   # the verdict geometry S=4, M=8, V=2
        (2, 4, 4, 16),   # deep virtualization
        (2, 2, 3, 12),   # M not a multiple of S
        (2, 2, 7, 28),   # odd M > S (local batch 7 on the 4-wide data axis)
    ])
    def test_matches_sequential_autodiff(self, pp, v, m, b):
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=pp)
        stacked = _toy_stacked(depth=pp * v * 2)
        lp = _loss_params()
        x, t = _data(B=b)
        circ, order = _to_circular(stacked, pp, v)
        loss, d_circ, d_lp, dx = jax.jit(
            lambda p, l, x, t: pipeline_1f1b_interleaved(
                _toy_block, p, _loss_fn, l, x, t, mesh,
                virtual=v, microbatches=m,
            )
        )(circ, lp, x, t)
        loss_ref, (d_ref, dlp_ref, dx_ref) = _seq_ref(stacked, lp, x, t)
        np.testing.assert_allclose(
            float(loss), float(loss_ref), rtol=1e-5
        )
        # engine grads come back in circular layout: permute to logical
        d_logical = jax.tree_util.tree_map(
            lambda a: np.asarray(a)[np.argsort(order)], d_circ
        )
        _check(d_logical, d_ref, rtol=2e-5, atol=1e-6)
        _check(d_lp, dlp_ref, rtol=2e-5, atol=1e-6)
        _check(dx, dx_ref, rtol=2e-5, atol=1e-6)

    def test_v1_equals_plain_1f1b(self):
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=2)
        stacked = _toy_stacked(depth=4)
        lp = _loss_params()
        x, t = _data(B=16)
        # V=1: circular order is the identity
        assert circular_chunk_order(4, 2, 1) == list(range(4))
        out_i = jax.jit(
            lambda p, l, x, t: pipeline_1f1b_interleaved(
                _toy_block, p, _loss_fn, l, x, t, mesh,
                virtual=1, microbatches=4,
            )
        )(stacked, lp, x, t)
        out_p = jax.jit(
            lambda p, l, x, t: pipeline_1f1b(
                _toy_block, p, _loss_fn, l, x, t, mesh, microbatches=4
            )
        )(stacked, lp, x, t)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(out_i), jax.tree_util.tree_leaves(out_p)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7
            )

    def test_loss_has_aux(self):
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=2)
        stacked = _toy_stacked(depth=8)
        lp = _loss_params()
        x, t = _data(B=16)
        circ, order = _to_circular(stacked, 2, 2)

        def loss_aux(lp_, h, t_):
            loss = _loss_fn(lp_, h, t_)
            return loss, {"h_mean": jnp.mean(h), "loss_copy": loss}

        loss, d_circ, d_lp, dx, aux = jax.jit(
            lambda p, l, x, t: pipeline_1f1b_interleaved(
                _toy_block, p, loss_aux, l, x, t, mesh,
                virtual=2, microbatches=4, loss_has_aux=True,
            )
        )(circ, lp, x, t)
        # aux mean over microbatches == full-batch mean for decomposable
        # statistics
        def full_h(p_log):
            h = x
            for i in range(8):
                h = _toy_block(
                    jax.tree_util.tree_map(lambda a: a[i], p_log), h
                )
            return h

        h_full = full_h(_toy_stacked(depth=8))
        np.testing.assert_allclose(
            float(aux["h_mean"]), float(jnp.mean(h_full)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(aux["loss_copy"]), float(loss), rtol=1e-5
        )

    def test_sequential_fallback_logical_order(self):
        """S==1 fallback must undo the circular permutation (apply blocks
        in logical order)."""
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=2)
        stacked = _toy_stacked(depth=8)
        lp = _loss_params()
        # B=1 does not divide the data axis -> sequential fallback
        x, t = _data(B=1)
        circ, order = _to_circular(stacked, 2, 2)
        loss, d_circ, d_lp, dx = pipeline_1f1b_interleaved(
            _toy_block, circ, _loss_fn, lp, x, t, mesh,
            virtual=2, microbatches=1,
        )
        loss_ref, (d_ref, dlp_ref, dx_ref) = _seq_ref(stacked, lp, x, t)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        d_logical = jax.tree_util.tree_map(
            lambda a: np.asarray(a)[np.argsort(order)], d_circ
        )
        _check(d_logical, d_ref, rtol=2e-5, atol=1e-6)
