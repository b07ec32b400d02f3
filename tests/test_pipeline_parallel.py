"""Pipeline parallelism (parallel/pipeline.py + ViTBackbone pp_stages).

Greenfield TPU scale-out design — the reference is single-device
(SURVEY.md §2.3). Validated on the virtual 8-device CPU mesh: the staged
pipeline (shard_map + per-tick ppermute) must be numerically equal to the
sequential trunk, forward and backward, and compose with data parallelism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.compat import stack_vit_blocks, unstack_vit_blocks
from probpose_pytorch_tpu.models.vit import ViTBackbone
from probpose_pytorch_tpu.parallel import (
    make_mesh,
    pick_microbatches,
    pipeline_spmd,
    shard_batch,
    shard_params,
)
from probpose_pytorch_tpu.parallel.pipeline import pipeline_1f1b


def _toy_stacked(depth=4, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(depth, dim, dim) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(depth, dim) * 0.1, jnp.float32),
    }


def _toy_block(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _sequential(stacked, x):
    depth = stacked["w"].shape[0]
    for i in range(depth):
        x = _toy_block(jax.tree.map(lambda a: a[i], stacked), x)
    return x


class TestPipelineSpmd:
    def test_forward_matches_sequential(self):
        stacked = _toy_stacked()
        x = jnp.asarray(
            np.random.RandomState(1).randn(16, 5, 8), jnp.float32
        )
        ref = _sequential(stacked, x)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        out = pipeline_spmd(_toy_block, stacked, x, mesh)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("microbatches", [1, 2, 8])
    def test_microbatch_counts(self, microbatches):
        stacked = _toy_stacked()
        x = jnp.asarray(
            np.random.RandomState(2).randn(16, 5, 8), jnp.float32
        )
        ref = _sequential(stacked, x)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        out = pipeline_spmd(
            _toy_block, stacked, x, mesh, microbatches=microbatches
        )
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_pipe_only_mesh(self):
        """S=8, dp=1: the degenerate all-pipe mesh."""
        stacked = _toy_stacked(depth=8)
        x = jnp.asarray(
            np.random.RandomState(3).randn(8, 3, 8), jnp.float32
        )
        ref = _sequential(stacked, x)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=8)
        out = pipeline_spmd(_toy_block, stacked, x, mesh)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_grad_matches_sequential(self):
        stacked = _toy_stacked()
        x = jnp.asarray(
            np.random.RandomState(4).randn(16, 5, 8), jnp.float32
        )
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)

        def loss_seq(p):
            return jnp.sum(_sequential(p, x) ** 2)

        def loss_pp(p):
            return jnp.sum(pipeline_spmd(_toy_block, p, x, mesh) ** 2)

        g_seq = jax.grad(loss_seq)(stacked)
        g_pp = jax.grad(loss_pp)(stacked)
        for k in stacked:
            np.testing.assert_allclose(
                g_pp[k], g_seq[k], rtol=1e-5, atol=1e-6
            )

    def test_no_pipe_axis_falls_back_to_scan(self):
        stacked = _toy_stacked()
        x = jnp.asarray(
            np.random.RandomState(5).randn(4, 5, 8), jnp.float32
        )
        ref = _sequential(stacked, x)
        out = pipeline_spmd(_toy_block, stacked, x, mesh=None)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_pick_microbatches(self):
        assert pick_microbatches(16, 4) == 8
        assert pick_microbatches(6, 4) == 6
        assert pick_microbatches(5, 4) == 5
        assert pick_microbatches(7, 2) == 1  # 7 prime, cap 4 -> 1
        assert pick_microbatches(2, 4) == 2

    def test_indivisible_depth_raises(self):
        stacked = _toy_stacked(depth=6)
        x = jnp.zeros((8, 3, 8), jnp.float32)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_spmd(_toy_block, stacked, x, mesh)


class Test1F1B:
    """pipeline_1f1b: interleaved one-forward-one-backward schedule with the
    loss folded into the last stage (parallel/pipeline.py). Loss + all three
    gradient outputs must match plain autodiff of the sequential trunk, and
    the GPipe path, on the virtual mesh."""

    def _loss_params(self, dim=8, out=3, seed=9):
        rng = np.random.RandomState(seed)
        return {"w": jnp.asarray(rng.randn(dim, out) * 0.4, jnp.float32)}

    def _loss_fn(self, lp, h, t):
        # mean-square linear probe: everything "after the trunk"
        return jnp.mean((h @ lp["w"] - t) ** 2)

    def _data(self, B=16, n=5, dim=8, out=3, seed=1):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(B, n, dim), jnp.float32)
        t = jnp.asarray(rng.randn(B, n, out), jnp.float32)
        return x, t

    def _seq_ref(self, stacked, lp, x, t):
        def total(p, lp_, xin):
            return self._loss_fn(lp_, _sequential(p, xin), t)

        loss, grads = jax.value_and_grad(total, argnums=(0, 1, 2))(
            stacked, lp, x
        )
        return loss, *grads

    def _check(self, got, want, rtol=1e-5, atol=1e-6):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
            ),
            got,
            want,
        )

    def test_matches_sequential_autodiff(self):
        stacked = _toy_stacked()
        lp = self._loss_params()
        x, t = self._data()
        ref = self._seq_ref(stacked, lp, x, t)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh
        )
        self._check(got, ref)

    @pytest.mark.parametrize("microbatches", [1, 2, 8])
    def test_microbatch_counts(self, microbatches):
        stacked = _toy_stacked()
        lp = self._loss_params()
        x, t = self._data(seed=2)
        ref = self._seq_ref(stacked, lp, x, t)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh,
            microbatches=microbatches,
        )
        self._check(got, ref)

    def test_pipe_only_mesh(self):
        stacked = _toy_stacked(depth=8)
        lp = self._loss_params()
        x, t = self._data(B=8, seed=3)
        ref = self._seq_ref(stacked, lp, x, t)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=8)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh
        )
        self._check(got, ref)

    def test_matches_gpipe_autodiff(self):
        """Same loss/grads as autodiff THROUGH pipeline_spmd + external
        loss — the schedules must be numerically interchangeable."""
        stacked = _toy_stacked()
        lp = self._loss_params()
        x, t = self._data(seed=4)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)

        def gpipe_total(p, lp_, xin):
            return self._loss_fn(
                lp_, pipeline_spmd(_toy_block, p, xin, mesh), t
            )

        loss_g, grads_g = jax.value_and_grad(
            gpipe_total, argnums=(0, 1, 2)
        )(stacked, lp, x)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh
        )
        self._check(got, (loss_g, *grads_g))

    def test_no_pipe_axis_sequential_fallback(self):
        stacked = _toy_stacked()
        lp = self._loss_params()
        x, t = self._data(B=4, seed=5)
        ref = self._seq_ref(stacked, lp, x, t)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh=None
        )
        self._check(got, ref)

    def test_tensor_parallel_stages(self):
        """Megatron-style toy block (column/row-sharded MLP) under
        dp=2 x tp=2 x pp=2: the tp_enter/tp_leave vjp boundaries must keep
        all grads exact through the engine's in-scan jax.vjp."""
        from probpose_pytorch_tpu.parallel.pipeline import tp_enter, tp_leave

        depth, dim, hid = 4, 8, 16
        rng = np.random.RandomState(7)
        stacked = {
            "w1": jnp.asarray(rng.randn(depth, dim, hid) * 0.3, jnp.float32),
            "w2": jnp.asarray(rng.randn(depth, hid, dim) * 0.3, jnp.float32),
            # replicated post-psum bias: its grad must NOT pick up any
            # model-axis factor (the failure mode of naive corrections)
            "b": jnp.asarray(rng.randn(depth, dim) * 0.1, jnp.float32),
        }

        def tp_block(p, h):
            u = jnp.tanh(tp_enter(h, "model") @ p["w1"])
            return h + tp_leave(u @ p["w2"], "model") + p["b"]

        def seq_block(p, h):
            return h + jnp.tanh(h @ p["w1"]) @ p["w2"] + p["b"]

        lp = self._loss_params()
        x, t = self._data(seed=8)

        def total(p, lp_, xin):
            h = xin
            for i in range(depth):
                h = seq_block(jax.tree.map(lambda a: a[i], p), h)
            return self._loss_fn(lp_, h, t)

        loss_ref, grads_ref = jax.value_and_grad(
            total, argnums=(0, 1, 2)
        )(stacked, lp, x)

        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        got = pipeline_1f1b(
            tp_block,
            stacked,
            self._loss_fn,
            lp,
            x,
            t,
            mesh,
            model_axis="model",
            param_specs={
                "w1": P("pipe", None, "model"),
                "w2": P("pipe", "model", None),
                "b": P("pipe"),
            },
            seq_block_fn=seq_block,
        )
        self._check(got, (loss_ref, *grads_ref), rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize(
        "pp,m,b",
        [
            (4, 3, 24),  # M < S: warmup/drain overlap dominates
            (2, 5, 20),  # odd M
            (8, 2, 16),  # deep pipe, tiny M
            (2, 10, 40),  # M >> S (the 1F1B memory win regime)
        ],
    )
    def test_schedule_edge_geometries(self, pp, m, b):
        depth = 8
        stacked = _toy_stacked(depth=depth)
        lp = self._loss_params()
        x, t = self._data(B=b, seed=40 + pp)
        ref = self._seq_ref(stacked, lp, x, t)
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=pp)
        got = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, x, t, mesh,
            microbatches=m,
        )
        self._check(got, ref)

    def test_bf16_activations(self):
        """bf16 trunk activations: cotangent dtypes follow the activations
        (the production compute dtype), grads stay close to the f32 path."""
        stacked = _toy_stacked()
        lp = self._loss_params()
        x, t = self._data(seed=6)

        def bf16_block(p, h):
            return jnp.tanh(
                h @ p["w"].astype(jnp.bfloat16) + p["b"].astype(jnp.bfloat16)
            )

        def bf16_loss(lp_, h, t_):
            return jnp.mean(
                (h.astype(jnp.float32) @ lp_["w"] - t_) ** 2
            )

        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        loss, d_p, d_lp, dx = pipeline_1f1b(
            bf16_block, stacked, bf16_loss, lp,
            x.astype(jnp.bfloat16), t, mesh,
        )
        assert dx.dtype == jnp.bfloat16
        ref = jax.value_and_grad(
            lambda p, l, xi: bf16_loss(
                l,
                (lambda h: [h := bf16_block(jax.tree.map(lambda a: a[i], p), h) for i in range(4)][-1])(xi),
                t,
            ),
            argnums=(0, 1, 2),
        )(stacked, lp, x.astype(jnp.bfloat16))
        loss_ref, (d_p_ref, d_lp_ref, dx_ref) = ref
        # bf16 microbatch-mean ordering differs from the monolithic mean
        np.testing.assert_allclose(
            float(loss), float(loss_ref), rtol=1e-3
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-3,
            ),
            (d_p, d_lp, dx),
            (d_p_ref, d_lp_ref, dx_ref),
        )

    def test_dx_chains_into_upstream_embed(self):
        """The documented full-model composition: an upstream patch-embed
        runs under its own jax.vjp and consumes the engine's dx output —
        every gradient (embed params, trunk, loss params) must equal plain
        autodiff of the end-to-end composition."""
        stacked = _toy_stacked()
        lp = self._loss_params()
        rng = np.random.RandomState(31)
        ep = {"w": jnp.asarray(rng.randn(6, 8) * 0.4, jnp.float32)}
        xraw = jnp.asarray(rng.randn(16, 5, 6), jnp.float32)
        t = jnp.asarray(rng.randn(16, 5, 3), jnp.float32)

        def embed_fn(ep_, xr):
            return jnp.tanh(xr @ ep_["w"])

        def total(ep_, p, lp_):
            h = embed_fn(ep_, xraw)
            for i in range(stacked["w"].shape[0]):
                h = _toy_block(jax.tree.map(lambda a: a[i], p), h)
            return self._loss_fn(lp_, h, t)

        loss_ref, (d_ep_ref, d_p_ref, d_lp_ref) = jax.value_and_grad(
            total, argnums=(0, 1, 2)
        )(ep, stacked, lp)

        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        h0, embed_vjp = jax.vjp(lambda e: embed_fn(e, xraw), ep)
        loss, d_p, d_lp, dh0 = pipeline_1f1b(
            _toy_block, stacked, self._loss_fn, lp, h0, t, mesh
        )
        (d_ep,) = embed_vjp(dh0)
        self._check(
            (loss, d_ep, d_p, d_lp),
            (loss_ref, d_ep_ref, d_p_ref, d_lp_ref),
        )

    def test_vit_block_tensor_parallel_stages(self):
        """The real ViT block (tp_block_apply with vjp_boundaries=True)
        under dp=2 x tp=2 x pp=2: loss and all grads match the sequential
        full-width block."""
        from probpose_pytorch_tpu.models.vit import (
            stacked_param_specs,
            tp_block_apply,
        )

        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        depth, heads, dim = 2, 2, 64
        # head-major stacked params from a fused_tp ViT init
        vit = ViTBackbone(
            **dict(_vit_kw(depth=depth), attn_impl="fused_tp"),
            pp_stages=2,
            mesh=mesh,
        )
        xim = jnp.zeros((8, 64, 48, 3), jnp.float32)
        flat = vit.init(jax.random.PRNGKey(0), xim)["params"]["blocks"]
        flat = jax.tree.map(jnp.asarray, flat)

        kw = dict(dtype=jnp.float32)

        def block_fn(p, h):
            return tp_block_apply(
                p, h, heads=heads // 2, model_axis="model",
                vjp_boundaries=True, **kw,
            )

        def seq_fn(p, h):
            return tp_block_apply(p, h, heads=heads, model_axis=None, **kw)

        rng = np.random.RandomState(21)
        x = jnp.asarray(rng.randn(8, 12, dim) * 0.5, jnp.float32)
        t = jnp.asarray(rng.randn(8, 12, 3), jnp.float32)
        lp = self._loss_params(dim=dim)

        def total(p, lp_, xin):
            h = xin
            for i in range(depth):
                h = seq_fn(jax.tree.map(lambda a: a[i], p), h)
            return self._loss_fn(lp_, h, t)

        loss_ref, grads_ref = jax.value_and_grad(
            total, argnums=(0, 1, 2)
        )(flat, lp, x)
        got = pipeline_1f1b(
            block_fn,
            flat,
            self._loss_fn,
            lp,
            x,
            t,
            mesh,
            model_axis="model",
            param_specs=stacked_param_specs(),
            seq_block_fn=seq_fn,
        )
        self._check(got, (loss_ref, *grads_ref), rtol=5e-4, atol=2e-5)


def _vit_kw(depth=4):
    return dict(
        img_size=(64, 48),
        patch_size=16,
        embed_dim=64,
        depth=depth,
        num_heads=2,
        mlp_ratio=2.0,
        dtype=jnp.float32,
    )


class TestPipelinedViT:
    def test_forward_and_grad_parity(self):
        """pp=4 x dp=2 trunk == sequential trunk, params converted both ways."""
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        seq = ViTBackbone(**_vit_kw())
        pp = ViTBackbone(**_vit_kw(), pp_stages=4, mesh=mesh)
        x = jnp.asarray(
            np.random.RandomState(0).rand(8, 64, 48, 3), jnp.float32
        )
        params_seq = seq.init(jax.random.PRNGKey(0), x)["params"]
        params_pp = jax.tree.map(
            jnp.asarray, stack_vit_blocks(params_seq)
        )
        ref = seq.apply({"params": params_seq}, x)
        out = pp.apply({"params": params_pp}, x)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

        # round-trip converter
        back = unstack_vit_blocks(params_pp)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            back,
            jax.tree.map(np.asarray, params_seq),
        )

        def loss_seq(p):
            return jnp.mean(seq.apply({"params": p}, x) ** 2)

        def loss_pp(p):
            return jnp.mean(pp.apply({"params": p}, x) ** 2)

        g_seq = stack_vit_blocks(jax.grad(loss_seq)(params_seq))
        g_pp = jax.grad(loss_pp)(params_pp)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            ),
            g_pp,
            jax.tree.map(np.asarray, g_seq),
        )

    def test_remat_composes_with_pipeline(self):
        """jax.checkpoint per block inside the pipeline (the GPipe memory
        recipe) preserves forward and gradient numerics."""
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        seq = ViTBackbone(**_vit_kw())
        pp = ViTBackbone(**_vit_kw(), pp_stages=4, mesh=mesh, remat=True)
        x = jnp.asarray(
            np.random.RandomState(7).rand(8, 64, 48, 3), jnp.float32
        )
        params_seq = seq.init(jax.random.PRNGKey(0), x)["params"]
        params_pp = jax.tree.map(jnp.asarray, stack_vit_blocks(params_seq))
        np.testing.assert_allclose(
            pp.apply({"params": params_pp}, x),
            seq.apply({"params": params_seq}, x),
            rtol=2e-5,
            atol=2e-5,
        )
        g_seq = stack_vit_blocks(
            jax.grad(
                lambda p: jnp.mean(seq.apply({"params": p}, x) ** 2)
            )(params_seq)
        )
        g_pp = jax.grad(
            lambda p: jnp.mean(pp.apply({"params": p}, x) ** 2)
        )(params_pp)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            ),
            g_pp,
            jax.tree.map(np.asarray, g_seq),
        )

    def test_stacked_init_distribution(self):
        """pp-mode init draws per-block (no two blocks share a kernel)."""
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=4)
        pp = ViTBackbone(**_vit_kw(), pp_stages=4, mesh=mesh)
        x = jnp.zeros((8, 64, 48, 3), jnp.float32)
        params = pp.init(jax.random.PRNGKey(0), x)["params"]
        qkv = np.asarray(params["blocks"]["qkv_kernel"])
        assert qkv.shape == (4, 64, 192)
        for i in range(1, 4):
            assert not np.allclose(qkv[0], qkv[i])
        # LeCun-normal scale sanity (std ~ 1/sqrt(64) = 0.125)
        assert 0.08 < qkv.std() < 0.17


class TestTensorParallelInPipeline:
    """TP inside a pipeline stage (3-axis dp x tp x pp mesh): the stacked
    Megatron dims shard over "model" and tp_block_apply supplies the
    in-block psums (models/vit.py) — numerics must match the sequential
    head-major trunk."""

    def test_forward_and_grad_parity(self):
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        kw = dict(_vit_kw(), attn_impl="fused_tp")
        seq = ViTBackbone(**kw)
        tpp = ViTBackbone(**kw, pp_stages=2, mesh=mesh)
        x = jnp.asarray(
            np.random.RandomState(11).rand(8, 64, 48, 3), jnp.float32
        )
        params_seq = seq.init(jax.random.PRNGKey(0), x)["params"]
        params_tpp = jax.tree.map(jnp.asarray, stack_vit_blocks(params_seq))
        np.testing.assert_allclose(
            tpp.apply({"params": params_tpp}, x),
            seq.apply({"params": params_seq}, x),
            rtol=2e-5,
            atol=2e-5,
        )
        g_seq = stack_vit_blocks(
            jax.grad(
                lambda p: jnp.mean(seq.apply({"params": p}, x) ** 2)
            )(params_seq)
        )
        g_tpp = jax.grad(
            lambda p: jnp.mean(tpp.apply({"params": p}, x) ** 2)
        )(params_tpp)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            ),
            g_tpp,
            jax.tree.map(np.asarray, g_seq),
        )

    def test_kernel_path_under_tp_pipeline(self, monkeypatch):
        """Interpret-mode packed Pallas attention inside the tp+pp
        shard_map == the einsum fallback path."""
        monkeypatch.setenv("PROBPOSE_PALLAS_INTERPRET", "1")
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        kw = dict(_vit_kw(), attn_impl="fused_tp")
        tpp = ViTBackbone(**kw, pp_stages=2, mesh=mesh)
        x = jnp.asarray(
            np.random.RandomState(12).rand(8, 64, 48, 3), jnp.float32
        )
        params = tpp.init(jax.random.PRNGKey(1), x)["params"]
        out_kernel = tpp.apply({"params": params}, x)
        monkeypatch.delenv("PROBPOSE_PALLAS_INTERPRET")
        out_einsum = tpp.apply({"params": params}, x)
        np.testing.assert_allclose(
            out_kernel, out_einsum, rtol=2e-5, atol=2e-5
        )

    def test_remat_composes(self):
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        kw = dict(_vit_kw(), attn_impl="fused_tp")
        seq = ViTBackbone(**kw)
        tpp = ViTBackbone(**kw, pp_stages=2, mesh=mesh, remat=True)
        x = jnp.asarray(
            np.random.RandomState(13).rand(8, 64, 48, 3), jnp.float32
        )
        params_seq = seq.init(jax.random.PRNGKey(0), x)["params"]
        params_tpp = jax.tree.map(jnp.asarray, stack_vit_blocks(params_seq))
        g_seq = stack_vit_blocks(
            jax.grad(
                lambda p: jnp.mean(seq.apply({"params": p}, x) ** 2)
            )(params_seq)
        )
        g_tpp = jax.grad(
            lambda p: jnp.mean(tpp.apply({"params": p}, x) ** 2)
        )(params_tpp)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            ),
            g_tpp,
            jax.tree.map(np.asarray, g_seq),
        )

    def test_requires_head_major_layout(self):
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        x = jnp.zeros((8, 64, 48, 3), jnp.float32)
        bad = ViTBackbone(**_vit_kw(), pp_stages=2, mesh=mesh)  # einsum
        with pytest.raises(ValueError, match="fused_tp"):
            bad.init(jax.random.PRNGKey(0), x)

    def test_train_step_on_tp_pp_mesh(self):
        """Full train step on a (data=2, model=2, pipe=2) mesh: the
        pre-update loss equals a dp-only trainer fed the same params
        (unstacked + converted back to qkv-major)."""
        import dataclasses

        from probpose_pytorch_tpu.compat import qkv_to_qkv_major
        from probpose_pytorch_tpu.data import SyntheticPoseDataset
        from probpose_pytorch_tpu.data.pipeline import batch_iterator
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48),
                num_keypoints=5,
                backbone="vit-nano",
                compute_dtype="float32",
                attn_impl="fused_tp",
                deconv_out_channels=(32, 32),
                deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            train_batch_size=8,
            out_dir="/tmp/probpose_tp_pp_test",
            pipeline_parallel=2,
        )
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        trainer = Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
        assert trainer.cfg.model.pp_stages == 2

        ds = SyntheticPoseDataset(8, cfg.model.img_size, 5)
        batch = next(iter(batch_iterator(ds, 8, num_workers=1)))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        params_np = jax.tree.map(np.asarray, trainer.state.params)
        state = trainer.state.replace(
            params=shard_params(trainer.state.params, mesh)
        )
        _, metrics = trainer.train_step(state, shard_batch(batch, mesh))
        loss_tpp = float(metrics["loss"])
        assert np.isfinite(loss_tpp)

        # dp-only trainer, same params: unstack the trunk and convert the
        # qkv columns back to qkv-major (vit-nano heads=2).
        cfg_dp = dataclasses.replace(
            cfg,
            pipeline_parallel=1,
            model=dataclasses.replace(cfg.model, attn_impl="einsum"),
            out_dir="/tmp/probpose_tp_pp_test_dp",
        )
        mesh_dp = make_mesh(8, model_parallel=1)
        trainer_dp = Trainer.create(cfg_dp, steps_per_epoch=4, mesh=mesh_dp)
        params = dict(params_np)
        params["backbone"] = qkv_to_qkv_major(
            unstack_vit_blocks(params["backbone"]), num_heads=2
        )
        params = jax.tree.map(jnp.asarray, params)
        state_dp = trainer_dp.state.replace(
            params=shard_params(params, mesh_dp)
        )
        _, metrics_dp = trainer_dp.train_step(
            state_dp, shard_batch(batch, mesh_dp)
        )
        np.testing.assert_allclose(
            loss_tpp, float(metrics_dp["loss"]), rtol=1e-5
        )


class TestTrunkLayoutRestore:
    def test_per_block_checkpoint_resumes_onto_pp_mesh(self, tmp_path):
        """A single-device (per-block) checkpoint restores onto a
        pipeline-parallel trainer exactly: the sidecar trunk-layout metadata
        triggers a structural stack of params AND Adam moments
        (train/loop.py:restore_state_with_layout), so the post-resume step
        loss equals the uninterrupted single-device run's."""
        import dataclasses

        from probpose_pytorch_tpu.data import SyntheticPoseDataset
        from probpose_pytorch_tpu.data.pipeline import batch_iterator
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.train import (
            TrainConfig,
            Trainer,
            layout_metadata,
            restore_state_with_layout,
        )
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48),
                num_keypoints=5,
                backbone="vit-nano",
                compute_dtype="float32",
                deconv_out_channels=(32, 32),
                deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            train_batch_size=8,
            out_dir=str(tmp_path / "run"),
        )
        ds = SyntheticPoseDataset(8, cfg.model.img_size, 5)
        batch = {
            k: jnp.asarray(v)
            for k, v in next(iter(batch_iterator(ds, 8, num_workers=1))).items()
        }

        trainer1 = Trainer.create(cfg, steps_per_epoch=2)
        state1, _ = trainer1.train_step(trainer1.state, batch)
        ckpt = CheckpointManager(tmp_path / "ck", keep=1)
        ckpt.save(1, state1, metadata=layout_metadata(trainer1.cfg))
        assert ckpt.read_metadata()["trunk_layout"] == "per_block"
        state1b, m_ref = trainer1.train_step(state1, batch)  # step 2

        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=2)
        cfg_pp = dataclasses.replace(
            cfg,
            pipeline_parallel=2,
            out_dir=str(tmp_path / "run_pp"),
        )
        trainer_pp = Trainer.create(cfg_pp, steps_per_epoch=2, mesh=mesh)
        restored = restore_state_with_layout(
            ckpt, trainer_pp.state, trainer_pp.cfg
        )
        assert "blocks" in restored.params["backbone"]
        assert int(restored.step) == 1
        # (train_step donates its input state — one call yields both.)
        state_pp, m_pp = trainer_pp.train_step(
            restored, shard_batch(batch, mesh)
        )
        np.testing.assert_allclose(
            float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-5
        )

        # Reverse direction: the pp run's checkpoint restores onto a fresh
        # per-block trainer with identical numerics.
        ckpt2 = CheckpointManager(tmp_path / "ck2", keep=1)
        ckpt2.save(2, state_pp, metadata=layout_metadata(trainer_pp.cfg))
        assert ckpt2.read_metadata()["trunk_layout"] == "stacked"
        trainer2 = Trainer.create(
            dataclasses.replace(cfg, out_dir=str(tmp_path / "run2")),
            steps_per_epoch=2,
        )
        back = restore_state_with_layout(ckpt2, trainer2.state, trainer2.cfg)
        assert "block0" in back.params["backbone"]
        np.testing.assert_allclose(
            np.asarray(back.params["backbone"]["block0"]["attn"]["qkv"]["kernel"]),
            np.asarray(state_pp.params["backbone"]["blocks"]["qkv_kernel"])[0],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(trainer2.train_step(back, batch)[1]["loss"]),
            float(
                trainer_pp.train_step(state_pp, shard_batch(batch, mesh))[1][
                    "loss"
                ]
            ),
            rtol=1e-5,
        )


class TestPipelinedTrainer:
    def test_train_step_on_pp_mesh(self):
        """Full train step on a (data=4, model=1, pipe=2) mesh: runs, loss
        finite, and the pre-update loss equals a dp-only trainer fed the
        same (converted) params."""
        import dataclasses

        from probpose_pytorch_tpu.data import SyntheticPoseDataset
        from probpose_pytorch_tpu.data.pipeline import batch_iterator
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48),
                num_keypoints=5,
                backbone="vit-nano",
                compute_dtype="float32",
                deconv_out_channels=(32, 32),
                deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            train_batch_size=8,
            out_dir="/tmp/probpose_pp_test",
            pipeline_parallel=2,
        )
        mesh = make_mesh(8, model_parallel=1, pipeline_parallel=2)
        trainer = Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
        assert trainer.cfg.model.pp_stages == 2

        ds = SyntheticPoseDataset(8, cfg.model.img_size, 5)
        batch = next(iter(batch_iterator(ds, 8, num_workers=1)))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        # train_step donates its input state — snapshot params first.
        params_np = jax.tree.map(np.asarray, trainer.state.params)
        state = trainer.state.replace(
            params=shard_params(trainer.state.params, mesh)
        )
        new_state, metrics = trainer.train_step(
            state, shard_batch(batch, mesh)
        )
        jax.block_until_ready(new_state.params)
        loss_pp = float(metrics["loss"])
        assert np.isfinite(loss_pp)

        # dp-only trainer with the UNSTACKED params must see the same loss.
        cfg_dp = dataclasses.replace(
            cfg, pipeline_parallel=1, out_dir="/tmp/probpose_pp_test_dp"
        )
        mesh_dp = make_mesh(8, model_parallel=1)
        trainer_dp = Trainer.create(cfg_dp, steps_per_epoch=4, mesh=mesh_dp)
        params = dict(params_np)
        params["backbone"] = unstack_vit_blocks(params["backbone"])
        params = jax.tree.map(jnp.asarray, params)
        state_dp = trainer_dp.state.replace(
            params=shard_params(params, mesh_dp)
        )
        _, metrics_dp = trainer_dp.train_step(
            state_dp, shard_batch(batch, mesh_dp)
        )
        np.testing.assert_allclose(
            loss_pp, float(metrics_dp["loss"]), rtol=1e-5
        )


def test_cli_pipeline_parallel(tmp_path):
    """`TrainConfig.pipeline_parallel` drives the CLI end to end: the mesh
    gains a pipe axis sized from the config, the trainer auto-stages the
    trunk, and two synthetic-data steps train to a finite logged loss."""
    import json

    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig
    from probpose_pytorch_tpu.train.cli import main

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48),
            num_keypoints=5,
            backbone="vit-nano",
            compute_dtype="float32",
            deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        epochs=1,
        train_batch_size=8,
        val_batch_size=8,
        val_every=1000,
        dataset_format="synthetic",
        num_workers=1,
        pipeline_parallel=2,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)
    out = tmp_path / "out"
    main([str(out), "--config", str(cfg_path), "--max-steps", "2"])
    lines = [
        json.loads(l)
        for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [l["training/loss"] for l in lines if "training/loss" in l]
    assert losses and all(np.isfinite(v) for v in losses)
