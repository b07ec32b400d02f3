"""Model layer tests: shapes, sparsemax semantics, dtype policy, freezing."""

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.models import (
    ModelConfig,
    ProbMapHead,
    ViTBackbone,
    build_model,
)
from probpose_pytorch_tpu.ops.sparsemax import sparsemax


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(
        variables, x, train=train, mutable=["batch_stats"] if train else False
    )
    return variables, out


class TestSparsemax:
    def test_projects_to_simplex(self):
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(size=(4, 9, 128)).astype(np.float32) * 3)
        p = sparsemax(z)
        np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-5)
        assert float(p.min()) >= 0
        # Sparse: plenty of exact zeros for spread inputs.
        assert float((p == 0).mean()) > 0.5

    def test_matches_sort_based_reference(self):
        rng = np.random.default_rng(1)
        z = rng.normal(size=(32, 257)).astype(np.float32)
        p = np.asarray(sparsemax(jnp.asarray(z)))
        # Sort-based closed form.
        zs = np.sort(z, axis=-1)[:, ::-1]
        css = np.cumsum(zs, axis=-1) - 1
        ks = np.arange(1, z.shape[-1] + 1)
        cond = zs * ks > css
        k = cond.sum(-1)
        tau = css[np.arange(len(z)), k - 1] / k
        ref = np.maximum(z - tau[:, None], 0)
        np.testing.assert_allclose(p, ref, atol=2e-6)

    def test_gradient_closed_form(self):
        z = jnp.asarray([[1.0, 0.5, -2.0, 0.4]])
        g = jax.grad(lambda z: (sparsemax(z) * jnp.asarray([1.0, 2.0, 3.0, 4.0])).sum())(z)
        # support = {z1, z2, z4}; grad = coeff - mean(coeff over support)
        coeff = np.array([1.0, 2.0, 4.0])
        expected = np.zeros(4)
        expected[[0, 1, 3]] = coeff - coeff.mean()
        np.testing.assert_allclose(np.asarray(g)[0], expected, atol=1e-6)


class TestViT:
    def test_feature_grid_shape(self):
        m = ViTBackbone(
            img_size=(64, 48), patch_size=16, embed_dim=64, depth=2,
            num_heads=2, dtype=jnp.float32,
        )
        x = jnp.zeros((2, 64, 48, 3))
        _, feats = _init_and_apply(m, x)
        assert feats.shape == (2, 4, 3, 64)

    def test_frozen_backbone_blocks_gradients(self):
        m = ViTBackbone(
            img_size=(32, 32), patch_size=16, embed_dim=32, depth=1,
            num_heads=2, dtype=jnp.float32, frozen=True, adapter_hidden=(32,),
        )
        x = jnp.ones((1, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(m.apply({"params": params}, x) ** 2)

        g = jax.grad(loss)(variables["params"])
        trunk_norm = sum(
            float(jnp.abs(v).sum())
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if "adapter" not in str(k)
        )
        adapter_norm = sum(
            float(jnp.abs(v).sum())
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if "adapter" in str(k)
        )
        assert trunk_norm == 0.0
        assert adapter_norm > 0.0


class TestHeadAndModel:
    def test_full_model_output_shapes(self):
        cfg = ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-s",
            compute_dtype="float32", pool_sizes=((2, 2), (2, 2)),
        )
        # Shrink the ViT for test speed.
        model = build_model(cfg)
        object.__setattr__(model.backbone, "depth", 1)
        x = jnp.zeros((2, 64, 48, 3))
        variables, (out, _) = _init_and_apply(model, x, train=True)
        heatmaps, prob, vis, oks, err = out
        W, H = cfg.heatmap_size
        assert heatmaps.shape == (2, 5, H, W)
        for t in (prob, vis, oks):
            assert t.shape == (2, 5, 1, 1)
            assert float(t.min()) >= 0 and float(t.max()) <= 1
        assert err.shape == (2, 5, 1, 1)
        assert float(err.min()) >= 0

    def test_sparsemax_normalization_bounds_heatmaps(self):
        head = ProbMapHead(
            out_channels=3, pool_sizes=((2, 2),), deconv_out_channels=(16,),
            deconv_kernel_sizes=(4,), normalize=1.0, dtype=jnp.float32,
        )
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6, 32))
        variables = head.init(jax.random.PRNGKey(0), feats, train=True)
        out, _ = head.apply(feats=feats, variables=variables, train=True,
                            mutable=["batch_stats"])
        hm = out[0]
        assert hm.shape == (2, 3, 16, 12)
        s = np.asarray(hm).reshape(2, 3, -1).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)  # simplex per channel

    def test_scalar_branches_detached(self):
        head = ProbMapHead(
            out_channels=2, pool_sizes=((2, 2),), deconv_out_channels=(8,),
            deconv_kernel_sizes=(4,), dtype=jnp.float32,
        )
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16))
        variables = head.init(jax.random.PRNGKey(0), feats, train=True)

        def loss_scalar_only(f):
            out, _ = head.apply(
                variables, f, train=True, mutable=["batch_stats"]
            )
            return sum(jnp.sum(t) for t in out[1:])

        g = jax.grad(loss_scalar_only)(feats)
        assert float(jnp.abs(g).max()) == 0.0  # all scalar branches detach

    def test_frozen_param_labels(self):
        head = ProbMapHead(
            out_channels=2, pool_sizes=((2, 2),), deconv_out_channels=(8,),
            deconv_kernel_sizes=(4,), dtype=jnp.float32,
        )
        feats = jnp.zeros((1, 4, 4, 16))
        variables = head.init(jax.random.PRNGKey(0), feats, train=True)
        params = {"head": variables["params"]}
        labels = ProbMapHead.frozen_param_labels(
            params, freeze_error=True, freeze_heatmaps=True
        )
        flat = jax.tree_util.tree_leaves_with_path(labels)
        froze = {"/".join(str(p) for p in k): v for k, v in flat}
        assert any("error" in k and v == "frozen" for k, v in froze.items())
        assert any("deconv" in k and v == "frozen" for k, v in froze.items())
        assert any("probability" in k and v == "trainable" for k, v in froze.items())


class TestConvBackbone:
    def test_feature_grid_contract_and_model(self):
        from probpose_pytorch_tpu.models.convnet import ConvBackbone

        m = ConvBackbone(
            img_size=(64, 48), stage_channels=(8, 16, 24, 32),
            stage_blocks=(1, 1, 1, 1), dtype=jnp.float32,
        )
        x = jnp.zeros((2, 64, 48, 3))
        variables = m.init(jax.random.PRNGKey(0), x, train=True)
        feats, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert feats.shape == (2, 4, 3, 32)  # stride 16, like ViT/p16

    def test_build_model_conv_preset(self):
        cfg = ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="conv-t",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        )
        model = build_model(cfg)
        x = jnp.zeros((2, 64, 48, 3))
        variables, (out, _) = _init_and_apply(model, x, train=True)
        W, H = cfg.heatmap_size
        assert out[0].shape == (2, 5, H, W)


class TestPallasAttention:
    def test_vit_pallas_attention_matches_einsum_forward(self):
        m_e = ViTBackbone(img_size=(64, 48), patch_size=16, embed_dim=64,
                          depth=2, num_heads=2, dtype=jnp.float32)
        m_p = ViTBackbone(img_size=(64, 48), patch_size=16, embed_dim=64,
                          depth=2, num_heads=2, dtype=jnp.float32,
                          attn_impl="pallas")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48, 3))
        variables = m_e.init(jax.random.PRNGKey(1), x)
        a = m_e.apply(variables, x)
        b = m_p.apply(variables, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFusedScalarBranches:
    """scalar_impl="fused" (3 grouped convs) vs "separate" (12 per-branch
    modules): identical param/batch_stats trees (same init values — same
    param paths drive the same RNG folds) and equal outputs in train and
    eval, including the running-stat updates."""

    def _heads(self):
        from probpose_pytorch_tpu.models.head import ProbMapHead

        kw = dict(
            out_channels=5,
            deconv_out_channels=(16,),
            deconv_kernel_sizes=(4,),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
            dtype=jnp.float32,
        )
        return (
            ProbMapHead(scalar_impl="fused", **kw),
            ProbMapHead(scalar_impl="separate", **kw),
        )

    def test_trees_and_outputs_match(self):
        fused, sep = self._heads()
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 8, 6, 32)), jnp.float32
        )
        vf = jax.jit(fused.init)(jax.random.PRNGKey(0), x)
        vs = jax.jit(sep.init)(jax.random.PRNGKey(0), x)
        tf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vf)
        ts = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vs)
        assert tf == ts
        for lf, ls in zip(
            jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vs)
        ):
            np.testing.assert_allclose(np.asarray(lf), np.asarray(ls))
        # eval-mode outputs equal on the same params
        of = fused.apply(vs, x, train=False)
        os_ = sep.apply(vs, x, train=False)
        for a, b in zip(of, os_):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_train_mode_outputs_and_stat_updates_match(self):
        fused, sep = self._heads()
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, 8, 6, 32)), jnp.float32
        )
        v = jax.jit(sep.init)(jax.random.PRNGKey(0), x)
        of, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
        os_, ms = sep.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(of, os_):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        for lf, ls in zip(
            jax.tree_util.tree_leaves(mf), jax.tree_util.tree_leaves(ms)
        ):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(ls), rtol=1e-5, atol=1e-6
            )
