"""LoRA fine-tuning: identity at init, frozen-base training, merge, layouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.models.lora import (
    lora_frozen_labels,
    merge_lora_params,
)
from probpose_pytorch_tpu.models.model import ModelConfig, build_model
from probpose_pytorch_tpu.models.vit import Attention, ViTConfig

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


def _cfg(**over):
    base = dict(
        img_size=(64, 48),
        num_keypoints=5,
        backbone="vit-tiny-e2e",
        compute_dtype="float32",
        deconv_out_channels=(16, 16),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
    )
    base.update(over)
    return ModelConfig(**base)


def _strip_lora(tree):
    if not isinstance(tree, dict):
        return tree
    return {
        k: _strip_lora(v) for k, v in tree.items() if not k.endswith("_lora")
    }


def _init(model, seed=0):
    x = jnp.zeros((2, 64, 48, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, train=False), x


class TestLoRAModel:
    def test_zero_at_init_and_param_shapes(self):
        """B starts at zero, so a LoRA model equals the base model applied
        to the lora-stripped params — enabling LoRA on a checkpoint is a
        no-op until training moves the deltas."""
        lora_model = build_model(_cfg(lora_rank=4))
        base_model = build_model(_cfg())
        variables, x = _init(lora_model)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((2, 64, 48, 3), np.float32))
        out_lora = lora_model.apply(variables, img, train=False)
        b0 = variables["params"]["backbone"]["block0"]
        for mod, name in [("attn", "qkv_lora"), ("attn", "proj_lora"),
                          ("mlp", "fc1_lora"), ("mlp", "fc2_lora")]:
            assert name in b0[mod], (mod, name)
            assert b0[mod][name]["a"].shape[-1] == 4
            np.testing.assert_array_equal(b0[mod][name]["b"], 0.0)
        base_vars = {
            "params": _strip_lora(variables["params"]),
            "batch_stats": variables["batch_stats"],
        }
        out_base = base_model.apply(base_vars, img, train=False)
        for a, b in zip(out_lora, out_base):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    def test_merge_matches_unmerged(self):
        lora_model = build_model(_cfg(lora_rank=2, lora_alpha=8.0))
        base_model = build_model(_cfg())
        variables, _ = _init(lora_model)
        # give the deltas real values
        rng = np.random.default_rng(1)
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: (
                jnp.asarray(rng.normal(0, 0.05, v.shape), v.dtype)
                if any("lora" in str(getattr(k, "key", k)) for k in p)
                else v
            ),
            variables["params"],
        )
        img = jnp.asarray(rng.random((2, 64, 48, 3), np.float32))
        out_lora = lora_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, train=False,
        )
        merged = merge_lora_params(params, alpha=8.0)
        assert "qkv_lora" not in merged["backbone"]["block0"]["attn"]
        out_merged = base_model.apply(
            {"params": merged, "batch_stats": variables["batch_stats"]},
            img, train=False,
        )
        for a, b in zip(out_lora, out_merged):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_merge_rejects_orphan_lora(self):
        with pytest.raises(ValueError, match="sibling"):
            merge_lora_params(
                {"x_lora": {"a": np.zeros((4, 2)), "b": np.zeros((2, 8))}},
                alpha=16.0,
            )

    def test_validations(self):
        with pytest.raises(ValueError, match="ViT"):
            build_model(_cfg(backbone="conv-t", lora_rank=2))
        model = build_model(_cfg(lora_rank=2, mlp_impl="fused"))
        with pytest.raises(ValueError, match="fused"):
            _init(model)


class TestLoRATraining:
    def test_train_lora_only_freezes_base(self, tmp_path):
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=_cfg(lora_rank=2),
            train_lora_only=True,
            epochs=1,
            train_batch_size=2,
            val_every=1000,
            log_every=1,
            out_dir=str(tmp_path / "run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=1)
        batches = list(batch_iterator(ds, 2, shuffle=False, num_workers=1))
        p0 = jax.device_get(trainer.state.params)
        state = trainer.state
        for b in batches:
            state, _ = trainer.train_step(state, b)
        p1 = jax.device_get(state.params)

        def leaves(tree, pred):
            out = []
            jax.tree_util.tree_map_with_path(
                lambda p, v: out.append((p, v))
                if pred([str(getattr(k, "key", k)) for k in p])
                else None,
                tree,
            )
            return out

        base = leaves(
            p0["backbone"],
            lambda ks: not any("lora" in k for k in ks),
        )
        base1 = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in leaves(
                p1["backbone"],
                lambda ks: not any("lora" in k for k in ks),
            )
        )
        assert base
        for p, v in base:
            np.testing.assert_array_equal(
                base1[jax.tree_util.keystr(p)], v,
                err_msg=f"frozen base param moved: {p}",
            )
        lora0 = leaves(p0["backbone"], lambda ks: any("lora" in k for k in ks))
        lora1 = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in leaves(
                p1["backbone"], lambda ks: any("lora" in k for k in ks)
            )
        )
        assert lora0
        moved = sum(
            float(np.abs(lora1[jax.tree_util.keystr(p)] - v).max()) > 0
            for p, v in lora0
        )
        assert moved > 0, "no LoRA parameter trained"
        # head trains too
        h0 = jax.tree_util.tree_leaves(p0["head"])
        h1 = jax.tree_util.tree_leaves(p1["head"])
        assert any(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
            for a, b in zip(h1, h0)
        )

    def test_merge_lora_cli(self, tmp_path):
        """End-to-end deployment conversion: train a LoRA run, checkpoint
        it, fold the deltas with the merge CLI, and check the merged
        (rank-0) checkpoint reproduces the LoRA model's forward exactly."""
        from probpose_pytorch_tpu.compat.merge_lora import main as merge_main
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )
        from probpose_pytorch_tpu.train import TrainConfig, Trainer
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
        from probpose_pytorch_tpu.train.loop import (
            layout_metadata,
            restore_state_with_layout,
        )

        run = tmp_path / "run"
        cfg = TrainConfig(
            model=_cfg(lora_rank=2),
            train_lora_only=True,
            epochs=1,
            train_batch_size=2,
            val_every=1000,
            log_every=1,
            out_dir=str(run),
        )
        run.mkdir(parents=True)
        cfg.save(run / "config.json")
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=3)
        state = trainer.state
        for b in batch_iterator(ds, 2, shuffle=False, num_workers=1):
            state, _ = trainer.train_step(state, b)
        ckpt = CheckpointManager(run / "checkpoints")
        ckpt.save(int(state.step), state, force=True,
                  metadata=layout_metadata(cfg))
        ckpt.close()

        out = tmp_path / "merged"
        merge_main(["--checkpoint", str(run / "checkpoints"),
                    "--out", str(out)])

        merged_cfg = TrainConfig.load(out / "config.json")
        assert merged_cfg.model.lora_rank == 0
        assert merged_cfg.train_lora_only is False
        target = Trainer.create(merged_cfg, steps_per_epoch=1)
        merged = restore_state_with_layout(
            CheckpointManager(out / "checkpoints"), target.state, merged_cfg
        )
        assert int(merged.step) == int(state.step)

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 64, 48, 3)),
            jnp.float32,
        )
        lora_out = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        merged_out = target.model.apply(
            {"params": merged.params, "batch_stats": merged.batch_stats},
            x, train=False,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            ),
            lora_out, merged_out,
        )

    def test_merge_lora_cli_rejects_rank0(self, tmp_path):
        from probpose_pytorch_tpu.compat.merge_lora import main as merge_main
        from probpose_pytorch_tpu.train import TrainConfig

        run = tmp_path / "run"
        run.mkdir()
        TrainConfig(model=_cfg(), out_dir=str(run)).save(run / "config.json")
        with pytest.raises(ValueError, match="nothing to merge"):
            merge_main(["--checkpoint", str(run / "checkpoints"),
                        "--out", str(tmp_path / "m")])

    def test_train_lora_only_requires_rank(self, tmp_path):
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=_cfg(),
            train_lora_only=True,
            out_dir=str(tmp_path / "run"),
        )
        with pytest.raises(ValueError, match="lora_rank"):
            Trainer.create(cfg, steps_per_epoch=1)


class TestLoRALabels:
    def test_labels(self):
        params = {
            "backbone": {
                "block0": {
                    "attn": {
                        "qkv": {"kernel": np.zeros(1)},
                        "qkv_lora": {"a": np.zeros(1), "b": np.zeros(1)},
                    }
                }
            },
            "head": {"final": {"kernel": np.zeros(1)}},
        }
        labels = lora_frozen_labels(params)
        assert labels["backbone"]["block0"]["attn"]["qkv"]["kernel"] == "frozen"
        assert labels["backbone"]["block0"]["attn"]["qkv_lora"]["a"] == "trainable"
        assert labels["head"]["final"]["kernel"] == "trainable"


class TestLoRALayouts:
    def test_qkv_layout_roundtrip_and_semantics(self):
        """head-major conversion permutes qkv_lora/b like the qkv kernel:
        einsum attention on original params == fused_tp (head-major einsum
        fallback) attention on converted params."""
        from probpose_pytorch_tpu.compat.layouts import (
            qkv_to_head_major,
            qkv_to_qkv_major,
        )

        heads = 2
        attn = Attention(heads, dtype=jnp.float32, impl="einsum", lora_rank=2)
        attn_hm = Attention(
            heads, dtype=jnp.float32, impl="fused_tp", lora_rank=2
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 6, 8), np.float32))
        variables = attn.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda v: jnp.asarray(rng.normal(0, 0.1, v.shape), v.dtype),
            variables["params"],
        )
        wrapped = {"attn": params}  # path must contain "attn" for the perm
        converted = qkv_to_head_major(wrapped, heads)["attn"]
        back = qkv_to_qkv_major(
            qkv_to_head_major(wrapped, heads), heads
        )["attn"]
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            np.testing.assert_allclose(a, b, err_msg=str(pa))
        out = attn.apply({"params": params}, x)
        out_hm = attn_hm.apply({"params": converted}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_hm), rtol=1e-5, atol=1e-5
        )
