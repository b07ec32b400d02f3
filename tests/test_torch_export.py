"""Torch-export verification: exact round-trips and a torch-forward oracle.

The exporter must be the exact inverse of compat/torch_import.py —
import(export(tree)) == tree on real model trees — and its state dicts must
load into reference-layout torch modules and reproduce our forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from probpose_pytorch_tpu.compat.torch_export import (  # noqa: E402
    export_head_params,
    export_timm_vit_params,
    save_reference_checkpoint,
)
from probpose_pytorch_tpu.compat.torch_import import (  # noqa: E402
    import_head_params,
    import_timm_vit_params,
)
from probpose_pytorch_tpu.models.model import (  # noqa: E402
    ModelConfig,
    build_model,
)
from probpose_pytorch_tpu.models.vit import ViTConfig  # noqa: E402

from test_torch_import import _torch_head  # noqa: E402

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


def _init_model(cfg, seed=0):
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(1, 64, 48, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    return model, variables


def _assert_trees_equal(a, b, msg=""):
    ja = jax.tree_util.tree_leaves_with_path(a)
    jb = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(b)
    )
    assert len(ja) == len(jb), (
        f"{msg}: leaf count {len(ja)} != {len(jb)}"
    )
    for p, v in ja:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(jb[jax.tree_util.keystr(p)]),
            err_msg=f"{msg}: {jax.tree_util.keystr(p)}",
        )


class TestRoundTrip:
    def test_head_import_export_roundtrip(self):
        """import(export(head tree)) == head tree on a real model init."""
        _, variables = _init_model(_cfg())
        hp = jax.tree_util.tree_map(np.asarray, variables["params"]["head"])
        hs = jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]["head"]
        )
        sd = export_head_params(hp, hs)
        rp, rs = import_head_params(
            sd, num_deconv=2, num_conv=0, num_pool_stages=2
        )
        _assert_trees_equal(rp, hp, "params")
        _assert_trees_equal(rs, hs, "batch_stats")

    def test_vit_import_export_roundtrip(self):
        _, variables = _init_model(_cfg())
        bp = jax.tree_util.tree_map(
            np.asarray, variables["params"]["backbone"]
        )
        sd = export_timm_vit_params(bp)
        rp = import_timm_vit_params(sd, depth=1)
        _assert_trees_equal(rp, bp, "backbone")

    def test_vit_export_rejects_prefix_tokens_and_lora(self):
        with pytest.raises(ValueError, match="timm"):
            export_timm_vit_params(
                {"patch_embed": {}, "prefix_tokens": np.zeros((1, 1, 8))}
            )
        with pytest.raises(ValueError, match="timm"):
            export_timm_vit_params(
                {
                    "patch_embed": {},
                    "block0": {},
                    "qkv_lora": {"a": np.zeros(1)},
                }
            )
        # LoRA deltas live NESTED inside blocks — the guard must find them
        # there too (they used to bypass a top-level-only scan and silently
        # drop from the export)
        with pytest.raises(ValueError, match="qkv_lora"):
            export_timm_vit_params(
                {
                    "patch_embed": {},
                    "block0": {"attn": {"qkv_lora": {"a": np.zeros(1)}}},
                }
            )


class TestTorchOracle:
    def test_exported_head_loads_and_matches_forward(self):
        """State dict from export_head_params load_state_dict's into a
        reference-layout torch head, and the torch forward reproduces our
        flax head's forward — migration works in the export direction."""
        from probpose_pytorch_tpu.models.head import ProbMapHead

        head = ProbMapHead(
            out_channels=3,
            pool_sizes=((2, 2), (2, 2)),
            deconv_out_channels=(8, 8),
            deconv_kernel_sizes=(4, 4),
            normalize=None,  # the torch oracle has no sparsemax
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)
        variables = head.init(
            jax.random.PRNGKey(1), jnp.asarray(feats), train=False
        )
        # randomize batch stats so the BN folding is actually exercised
        stats = jax.tree_util.tree_map(
            lambda v: np.asarray(v)
            + rng.normal(size=np.shape(v)).astype(np.float32) ** 2 * 0.1,
            variables["batch_stats"],
        )
        params = jax.tree_util.tree_map(np.asarray, variables["params"])

        sd = export_head_params(params, stats)
        torch.manual_seed(0)
        tm = _torch_head(in_ch=16, out_ch=3, deconv=(8, 8))
        missing, unexpected = tm.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=True,
        )
        assert not missing and not unexpected

        ours = head.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(feats),
            train=False,
        )
        with torch.no_grad():
            tfeats = torch.from_numpy(feats.transpose(0, 3, 1, 2))
            t_hm = tm.final_layer(tm.deconv_layers(tfeats)).clamp(0, 1)
            t_prob = tm.probability_layers(tfeats)
            t_vis = tm.visibility_layers(tfeats)
            t_oks = tm.oks_layers(tfeats)
            t_err = tm.error_layers(tfeats)
        np.testing.assert_allclose(
            np.asarray(ours[0]), t_hm.numpy(), rtol=1e-4, atol=1e-5
        )
        for o, t in zip(ours[1:], (t_prob, t_vis, t_oks, t_err)):
            np.testing.assert_allclose(
                np.asarray(o), t.numpy(), rtol=1e-4, atol=1e-5
            )


def test_export_cli_roundtrip(tmp_path):
    """checkpoint dir -> backbone.pth/head.pth -> import back == original."""
    from probpose_pytorch_tpu.compat.torch_export import main as export_main
    from probpose_pytorch_tpu.compat.torch_import import (
        state_dict_from_checkpoint,
    )
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    run = tmp_path / "run"
    run.mkdir()
    cfg = TrainConfig(model=_cfg(), out_dir=str(run))
    cfg.save(run / "config.json")
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(run / "checkpoints", keep=1)
    ckpt.save(0, trainer.state, force=True)
    ckpt.close()

    out = tmp_path / "export"
    export_main(["--checkpoint", str(run / "checkpoints"),
                 "--out", str(out)])

    bsd = state_dict_from_checkpoint(str(out / "backbone.pth"))
    rp = import_timm_vit_params(bsd, depth=1)
    orig = jax.tree_util.tree_map(
        np.asarray, jax.device_get(trainer.state.params)["backbone"]
    )
    _assert_trees_equal(rp, orig, "cli backbone")

    hsd = state_dict_from_checkpoint(str(out / "head.pth"))
    hp, hs = import_head_params(
        hsd, num_deconv=2, num_conv=0, num_pool_stages=2
    )
    _assert_trees_equal(
        hp,
        jax.tree_util.tree_map(
            np.asarray, jax.device_get(trainer.state.params)["head"]
        ),
        "cli head",
    )


def test_save_reference_checkpoint_torch_loadable(tmp_path):
    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_reference_checkpoint(sd, tmp_path / "x.pth")
    back = torch.load(tmp_path / "x.pth", weights_only=True)
    np.testing.assert_array_equal(back["a.weight"].numpy(), sd["a.weight"])
