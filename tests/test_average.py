"""Checkpoint averaging: exact math and the deployment CLI round trip."""

import numpy as np
import pytest

import jax

from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.train.average import average_trees

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


class TestAverageTrees:
    def test_uniform_mean(self):
        a = {"x": np.full((2, 2), 1.0, np.float32), "y": np.float32(3.0)}
        b = {"x": np.full((2, 2), 3.0, np.float32), "y": np.float32(5.0)}
        out = average_trees([a, b])
        np.testing.assert_array_equal(out["x"], np.full((2, 2), 2.0))
        assert out["y"] == np.float32(4.0)
        assert out["x"].dtype == np.float32

    def test_weighted(self):
        a = {"x": np.float32(0.0)}
        b = {"x": np.float32(10.0)}
        out = average_trees([a, b], weights=[0.2, 0.8])
        np.testing.assert_allclose(out["x"], 8.0)

    def test_validations(self):
        with pytest.raises(ValueError, match="no trees"):
            average_trees([])
        with pytest.raises(ValueError, match="weights"):
            average_trees([{"x": 1.0}, {"x": 2.0}], weights=[1.0])
        with pytest.raises(ValueError, match="sum"):
            average_trees([{"x": 1.0}, {"x": 2.0}], weights=[0.9, 0.9])

    def test_bf16_precision(self):
        """Averaging in float64 then casting: 101 bf16 trees of value 1.0
        with one of 2.0 average to within one bf16 ulp of the true mean."""
        import jax.numpy as jnp

        trees = [{"x": np.asarray(jnp.full((4,), 1.0, jnp.bfloat16))}
                 for _ in range(100)]
        trees.append({"x": np.asarray(jnp.full((4,), 2.0, jnp.bfloat16))})
        out = average_trees(trees)
        true = (100 * 1.0 + 2.0) / 101
        np.testing.assert_allclose(
            np.asarray(out["x"], np.float32), true, rtol=1e-2
        )


def test_average_cli_roundtrip(tmp_path):
    """Two checkpoints with known params -> averaged checkpoint whose
    params are their exact mean, loadable by the standard restore path."""
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.average import main as avg_main
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
    from probpose_pytorch_tpu.train.loop import (
        layout_metadata,
        restore_state_with_layout,
    )

    run = tmp_path / "run"
    run.mkdir()
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=4, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(8, 8),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir=str(run),
    )
    cfg.save(run / "config.json")
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    s1 = trainer.state.replace(step=1)
    s2 = trainer.state.replace(
        step=2,
        params=jax.tree_util.tree_map(
            lambda v: np.asarray(v) + 1.0, jax.device_get(s1.params)
        ),
    )
    ckpt = CheckpointManager(run / "checkpoints", keep=5)
    ckpt.save(1, s1, force=True, metadata=layout_metadata(cfg))
    ckpt.save(2, s2, force=True, metadata=layout_metadata(cfg))
    ckpt.close()

    out = tmp_path / "avg"
    avg_main(["--checkpoint", str(run / "checkpoints"),
              "--steps", "1,2", "--out", str(out)])

    target = Trainer.create(
        TrainConfig.load(out / "config.json"), steps_per_epoch=1
    )
    merged = restore_state_with_layout(
        CheckpointManager(out / "checkpoints"),
        target.state,
        TrainConfig.load(out / "config.json"),
    )
    assert int(merged.step) == 2
    expect = jax.tree_util.tree_map(
        lambda v: np.asarray(v) + 0.5, jax.device_get(s1.params)
    )
    jax.tree_util.tree_map(
        lambda got, want: np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-6, atol=1e-6
        ),
        jax.device_get(merged.params), expect,
    )


def test_average_cli_needs_two(tmp_path):
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.average import main as avg_main
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    run = tmp_path / "run"
    run.mkdir()
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=4, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(8, 8),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir=str(run),
    )
    cfg.save(run / "config.json")
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(run / "checkpoints")
    ckpt.save(1, trainer.state, force=True)
    ckpt.close()
    with pytest.raises(ValueError, match=">= 2"):
        avg_main(["--checkpoint", str(run / "checkpoints"),
                  "--out", str(tmp_path / "x")])
