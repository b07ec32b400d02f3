"""Knowledge distillation: config plumbing, geometry guard, and the
student actually moving toward the teacher."""

import dataclasses
import json

import numpy as np
import pytest

import jax

from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer
from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
from probpose_pytorch_tpu.train.config import DistillConfig, LossWeights

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)
ViTConfig.PRESETS.setdefault(
    "vit-tiny-wide", dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0)
)


def _model_cfg(backbone="vit-tiny-e2e", **over):
    base = dict(
        img_size=(64, 48),
        num_keypoints=5,
        backbone=backbone,
        compute_dtype="float32",
        deconv_out_channels=(16, 16),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
    )
    base.update(over)
    return ModelConfig(**base)


def _save_teacher(tmp_path, backbone="vit-tiny-wide", train_steps=0,
                  **model_over):
    run = tmp_path / "teacher"
    run.mkdir(parents=True, exist_ok=True)
    cfg = TrainConfig(
        model=_model_cfg(backbone=backbone, **model_over),
        epochs=1,
        train_batch_size=4,
        out_dir=str(run),
    )
    cfg.save(run / "config.json")
    trainer = Trainer.create(cfg, steps_per_epoch=max(train_steps, 1))
    state = trainer.state
    if train_steps:
        # give the teacher distinctive outputs (an untrained head emits
        # near-uniform heatmaps that any student already matches)
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )

        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=7)
        batch = next(
            iter(batch_iterator(ds, 4, shuffle=False, num_workers=1))
        )
        for _ in range(train_steps):
            state, _ = trainer.train_step(state, batch)
        trainer.state = state
    ckpt = CheckpointManager(run / "checkpoints", keep=1)
    ckpt.save(int(state.step), state, force=True)
    ckpt.close()
    return run, trainer


def test_config_roundtrip():
    cfg = TrainConfig(
        distill=DistillConfig(
            teacher_checkpoint="/x/checkpoints", weight=0.5
        )
    )
    back = TrainConfig.from_json(cfg.to_json())
    assert back.distill.teacher_checkpoint == "/x/checkpoints"
    assert back.distill.weight == 0.5
    with pytest.raises(ValueError, match="unknown config key"):
        TrainConfig.from_dict(
            json.loads(cfg.to_json()) | {"distill": {"nope": 1}}
        )


def test_teacher_geometry_mismatch_raises(tmp_path):
    run, _ = _save_teacher(tmp_path, num_keypoints=7)
    cfg = TrainConfig(
        model=_model_cfg(),
        distill=DistillConfig(teacher_checkpoint=str(run / "checkpoints")),
        out_dir=str(tmp_path / "student"),
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        Trainer.create(cfg, steps_per_epoch=1)


def test_distill_on_mesh_matches_single_device(tmp_path):
    """Distillation under a data-parallel mesh: teacher variables replicate
    and the first-step loss equals the single-device run's."""
    import jax.numpy as jnp  # noqa: F401

    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
    from probpose_pytorch_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device test mesh")
    teacher_run, _ = _save_teacher(tmp_path, train_steps=5)
    cfg = TrainConfig(
        model=_model_cfg(),
        distill=DistillConfig(
            teacher_checkpoint=str(teacher_run / "checkpoints"),
            ema_teacher=False,
        ),
        epochs=1,
        train_batch_size=8,
        out_dir=str(tmp_path / "student"),
    )
    ds = SyntheticPoseDataset(8, cfg.model.img_size, 5, seed=0)
    batch = next(iter(batch_iterator(ds, 8, shuffle=False, num_workers=1)))

    single = Trainer.create(cfg, steps_per_epoch=2)
    _, m1 = single.train_step(single.state, batch)

    mesh = make_mesh(len(jax.devices()), 1)
    sharded = Trainer.create(cfg, steps_per_epoch=2, mesh=mesh)
    _, m2 = sharded.train_step(
        sharded.state, sharded._device_batch(batch)
    )
    np.testing.assert_allclose(
        float(m2["loss"]), float(m1["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2["loss/distill_heatmap"]),
        float(m1["loss/distill_heatmap"]),
        rtol=1e-4,
    )


def test_student_moves_toward_teacher(tmp_path):
    """With GT losses off and only the distill terms active, the student's
    heatmap/scalar MSE vs the (architecturally different) teacher must
    fall over a few steps, and the metrics must expose the terms."""
    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator

    teacher_run, teacher_trainer = _save_teacher(tmp_path, train_steps=30)
    cfg = TrainConfig(
        model=_model_cfg(),  # smaller student, different trunk
        loss_weights=LossWeights(
            kpt=0.0, probability=0.0, visibility=0.0, oks=0.0, error=0.0
        ),
        distill=DistillConfig(
            teacher_checkpoint=str(teacher_run / "checkpoints"),
            weight=1.0,
            heatmap_weight=1.0,
            scalar_weight=1.0,
            ema_teacher=False,
        ),
        epochs=1,
        train_batch_size=4,
        val_every=10_000,
        log_every=1,
        out_dir=str(tmp_path / "student"),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=40)
    ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=0)
    batch = next(iter(batch_iterator(ds, 4, shuffle=False, num_workers=1)))

    # the train step donates its input state: snapshot the init weights
    # to host before the first step deletes their buffers
    init_params = jax.device_get(trainer.state.params)
    init_stats = jax.device_get(trainer.state.batch_stats)
    state = trainer.state
    first = last = None
    for _ in range(40):
        state, metrics = trainer.train_step(state, batch)
        d = float(metrics["loss/distill_heatmap"]) + float(
            metrics["loss/distill_scalar"]
        )
        if first is None:
            first = d
        last = d
    assert "loss/distill_heatmap" in metrics
    assert last < first * 0.7, (first, last)

    # the student's probability branch really is closer to the teacher's
    # now (the heatmap branch magnitudes are ~1e-7 under sparsemax at this
    # scale — the in-loop metric above covers that term; the scalar branch
    # carries the externally measurable pull)
    import jax.numpy as jnp

    x = jnp.asarray(batch["image"], jnp.float32) / 255.0
    tvars = {
        "params": teacher_trainer.state.params,
        "batch_stats": teacher_trainer.state.batch_stats,
    }
    t_prob = np.asarray(
        teacher_trainer.model.apply(tvars, x, train=False)[1]
    )

    def student_mse(params, stats):
        prob = np.asarray(
            trainer.model.apply(
                {"params": params, "batch_stats": stats}, x, train=False
            )[1]
        )
        return float(((prob - t_prob) ** 2).mean())

    before = student_mse(init_params, init_stats)
    after = student_mse(
        jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    assert after < before * 0.8, (before, after)
