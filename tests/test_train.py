"""End-to-end training tests on synthetic data (tiny model, CPU).

Covers the reference train loop's surface (train.py) plus what it lacks:
checkpoint resume, config round-trip, optimizer schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer
from probpose_pytorch_tpu.train.config import OptimConfig
from probpose_pytorch_tpu.train.state import onecycle_schedule


def _tiny_cfg(tmp_path, **overrides) -> TrainConfig:
    model = ModelConfig(
        img_size=(64, 48),
        num_keypoints=5,
        backbone="vit-s",
        compute_dtype="float32",
        deconv_out_channels=(32, 32),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
    )
    # shrink the ViT via a preset override by monkeypatching the registry
    from probpose_pytorch_tpu.models.vit import ViTConfig

    ViTConfig.PRESETS["vit-tiny-test"] = dict(
        embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0
    )
    model = ModelConfig(**{**model.__dict__, "backbone": "vit-tiny-test"})
    base = dict(
        model=model,
        epochs=1,
        train_batch_size=4,
        val_batch_size=4,
        val_every=100,
        log_every=1,
        out_dir=str(tmp_path / "run"),
        seed=0,
    )
    base.update(overrides)
    return TrainConfig(**base)


def _data(cfg, n=8):
    ds = SyntheticPoseDataset(
        n, cfg.model.img_size, cfg.model.num_keypoints, seed=1
    )
    return lambda: batch_iterator(
        ds, cfg.train_batch_size, shuffle=False, num_workers=1
    )


class TestTrainer:
    def test_two_steps_update_params_and_metrics_finite(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        batches = list(_data(cfg)())
        p0 = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
        state, metrics = trainer.train_step(trainer.state, batches[0])
        state, metrics = trainer.train_step(state, batches[1])
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 2
        p1 = jax.tree_util.tree_leaves(state.params)[0]
        assert float(jnp.abs(p1 - p0).max()) > 0

    def test_loss_decreases_on_repeated_batch(self, tmp_path):
        cfg = _tiny_cfg(tmp_path, epochs=1)
        trainer = Trainer.create(cfg, steps_per_epoch=30)
        batch = next(iter(_data(cfg, n=4)()))
        state = trainer.state
        losses = []
        for _ in range(25):
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_eval_step_reports_accuracies(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        batch = next(iter(_data(cfg)()))
        metrics = trainer.eval_step(trainer.state, batch)
        for key in ("acc/kpt", "acc/probability", "max_heatmap", "mean_prob"):
            assert np.isfinite(float(metrics[key])), key

    def test_fit_checkpoints_and_resumes(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        trainer.fit(_data(cfg), max_steps=2)
        step_after = int(trainer.state.step)
        assert step_after == 2

        # Fresh trainer resumes from the saved checkpoint.
        trainer2 = Trainer.create(cfg, steps_per_epoch=2)
        trainer2.fit(_data(cfg), max_steps=1)
        assert int(trainer2.state.step) == 3

    def test_track_best_checkpoint(self, tmp_path):
        """track_best_metric saves improving validation passes to
        checkpoints_best with the value in the sidecar metadata, restores
        cleanly, and persists the best across resume."""
        import json

        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
        from probpose_pytorch_tpu.train.loop import (
            restore_state_with_layout,
        )

        cfg = _tiny_cfg(
            tmp_path, val_every=2, epochs=3, track_best_metric="loss"
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        trainer.fit(_data(cfg), val_batches=_data(cfg), max_steps=6)

        best_dir = tmp_path / "run" / "checkpoints_best"
        assert best_dir.exists()
        best = CheckpointManager(best_dir)
        meta = best.read_metadata()
        assert meta["best_metric"] == "loss"
        vals = [
            json.loads(l)["validation/loss"]
            for l in (tmp_path / "run" / "metrics.jsonl")
            .read_text()
            .splitlines()
            if "validation/loss" in l
        ]
        assert vals, "no validation passes ran"
        assert meta["best_value"] == pytest.approx(min(vals), rel=1e-6)
        # restores onto a fresh trainer
        fresh = Trainer.create(cfg, steps_per_epoch=2)
        restored = restore_state_with_layout(best, fresh.state, cfg)
        assert int(restored.step) >= 0
        # resume keeps the prior best: a worse validation must not overwrite
        trainer2 = Trainer.create(cfg, steps_per_epoch=2)
        trainer2.fit(_data(cfg), val_batches=_data(cfg), max_steps=2)
        meta2 = CheckpointManager(best_dir).read_metadata()
        assert meta2["best_value"] <= meta["best_value"] + 1e-9

    def test_track_best_unknown_metric_raises(self, tmp_path):
        cfg = _tiny_cfg(
            tmp_path, val_every=1, track_best_metric="acc/nonexistent"
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        with pytest.raises(ValueError, match="track_best_metric"):
            trainer.fit(_data(cfg), val_batches=_data(cfg), max_steps=1)

    def test_device_prefetch_matches_synchronous(self, tmp_path):
        """Threaded upload prefetch must not change training numerics or
        batch order: identical final params vs the synchronous path."""
        final = {}
        for depth in (0, 2):
            out = tmp_path / f"pf{depth}"
            cfg = _tiny_cfg(out, device_prefetch=depth, resume=False)
            trainer = Trainer.create(cfg, steps_per_epoch=2)
            trainer.fit(_data(cfg), max_steps=2)
            final[depth] = jax.tree_util.tree_leaves(trainer.state.params)
        for a, b in zip(final[0], final[2]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_checkpoint_roundtrip(self, tmp_path):
        """async_checkpoint=True: fit returns with the write committed
        (fit waits before close), a fresh trainer resumes from it, and a
        direct async save followed by restore yields identical leaves
        (restore waits for the in-flight write)."""
        import dataclasses

        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        cfg = dataclasses.replace(_tiny_cfg(tmp_path), async_checkpoint=True)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        trainer.fit(_data(cfg), max_steps=2)
        assert int(trainer.state.step) == 2
        trainer2 = Trainer.create(cfg, steps_per_epoch=2)
        trainer2.fit(_data(cfg), max_steps=1)
        assert int(trainer2.state.step) == 3

        ckpt = CheckpointManager(tmp_path / "async_ck", async_save=True)
        ckpt.save(7, trainer2.state)
        restored = ckpt.restore(trainer2.state)  # waits for the write
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored.params,
            trainer2.state.params,
        )
        ckpt.close()

    def test_save_overwrites_existing_step(self, tmp_path):
        """Saving at a step that already holds a checkpoint (a fresh run
        into a reused out-dir) OVERWRITES it — Orbax's bare default
        silently skips the save, leaving the previous run's stale params
        to be restored later."""
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        old_params = jax.tree_util.tree_map(  # snapshot: fit donates
            lambda a: np.asarray(a).copy(), trainer.state.params
        )
        ckpt = CheckpointManager(tmp_path / "reused_ck")
        ckpt.save(5, trainer.state)
        ckpt.close()

        trainer.fit(_data(cfg), max_steps=2)  # params now differ
        ckpt2 = CheckpointManager(tmp_path / "reused_ck")
        ckpt2.save(5, trainer.state)  # same step, new run
        restored = ckpt2.restore(trainer.state)
        ckpt2.close()
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored.params,
            trainer.state.params,
        )
        leaves_new = jax.tree_util.tree_leaves(restored.params)
        leaves_old = jax.tree_util.tree_leaves(old_params)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_new, leaves_old)
        )

    def test_nonfinite_loss_recovers_from_checkpoint(self, tmp_path, capsys):
        """Failure containment (train/loop.py fit): NaN-poisoned batches
        corrupt the params (no optax guard: max_nonfinite_skips=0); two
        consecutive non-finite losses at log points must restore the last
        checkpoint and training must finish with finite params."""
        cfg = _tiny_cfg(
            tmp_path, epochs=3, checkpoint_every_epochs=1, max_recoveries=3
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)

        good = list(_data(cfg)())[:2]
        poisoned = [
            {**b, "keypoints": np.full_like(b["keypoints"], np.nan)}
            for b in good
        ]
        epoch_plans = iter([good, poisoned, good])

        def batches():
            return next(epoch_plans)

        state = trainer.fit(batches)
        out = capsys.readouterr().out
        assert "restored checkpoint step 2" in out
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree_util.tree_leaves(state.params)
        )
        # epoch-2 progress was rolled back: final step = ckpt step + epoch 3
        assert int(state.step) == 4

    def test_nonfinite_loss_aborts_after_max_recoveries(self, tmp_path):
        cfg = _tiny_cfg(
            tmp_path, epochs=4, checkpoint_every_epochs=1, max_recoveries=1
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        good = list(_data(cfg)())[:2]
        poisoned = [
            {**b, "keypoints": np.full_like(b["keypoints"], np.nan)}
            for b in good
        ]
        plans = iter([good, poisoned, poisoned, poisoned])

        def batches():
            return next(plans)

        with pytest.raises(RuntimeError, match="non-finite"):
            trainer.fit(batches)

    def test_metrics_jsonl_written(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        trainer.fit(_data(cfg), max_steps=2)
        text = (tmp_path / "run" / "metrics.jsonl").read_text()
        assert "training/loss" in text


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = _tiny_cfg(tmp_path, epochs=7)
        path = tmp_path / "cfg.json"
        cfg.save(path)
        cfg2 = TrainConfig.load(path)
        assert cfg2 == cfg

    def test_onecycle_schedule_shape(self):
        sched = onecycle_schedule(OptimConfig(peak_lr=1e-3), total_steps=100)
        lr0 = float(sched(0))
        lr_peak = float(sched(10))
        lr_end = float(sched(99))
        assert lr0 == pytest.approx(1e-3 / 25, rel=1e-3)
        assert lr_peak == pytest.approx(1e-3, rel=1e-3)
        assert lr_end < 1e-5


class TestOptimFeatures:
    def test_ema_params_track(self, tmp_path):
        from probpose_pytorch_tpu.train.config import OptimConfig
        import dataclasses

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses.replace(cfg, optim=OptimConfig(ema_decay=0.5))
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        assert trainer.state.ema_params is not None
        batch = next(iter(_data(cfg)()))
        state, _ = trainer.train_step(trainer.state, batch)
        # EMA moved toward the new params but is not equal to them.
        p = jax.tree_util.tree_leaves(state.params)[0]
        e = jax.tree_util.tree_leaves(state.ema_params)[0]
        assert float(jnp.abs(p - e).max()) > 0

    def test_gradient_accumulation(self, tmp_path):
        from probpose_pytorch_tpu.train.config import OptimConfig
        import dataclasses

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses.replace(cfg, optim=OptimConfig(accum_steps=2))
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        batch = next(iter(_data(cfg)()))
        p0 = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
        s1, _ = trainer.train_step(trainer.state, batch)
        p1 = jax.tree_util.tree_leaves(s1.params)[0]
        # First micro-step accumulates only: params unchanged.
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        s2, _ = trainer.train_step(s1, batch)
        p2 = jax.tree_util.tree_leaves(s2.params)[0]
        assert float(jnp.abs(p2 - p0).max()) > 0  # second applies the update


class TestFrameMode:
    def test_frame_mode_step_matches_crop_mode_semantics(self, tmp_path):
        """Frame-mode (on-device crop inside the step) trains and, with an
        identity box, matches crop-mode losses."""
        import dataclasses

        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        batch = next(iter(_data(cfg)()))
        H, W = cfg.model.img_size

        frame_batch = dict(
            frame=jnp.asarray(batch["image"]),
            box=jnp.tile(jnp.asarray([[0.0, 0.0, W, H]]), (4, 1)),
            keypoints=jnp.asarray(batch["keypoints"]),
            keypoints_visible=jnp.asarray(batch["keypoints_visible"]),
            keypoints_visibility=jnp.asarray(batch["keypoints_visibility"]),
        )
        s1, m1 = trainer.train_step(trainer.state, frame_batch)
        assert np.isfinite(float(m1["loss"]))

        trainer2 = Trainer.create(cfg, steps_per_epoch=4)
        s2, m2 = trainer2.train_step(trainer2.state, batch)
        # identity box -> crop == image (bilinear over exact grid): same loss
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=5e-3
        )

    def test_frame_mode_with_box_jitter(self, tmp_path):
        import dataclasses

        from probpose_pytorch_tpu.ops.augment import AugmentConfig

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, augment=AugmentConfig(flip_prob=0.0, scale_jitter=0.2,
                                       shift_jitter=0.1, brightness=0,
                                       contrast=0)
        )
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        batch = next(iter(_data(cfg)()))
        H, W = cfg.model.img_size
        frame_batch = dict(
            frame=jnp.asarray(batch["image"]),
            box=jnp.tile(jnp.asarray([[0.0, 0.0, W, H]]), (4, 1)),
            keypoints=jnp.asarray(batch["keypoints"]),
            keypoints_visible=jnp.asarray(batch["keypoints_visible"]),
            keypoints_visibility=jnp.asarray(batch["keypoints_visibility"]),
        )
        s, m = trainer.train_step(trainer.state, frame_batch)
        assert np.isfinite(float(m["loss"]))

    def test_checkpoint_roundtrip_with_ema(self, tmp_path):
        import dataclasses

        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        cfg = _tiny_cfg(tmp_path)
        cfg = dataclasses.replace(cfg, optim=OptimConfig(ema_decay=0.9))
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        batch = next(iter(_data(cfg)()))
        state, _ = trainer.train_step(trainer.state, batch)

        ckpt = CheckpointManager(tmp_path / "ck", keep=1)
        ckpt.save(1, state, force=True)

        trainer2 = Trainer.create(cfg, steps_per_epoch=4)
        restored = ckpt.restore(trainer2.state)
        ckpt.close()
        assert int(restored.step) == 1
        e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
        e1 = jax.tree_util.tree_leaves(restored.ema_params)[0]
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


class TestSchedules:
    def test_build_schedule_shapes(self):
        from probpose_pytorch_tpu.train.state import build_schedule

        cfg = OptimConfig(peak_lr=1e-3, pct_start=0.1)
        one = build_schedule(cfg, 100)
        assert one(0) < one(10)  # warms up
        assert one(99) < one(10)  # anneals

        const = build_schedule(
            OptimConfig(peak_lr=1e-3, schedule="constant"), 100
        )
        assert float(const(0)) == float(const(99)) == pytest.approx(1e-3)

        cos = build_schedule(
            OptimConfig(peak_lr=1e-3, schedule="cosine"), 100
        )
        assert float(cos(10)) == pytest.approx(1e-3, rel=1e-3)  # peak at warmup end
        assert cos(0) < cos(10) and cos(99) < cos(10)

        with pytest.raises(ValueError, match="schedule"):
            build_schedule(OptimConfig(schedule="nope"), 100)

    def test_constant_schedule_trains(self, tmp_path):
        cfg = _tiny_cfg(tmp_path, optim=OptimConfig(
            peak_lr=1e-3, schedule="constant", ema_decay=None
        ))
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds_batches = _data(cfg)
        state = trainer.state
        for b in ds_batches():
            state, m = trainer.train_step(state, b)
        assert np.isfinite(float(m["loss"]))


class TestOptimizerFamilies:
    def _toy(self):
        params = {"w": jnp.ones((64, 32)), "b": jnp.zeros((32,))}
        grads = {"w": jnp.full((64, 32), 0.1), "b": jnp.full((32,), 0.1)}
        return params, grads

    def _step(self, name):
        from probpose_pytorch_tpu.train.state import make_optimizer

        params, grads = self._toy()
        tx = make_optimizer(OptimConfig(optimizer=name), total_steps=10)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).max()) > 0
        return state

    def test_adamw_updates(self):
        self._step("adamw")

    def test_lion_single_moment(self):
        """Lion keeps one moment buffer per param (AdamW keeps two)."""
        state = self._step("lion")
        param_elems = 64 * 32 + 32
        adam_elems = sum(
            l.size for l in jax.tree_util.tree_leaves(self._step("adamw"))
        )
        lion_elems = sum(
            l.size for l in jax.tree_util.tree_leaves(state)
        )
        assert lion_elems <= adam_elems - param_elems

    def test_adafactor_factored_state(self):
        """Adafactor's second moment is row/col vectors, not a full
        tensor, once dims reach the factoring threshold (128, i.e. every
        transformer matmul)."""
        from probpose_pytorch_tpu.train.state import make_optimizer

        params = {"w": jnp.ones((256, 160))}
        tx = make_optimizer(OptimConfig(optimizer="adafactor"), 10)
        state = tx.init(params)
        sizes = [l.size for l in jax.tree_util.tree_leaves(state)]
        assert max(sizes) <= 256  # row/col stats only, no (256,160) moment
        grads = {"w": jnp.full((256, 160), 0.1)}
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).max()) > 0

    def test_unknown_optimizer_rejected(self):
        from probpose_pytorch_tpu.train.state import make_optimizer

        with pytest.raises(ValueError, match="optimizer"):
            make_optimizer(OptimConfig(optimizer="sgdx"), 10)

    @pytest.mark.parametrize("name", ["lion", "adafactor"])
    def test_trains_end_to_end(self, tmp_path, name):
        cfg = _tiny_cfg(tmp_path, optim=OptimConfig(
            peak_lr=1e-4, optimizer=name, ema_decay=None
        ))
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        state = trainer.state
        for b in _data(cfg)():
            state, m = trainer.train_step(state, b)
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) > 0


class TestCheckpointHygiene:
    def test_state_is_finite(self, tmp_path):
        from probpose_pytorch_tpu.train.loop import state_is_finite

        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        assert state_is_finite(trainer.state)
        poisoned = trainer.state.replace(
            params=jax.tree_util.tree_map(
                lambda x: x * jnp.nan, trainer.state.params
            )
        )
        assert not state_is_finite(poisoned)
        bad_bn = trainer.state.replace(
            batch_stats=jax.tree_util.tree_map(
                lambda x: x * jnp.inf, trainer.state.batch_stats
            )
        )
        assert not state_is_finite(bad_bn)

    def test_fit_refuses_to_save_poisoned_state(self, tmp_path, capsys):
        """A state with non-finite leaves must never reach disk: the
        keep-N rotation would evict the clean checkpoints and the
        non-finite-loss recovery would then restore garbage (observed
        failure mode: optax.apply_if_finite propagates NaN after
        max_nonfinite_skips consecutive bad steps)."""
        import dataclasses

        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        data = _data(cfg)
        trainer.fit(data, max_steps=1)  # writes a clean checkpoint
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        clean_step = CheckpointManager(
            f"{cfg.out_dir}/checkpoints"
        ).latest_step()
        assert clean_step is not None

        orig_step = trainer.train_step

        def poisoning_step(state, batch):
            s, m = orig_step(state, batch)
            return s.replace(
                params=jax.tree_util.tree_map(
                    lambda x: x * jnp.nan, s.params
                )
            ), m

        poisoned_trainer = dataclasses.replace(
            trainer, train_step=poisoning_step
        )
        poisoned_trainer.fit(data, max_steps=1)
        out = capsys.readouterr().out
        assert "NOT saving final checkpoint" in out
        # the clean checkpoint is still the latest on disk
        assert CheckpointManager(
            f"{cfg.out_dir}/checkpoints"
        ).latest_step() == clean_step


class TestEvalFrameMode:
    def test_eval_step_accepts_frame_batches(self, tmp_path):
        """Validation must accept the same frame-mode layout the train step
        does (it used to KeyError on 'image' mid-run)."""
        cfg = _tiny_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=4)
        batch = next(iter(_data(cfg)()))
        H, W = cfg.model.img_size
        frame_batch = dict(
            frame=jnp.asarray(batch["image"]),
            box=jnp.tile(jnp.asarray([[0.0, 0.0, W, H]]), (4, 1)),
            keypoints=jnp.asarray(batch["keypoints"]),
            keypoints_visible=jnp.asarray(batch["keypoints_visible"]),
            keypoints_visibility=jnp.asarray(batch["keypoints_visibility"]),
        )
        m_frame = trainer.eval_step(trainer.state, frame_batch)
        m_crop = trainer.eval_step(trainer.state, batch)
        # identity box -> same crops -> same eval loss
        np.testing.assert_allclose(
            float(m_frame["loss"]), float(m_crop["loss"]), rtol=5e-3
        )


def test_recovery_checkpoint_labels_match_state_step(tmp_path, capsys):
    """After a non-finite recovery rewinds the state, checkpoint labels must
    keep matching state.step — a loop-counter label running ahead would make
    resume restore a stale higher-labeled checkpoint."""
    cfg = _tiny_cfg(
        tmp_path, epochs=3, checkpoint_every_epochs=1, max_recoveries=3
    )
    trainer = Trainer.create(cfg, steps_per_epoch=2)
    good = list(_data(cfg)())[:2]
    poisoned = [
        {**b, "keypoints": np.full_like(b["keypoints"], np.nan)}
        for b in good
    ]
    plans = iter([good, poisoned, good])
    state = trainer.fit(lambda: next(plans))
    assert "restored checkpoint" in capsys.readouterr().out

    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(f"{cfg.out_dir}/checkpoints", keep=5)
    assert ckpt.latest_step() == int(state.step)
