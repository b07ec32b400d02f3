"""Trainer integration of the 1F1B pipeline schedule
(TrainConfig.pipeline_schedule='1f1b' -> train/loop.py:make_train_step_1f1b).

The contract under test: the FULL flagship step — patch-embed vjp chaining,
trunk blocks through parallel/pipeline.py:pipeline_1f1b, deconv head +
composite ProbPoseLoss as the last-stage loss_fn, optimizer/EMA update —
must equal an explicit microbatched sequential reference: the mean over
(data shard, microbatch) slices of loss(model.apply(slice)), with head
BatchNorm seeing per-slice batch statistics (the engine's documented
gradient-accumulation semantics) and running stats updated with the
slice-averaged estimate. Greenfield (the reference upstream is
single-device, SURVEY.md §2.3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from probpose_pytorch_tpu.data import SyntheticPoseDataset
from probpose_pytorch_tpu.data.pipeline import batch_iterator
from probpose_pytorch_tpu.models.model import ModelConfig, build_model
from probpose_pytorch_tpu.parallel import make_mesh, shard_batch, shard_params
from probpose_pytorch_tpu.train import TrainConfig, Trainer
from probpose_pytorch_tpu.train.loop import _encode_targets, _prepare_images


def _cfg(**overrides) -> TrainConfig:
    model_over = overrides.pop("model", {})
    overrides.setdefault("pipeline_schedule", "1f1b")
    return TrainConfig(
        model=ModelConfig(
            img_size=(64, 48),
            num_keypoints=5,
            backbone="vit-nano",
            compute_dtype="float32",
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
            pp_microbatches=2,
            **model_over,
        ),
        train_batch_size=8,
        pipeline_parallel=2,
        out_dir="/tmp/probpose_1f1b_trainer_test",
        **overrides,
    )


def _batch(cfg, n=8, seed=0):
    ds = SyntheticPoseDataset(n, cfg.model.img_size, cfg.model.num_keypoints,
                              seed=seed)
    return {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, n, num_workers=1))).items()
    }


def _microbatched_reference(trainer, params, batch_stats, batch, dp, M):
    """(loss, per-term losses, grads, new batch_stats) of the explicit
    per-(data shard, microbatch) mean — the semantics pipeline_1f1b
    implements. Runs the SAME stacked-layout model sequentially (mesh=None
    => pipeline_spmd's S==1 fallback)."""
    cfg = trainer.cfg
    model_ref = build_model(cfg.model)  # mesh=None: sequential stacked trunk
    weights = cfg.loss_weights.as_dict()
    images = _prepare_images(batch)
    gt = _encode_targets(trainer.encode_codec, batch)
    B = images.shape[0]
    local = B // dp
    mb = local // M
    slices = [
        slice(d * local + m * mb, d * local + (m + 1) * mb)
        for d in range(dp)
        for m in range(M)
    ]

    def total(p):
        loss = 0.0
        terms = None
        stats = []
        for sl in slices:
            pred, upd = model_ref.apply(
                {"params": p, "batch_stats": batch_stats},
                images[sl],
                train=True,
                mutable=["batch_stats"],
            )
            losses = trainer.loss_fn(
                {k: v[sl] for k, v in gt.items()},
                pred,
                learn_heatmaps_from_zeros=cfg.learn_heatmaps_from_zeros,
            )
            loss = loss + sum(losses[k] * w for k, w in weights.items())
            terms = (
                losses
                if terms is None
                else {k: terms[k] + losses[k] for k in terms}
            )
            stats.append(upd["batch_stats"])
        n = len(slices)
        new_bs = jax.tree_util.tree_map(
            lambda *xs: sum(xs) / n, *stats
        )
        return loss / n, ({k: v / n for k, v in terms.items()}, new_bs)

    (loss, (terms, new_bs)), grads = jax.value_and_grad(total, has_aux=True)(
        params
    )
    return loss, terms, grads, new_bs


def _assert_params_match(got_tree, want_tree, grads_ref, rtol=2e-4,
                         atol=1e-6):
    """Per-leaf param comparison that skips structurally-zero-gradient
    leaves: conv biases directly followed by train-mode BatchNorm (the mean
    subtraction cancels them) and the heatmap final bias (sparsemax is
    shift-invariant). Their 'gradients' are f32 roundoff (~1e-9), which
    AdamW's sign-like update amplifies to +-lr noise that legitimately
    differs between any two numerically-distinct-but-equal computations."""
    import jax.tree_util as jtu

    got = jtu.tree_flatten_with_path(got_tree)[0]
    want = jtu.tree_flatten_with_path(want_tree)[0]
    gref = jtu.tree_flatten_with_path(grads_ref)[0]
    for (path, g), (_, w), (_, gr) in zip(got, want, gref):
        if float(np.abs(np.asarray(gr)).max()) < 1e-7:
            continue  # zero-by-structure gradient: update is pure noise
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=jtu.keystr(path),
        )


class TestTrainer1F1B:
    def test_full_step_matches_microbatched_sequential(self):
        """dp=2 x pipe=2 mesh, M=2: loss, per-term metrics, updated params,
        EMA, and BN running stats all match the explicit reference."""
        cfg = _cfg()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, ema_decay=0.9)
        )
        mesh = make_mesh(4, model_parallel=1, pipeline_parallel=2)
        trainer = Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
        assert trainer.cfg.model.pp_stages == 2
        batch = _batch(cfg)

        params0 = jax.tree.map(np.asarray, trainer.state.params)
        bs0 = jax.tree.map(np.asarray, trainer.state.batch_stats)
        loss_ref, terms_ref, grads_ref, bs_ref = _microbatched_reference(
            trainer, params0, bs0, batch, dp=2, M=2
        )
        updates, _ = trainer.tx.update(
            grads_ref, trainer.state.opt_state, trainer.state.params
        )
        params_ref = optax.apply_updates(trainer.state.params, updates)
        ema_ref = jax.tree_util.tree_map(
            lambda e, p: e * 0.9 + p * 0.1, trainer.state.ema_params,
            params_ref,
        )

        new_state, metrics = trainer.train_step(
            trainer.state, shard_batch(batch, mesh)
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss_ref), rtol=1e-5
        )
        for k, v in terms_ref.items():
            np.testing.assert_allclose(
                float(metrics[f"loss/{k}"]), float(v), rtol=1e-4, atol=1e-7,
                err_msg=f"loss term {k}",
            )
        _assert_params_match(new_state.params, params_ref, grads_ref)
        for got, want in zip(
            jax.tree_util.tree_leaves(new_state.batch_stats),
            jax.tree_util.tree_leaves(bs_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
            )
        _assert_params_match(new_state.ema_params, ema_ref, grads_ref)
        assert int(new_state.step) == 1

    def test_tp_inside_1f1b_stage(self):
        """(data=2, model=2, pipe=2) mesh: tensor parallelism inside each
        1F1B stage (tp_enter/tp_leave boundary form) still matches the
        microbatched sequential reference."""
        cfg = _cfg(model=dict(attn_impl="fused_tp"))
        mesh = make_mesh(8, model_parallel=2, pipeline_parallel=2)
        trainer = Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
        batch = _batch(cfg)

        params0 = jax.tree.map(np.asarray, trainer.state.params)
        bs0 = jax.tree.map(np.asarray, trainer.state.batch_stats)
        loss_ref, _terms, grads_ref, _bs = _microbatched_reference(
            trainer, params0, bs0, batch, dp=2, M=2
        )
        updates, _ = trainer.tx.update(
            grads_ref, trainer.state.opt_state, trainer.state.params
        )
        params_ref = optax.apply_updates(trainer.state.params, updates)

        new_state, metrics = trainer.train_step(
            trainer.state, shard_batch(batch, mesh)
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss_ref), rtol=1e-5
        )
        # atol covers the model-axis psum's reduction-order noise, which
        # Adam's rsqrt amplifies on near-zero-gradient elements.
        _assert_params_match(
            new_state.params, params_ref, grads_ref, atol=5e-6
        )

    def test_augmented_step_runs(self):
        """The shared preamble (flip/jitter/color augmentation) composes
        with the 1F1B step: finite loss and a step counter bump."""
        from probpose_pytorch_tpu.ops.augment import AugmentConfig

        cfg = _cfg(augment=AugmentConfig())
        mesh = make_mesh(4, model_parallel=1, pipeline_parallel=2)
        trainer = Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
        batch = _batch(cfg)
        new_state, metrics = trainer.train_step(
            trainer.state, shard_batch(batch, mesh)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        assert int(new_state.step) == 1

    def test_distill_rejected(self):
        from probpose_pytorch_tpu.train.config import DistillConfig

        cfg = _cfg(distill=DistillConfig(teacher_checkpoint="/nonexistent"))
        mesh = make_mesh(4, model_parallel=1, pipeline_parallel=2)
        with pytest.raises(Exception):
            Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)

    def test_unknown_schedule_rejected(self):
        cfg = _cfg(pipeline_schedule="zigzag")
        mesh = make_mesh(4, model_parallel=1, pipeline_parallel=2)
        with pytest.raises(ValueError, match="pipeline_schedule"):
            Trainer.create(cfg, steps_per_epoch=4, mesh=mesh)
