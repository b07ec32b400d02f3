"""Shipped configs trace end to end (shape-level, via jax.eval_shape — no
heavy compute) for the real flagship / reference-parity geometries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.train import TrainConfig, Trainer
from probpose_pytorch_tpu.train.loop import make_train_step


def test_all_shipped_configs_parse():
    """Every preset in configs/ loads under strict unknown-key rejection."""
    from pathlib import Path

    skipped = {"autotune_serving.json"}
    seen = 0
    for p in sorted(Path("configs").glob("*.json")):
        if p.name in skipped:
            continue
        cfg = TrainConfig.load(p)
        assert cfg.model.num_keypoints > 0, p
        seen += 1
    assert seen >= 6


@pytest.mark.parametrize(
    "path", ["configs/flagship_coco_vits.json",
             "configs/reference_parity_fieldsynth.json",
             "configs/vitb_coco.json",
             "configs/lora_finetune_vits.json"],
)
def test_config_train_step_traces(path):
    cfg = TrainConfig.load(path)
    trainer_cfg = cfg
    B = 2
    H, W = cfg.model.img_size
    K = cfg.model.num_keypoints

    # Build model + step without initializing real params (eval_shape only).
    from probpose_pytorch_tpu.losses import ProbPoseLoss
    from probpose_pytorch_tpu.models.model import build_model
    from probpose_pytorch_tpu.train.loop import build_codecs
    from probpose_pytorch_tpu.train.state import (
        TrainState,
        create_train_state,
        make_optimizer,
    )

    model = build_model(cfg.model)
    encode_codec, fast_codec = build_codecs(cfg)
    loss_fn = ProbPoseLoss(fast_codec, freeze_error=cfg.freeze_error,
                           freeze_oks=cfg.freeze_oks)
    tx = make_optimizer(cfg.optim, 1000)
    state = jax.eval_shape(
        lambda rng: create_train_state(
            model, rng, jnp.zeros((1, H, W, 3)), tx,
            ema=cfg.optim.ema_decay is not None,
        ),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(model, encode_codec, loss_fn, tx, cfg)
    batch = dict(
        image=jnp.zeros((B, H, W, 3), jnp.uint8),
        keypoints=jnp.zeros((B, K, 2), jnp.float32),
        keypoints_visible=jnp.ones((B, K), jnp.float32),
        keypoints_visibility=jnp.ones((B, K), jnp.float32),
    )
    new_state, metrics = jax.eval_shape(step, state, batch)
    assert metrics["loss"].shape == ()
    assert new_state.step.shape == ()
    Wh, Hh = cfg.model.heatmap_size
    # Sanity: the heatmap geometry is consistent with the codec operators.
    assert encode_codec.probmap.heatmap_size == (Wh, Hh)
