"""Train state and optimizer construction.

Superset of the reference's training machinery (AdamW + OneCycleLR + grad
clip, /root/reference/probpose/train.py:72-84,113) with additions the
reference lacks (SURVEY.md §2.4): parameter freezing as optax masks, optional
EMA, gradient accumulation, and a checkpointable opt/step state for resume.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
import optax
from flax import struct

from probpose_pytorch_tpu.train.config import OptimConfig

__all__ = ["TrainState", "make_optimizer", "create_train_state", "onecycle_schedule"]


def onecycle_schedule(cfg: OptimConfig, total_steps: int) -> optax.Schedule:
    """Cosine one-cycle, matching torch OneCycleLR(max_lr, pct_start,
    anneal_strategy='cos') semantics.

    total_steps is floored so the warmup interval never rounds to zero
    (optax's piecewise interpolation emits NaN on empty intervals).
    """
    min_total = int(np.ceil(1.0 / max(cfg.pct_start, 1e-3))) + 1
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, min_total),
        peak_value=cfg.peak_lr,
        pct_start=cfg.pct_start,
        div_factor=cfg.div_factor,
        final_div_factor=cfg.final_div_factor,
    )


def build_schedule(cfg: OptimConfig, total_steps: int) -> optax.Schedule:
    """Resolve `OptimConfig.schedule`:
    * "onecycle" — warmup + cosine anneal (the reference recipe, default)
    * "cosine"   — linear warmup over pct_start then cosine decay to
                   peak/final_div_factor
    * "constant" — flat peak_lr (the standard LoRA fine-tune choice)
    """
    if cfg.schedule == "onecycle":
        return onecycle_schedule(cfg, total_steps)
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.peak_lr)
    if cfg.schedule == "cosine":
        warmup = max(int(total_steps * cfg.pct_start), 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.peak_lr / cfg.div_factor,
            peak_value=cfg.peak_lr,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=cfg.peak_lr / cfg.final_div_factor,
        )
    raise ValueError(
        f"unknown optim.schedule {cfg.schedule!r} "
        "(expected onecycle | cosine | constant)"
    )


def make_optimizer(
    cfg: OptimConfig,
    total_steps: int,
    frozen_labels: Any | None = None,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> optimizer(scheduled) [-> zero updates on
    frozen params] [-> gradient accumulation].

    `OptimConfig.optimizer` picks the family: adamw (reference recipe),
    lion (single sign-momentum buffer — half AdamW's optimizer memory),
    or adafactor (factored second moment — the ViT-H-scale memory choice;
    its state is row/col vectors, so ZeRO-1 `shard_opt_state` on top is
    usually unnecessary).
    """
    schedule = build_schedule(cfg, total_steps)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay
        )
    elif cfg.optimizer == "lion":
        opt = optax.lion(
            schedule, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay
        )
    elif cfg.optimizer == "adafactor":
        # adafactor's update-clipping subsumes most of the global-norm
        # clip's job, but the outer clip is kept for config parity.
        opt = optax.adafactor(
            learning_rate=schedule,
            weight_decay_rate=cfg.weight_decay or None,
        )
    else:
        raise ValueError(
            f"unknown optim.optimizer {cfg.optimizer!r} "
            "(expected adamw | lion | adafactor)"
        )
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), opt)
    if frozen_labels is not None:
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, frozen_labels
        )
    if cfg.max_nonfinite_skips > 0:
        tx = optax.apply_if_finite(tx, cfg.max_nonfinite_skips)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


class TrainState(struct.PyTreeNode):
    """Checkpointable training state: step + params + BN stats + opt state
    (+ optional EMA params)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None

    def apply_gradients(self, grads: Any, tx: optax.GradientTransformation,
                        ema_decay: float | None = None) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if ema_decay is not None and self.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                self.ema_params,
                new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=self.batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    # jit the init: eager tracing compiles every Pallas kernel call in the
    # backbone individually (~80s for a fused-attn + fused-MLP ViT-S).
    variables = jax.jit(functools.partial(model.init, train=True))(
        rng, sample_input
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )
