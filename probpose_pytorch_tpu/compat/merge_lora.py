"""Fold LoRA deltas into a standard checkpoint (deployment conversion).

    python -m probpose_pytorch_tpu.compat.merge_lora \
        --checkpoint runs/lora/checkpoints --out runs/merged \
        [--config runs/lora/config.json]

Reads a LoRA fine-tuned run (config with model.lora_rank > 0), merges every
delta into the base kernels (models/lora.py:merge_lora_params — applied to
the live and EMA params alike), and writes a fresh Orbax checkpoint + config
with lora_rank=0. The merged run loads anywhere a standard checkpoint does
(predictor, eval CLI, serving-bundle export); optimizer state is
re-initialized (this is a deployment artifact, not a resume point).
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="fold LoRA into base kernels")
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--out", type=Path, required=True)
    args = parser.parse_args(argv)

    from probpose_pytorch_tpu.models.lora import merge_lora_params
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
    from probpose_pytorch_tpu.train.loop import (
        layout_metadata,
        restore_state_with_layout,
    )

    config_path = args.config or args.checkpoint.parent / "config.json"
    cfg = TrainConfig.load(config_path)
    if cfg.model.lora_rank <= 0:
        raise ValueError(f"{config_path} has model.lora_rank == 0 — nothing to merge")

    trainer = Trainer.create(cfg, steps_per_epoch=1)
    state = restore_state_with_layout(
        CheckpointManager(args.checkpoint), trainer.state, cfg
    )

    merged_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, lora_rank=0),
        train_lora_only=False,
        out_dir=str(args.out),
        resume=False,
    )
    target = Trainer.create(merged_cfg, steps_per_epoch=1)
    alpha = cfg.model.lora_alpha
    new_state = target.state.replace(
        step=state.step,
        params=merge_lora_params(state.params, alpha=alpha),
        batch_stats=state.batch_stats,
        ema_params=(
            merge_lora_params(state.ema_params, alpha=alpha)
            if state.ema_params is not None
            else None
        ),
    )
    args.out.mkdir(parents=True, exist_ok=True)
    merged_cfg.save(args.out / "config.json")
    ckpt = CheckpointManager(args.out / "checkpoints")
    ckpt.save(int(state.step), new_state, force=True,
              metadata=layout_metadata(merged_cfg))
    ckpt.close()
    print(f"merged LoRA (rank {cfg.model.lora_rank}, alpha {alpha}) -> {args.out}")


if __name__ == "__main__":
    main()
