"""Flagship-geometry convergence run on the real chip.

Trains ViT-S (fused Pallas attention, bf16) on a device-resident synthetic
pose set for N steps and reports the loss / PCK trajectory — the on-chip
stand-in for a real-data training demonstration while the environment ships
no dataset (BASELINE configs #4/#5; the tiny-model convergence proof lives
in tests/test_convergence.py, this one exercises the flagship geometry).

Batches are uploaded once and cycled on device: the tunneled link would
otherwise dominate wall time (18.9 MB/step at B=128) and this script
measures learning, not transfer.

Usage: python scripts/train_convergence_tpu.py [--steps 1000] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--pool", type=int, default=8, help="device batches")
    parser.add_argument("--log-every", type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(256, 192),
            num_keypoints=17,
            backbone="vit-s",
            compute_dtype="bfloat16",
            deconv_out_channels=(256, 256),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((4, 3), (2, 2), (2, 2)),
            normalize=1.0,
            attn_impl="fused",
        ),
        train_batch_size=args.batch,
        out_dir="/tmp/probpose_convergence",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=args.steps)
    ds = SyntheticPoseDataset(
        args.pool * args.batch, cfg.model.img_size, 17, seed=0
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_iterator(ds, args.batch, shuffle=False, num_workers=1)
    ]
    val = batches[0]  # seen data: tracks fit, which is what synthetic shows

    state = trainer.state
    history = []
    t0 = time.time()
    for step in range(args.steps):
        state, metrics = trainer.train_step(
            state, batches[step % len(batches)]
        )
        if step % args.log_every == 0 or step == args.steps - 1:
            ev = trainer.eval_step(state, val)
            row = {
                "step": step,
                "loss": round(float(metrics["loss"]), 4),
                "pck": round(float(ev["acc/kpt"]), 4),
                "prob_acc": round(float(ev["acc/probability"]), 4),
            }
            history.append(row)
            print(json.dumps(row), flush=True)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "summary": {
                    "steps": args.steps,
                    "batch": args.batch,
                    "wall_s": round(wall, 1),
                    "loss_first": history[0]["loss"],
                    "loss_last": history[-1]["loss"],
                    "pck_first": history[0]["pck"],
                    "pck_last": history[-1]["pck"],
                }
            }
        )
    )


if __name__ == "__main__":
    main()
