#!/usr/bin/env python
"""Train-step batch sweep + step-level lever A/Bs on the real chip.

Round-3 verdict item #4: serving got two rounds of kernel work; the train
step sat at 52.6 ms/step (B=128). This script gives training the same
autotune treatment:

  * batch sweep 64..512 (chained-differencing through the donated state —
    the serving autotune's methodology applied to training);
  * paired A/Bs of the remaining *step-level* levers (every kernel-level
    lever was measured in rounds 2-3 and recorded in docs/PERF.md):
      - mlp_impl="fused" at the train step (serving-negative; the backward
        trade-offs differ, so measure rather than assume)
      - remat=True (scheduling side effect, normally a memory knob)

Usage:
    python scripts/train_sweep_r4.py [--quick] [--record]

--record writes docs/train_sweep_r4.json.
Run XLA-flag experiments by setting XLA_FLAGS before invoking (flags must
be set before backend init); the JSON records the active flags.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def build_step(B: int, mlp_impl: str = "dense", remat: bool = False):
    import jax.numpy as jnp

    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.loop import make_train_step

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(256, 192), num_keypoints=17, backbone="vit-s",
            compute_dtype="bfloat16",
            deconv_out_channels=(256, 256), deconv_kernel_sizes=(4, 4),
            pool_sizes=((4, 3), (2, 2), (2, 2)), normalize=1.0,
            attn_impl="fused", mlp_impl=mlp_impl, remat=remat,
        ),
        train_batch_size=B,
        out_dir="/tmp/train_sweep_r4",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1000)
    ds = SyntheticPoseDataset(B, cfg.model.img_size, 17)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, B, num_workers=2))).items()
    }
    step = make_train_step(
        trainer.model, trainer.encode_codec, trainer.loss_fn, trainer.tx, cfg
    )
    return trainer, step, batch


def time_step(trainer, step, batch, quick: bool = False) -> float:
    """ms/step by chained differencing through the param state."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def chained(state, batch, n):
        def body(_, s):
            s2, _ = step(s, batch)
            return s2

        final = jax.lax.fori_loop(0, n, body, state)
        return sum(
            jnp.sum(jnp.abs(l).astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(final.params)
        )

    long_n = 3 if quick else 4
    reps = 2 if quick else 3

    def timed(n):
        t0 = time.perf_counter()
        float(chained(trainer.state, batch, n))
        return time.perf_counter() - t0

    timed(1)
    timed(long_n)
    samples = [
        (timed(long_n) - timed(1)) / (long_n - 1) for _ in range(reps)
    ]
    return statistics.median(samples) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[64, 128, 192, 256, 384, 512])
    ap.add_argument("--skip-levers", action="store_true")
    args = ap.parse_args()

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    out: dict = {
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "sweep": [],
        "levers": {},
    }
    for B in args.batches:
        trainer, step, batch = build_step(B)
        ms = time_step(trainer, step, batch, quick=args.quick)
        row = {
            "batch": B,
            "ms_per_step": round(ms, 2),
            "crops_per_sec": round(B / ms * 1e3, 1),
        }
        out["sweep"].append(row)
        print(json.dumps(row), flush=True)
        del trainer, step, batch

    if not args.skip_levers:
        best = max(out["sweep"], key=lambda r: r["crops_per_sec"])
        B = best["batch"]
        for name, kw in [
            ("mlp_fused", dict(mlp_impl="fused")),
            ("remat", dict(remat=True)),
        ]:
            trainer, step, batch = build_step(B, **kw)
            ms = time_step(trainer, step, batch, quick=args.quick)
            out["levers"][name] = {
                "batch": B,
                "ms_per_step": round(ms, 2),
                "crops_per_sec": round(B / ms * 1e3, 1),
            }
            print(name, json.dumps(out["levers"][name]), flush=True)
            del trainer, step, batch

    if args.record:
        path = Path(__file__).parents[1] / "docs" / "train_sweep_r4.json"
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
