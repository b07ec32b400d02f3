"""Checkpoint averaging (SWA-style) for deployment.

Averaging the last few checkpoints of a run is a standard cheap accuracy
lever (Izmailov et al., UAI 2018): the averaged weights sit nearer the
center of the loss basin than any single iterate. The reference has no
checkpoint tooling at all (it pickles whole torch modules,
reference train.py:171-180); this composes with ours:

    python -m probpose_pytorch_tpu.train.average \
        --checkpoint runs/flagship/checkpoints --last 3 --out runs/avg
    # or: --steps 1000,1200,1400     (explicit step list)
    # or: --weights 0.2,0.3,0.5      (non-uniform; default uniform)

Writes a standard Orbax checkpoint + config: params, EMA params (when
present), and BN batch_stats are each averaged leaf-wise; the optimizer
state is freshly initialized (this is a deployment artifact, not a resume
point). Averaged BN statistics are an approximation — exact SWA recomputes
them with a pass over the data; for this model family the BN layers sit in
the head's small conv stacks and the approximation is standard practice.
The output loads anywhere a normal checkpoint does (predictor, eval CLI,
bundle export, torch export).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Sequence

import numpy as np

__all__ = ["average_trees", "main"]


def average_trees(trees: Sequence[Any], weights: Sequence[float] | None = None) -> Any:
    """Leaf-wise weighted average of identically-structured pytrees.

    Leaves average in float64 on host and cast back to the first tree's
    leaf dtype, so averaging many bf16/f32 checkpoints does not lose
    precision to accumulation order.
    """
    import jax

    if not trees:
        raise ValueError("no trees to average")
    if weights is None:
        weights = [1.0 / len(trees)] * len(trees)
    w = np.asarray(list(weights), np.float64)
    if len(w) != len(trees):
        raise ValueError(f"{len(w)} weights != {len(trees)} trees")
    if not np.isclose(w.sum(), 1.0):
        raise ValueError(f"weights sum to {w.sum()}, expected 1")

    def avg(*leaves):
        acc = sum(
            wi * np.asarray(leaf, np.float64)
            for wi, leaf in zip(w, leaves)
        )
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(avg, *trees)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="average checkpoints")
    parser.add_argument("--checkpoint", type=Path, required=True,
                        help="Orbax checkpoint directory of the run")
    parser.add_argument("--config", type=Path, default=None,
                        help="TrainConfig JSON (default: beside checkpoint)")
    parser.add_argument("--steps", type=str, default=None,
                        help="comma-separated step list (default: --last)")
    parser.add_argument("--last", type=int, default=3,
                        help="average the last N available steps")
    parser.add_argument("--weights", type=str, default=None,
                        help="comma-separated weights (default uniform)")
    parser.add_argument("--out", type=Path, required=True)
    args = parser.parse_args(argv)

    import dataclasses

    import jax

    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
    from probpose_pytorch_tpu.train.loop import (
        layout_metadata,
        restore_state_with_layout,
    )

    config_path = args.config or args.checkpoint.parent / "config.json"
    cfg = (
        TrainConfig.load(config_path)
        if Path(config_path).exists()
        else TrainConfig()
    )
    ckpt = CheckpointManager(args.checkpoint)
    available = sorted(ckpt._mgr.all_steps())
    if not available:
        raise FileNotFoundError(f"no checkpoints under {args.checkpoint}")
    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
        missing = [s for s in steps if s not in available]
        if missing:
            raise ValueError(
                f"steps {missing} not in checkpoint dir "
                f"(available: {available})"
            )
    else:
        steps = available[-args.last:]
    if len(steps) < 2:
        raise ValueError(
            f"need >= 2 checkpoints to average, have {steps} "
            f"(available: {available})"
        )
    weights = (
        [float(v) for v in args.weights.split(",")]
        if args.weights
        else None
    )

    trainer = Trainer.create(cfg, steps_per_epoch=1)
    states = [
        restore_state_with_layout(ckpt, trainer.state, cfg, step=s)
        for s in steps
    ]
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    params = average_trees([host(s.params) for s in states], weights)
    stats = average_trees([host(s.batch_stats) for s in states], weights)
    emas = [s.ema_params for s in states]
    ema = (
        average_trees([host(e) for e in emas], weights)
        if all(e is not None for e in emas)
        else None
    )

    out_cfg = dataclasses.replace(
        cfg, out_dir=str(args.out), resume=False
    )
    target = Trainer.create(out_cfg, steps_per_epoch=1)
    new_state = target.state.replace(
        step=int(max(steps)),
        params=params,
        batch_stats=stats,
        ema_params=ema,
    )
    args.out.mkdir(parents=True, exist_ok=True)
    out_cfg.save(args.out / "config.json")
    out_ckpt = CheckpointManager(args.out / "checkpoints")
    out_ckpt.save(int(max(steps)), new_state, force=True,
                  metadata=layout_metadata(out_cfg))
    out_ckpt.close()
    print(
        f"averaged steps {steps} "
        f"({'uniform' if weights is None else weights}) -> {args.out}"
    )


if __name__ == "__main__":
    main()
