"""Reference-checkpoint conversion CLI.

Converts a PyTorch reference checkpoint (pickled ProbMapHead / full model /
state dict, as written by the reference's torch.save at train.py:171-180)
into an Orbax TrainState checkpoint loadable by this framework:

    python -m probpose_pytorch_tpu.compat.convert \
        --torch-checkpoint head_epoch_190.pth \
        --config configs/reference_parity_fieldsynth.json \
        --out runs/imported \
        [--head-only]

The head weights map via compat/torch_import.py (layouts verified against
torch numerically); backbone weights import when the checkpoint contains a
timm ViT (full-model save), otherwise our freshly initialized backbone is
kept (matching the reference's own head-only reload path, inference.py:62-67).
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="reference ckpt -> orbax")
    parser.add_argument("--torch-checkpoint", type=Path, required=True)
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--head-only", action="store_true",
                        help="checkpoint holds only the head module")
    args = parser.parse_args(argv)

    import jax

    from probpose_pytorch_tpu.compat.torch_import import (
        import_head_params,
        import_timm_vit_params,
        state_dict_from_checkpoint,
    )
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    cfg = TrainConfig.load(args.config) if args.config else TrainConfig()
    cfg = dataclasses.replace(cfg, out_dir=str(args.out), resume=False)
    trainer = Trainer.create(cfg, steps_per_epoch=1)

    sd = state_dict_from_checkpoint(str(args.torch_checkpoint))
    head_prefix = "" if args.head_only else "head."
    head_params, head_stats = import_head_params(
        sd,
        num_deconv=len(cfg.model.deconv_out_channels),
        num_conv=len(cfg.model.conv_out_channels),
        num_pool_stages=len(cfg.model.pool_sizes),
        prefix=head_prefix,
    )
    params = dict(trainer.state.params)
    batch_stats = dict(trainer.state.batch_stats)
    params["head"] = head_params
    batch_stats["head"] = head_stats

    if not args.head_only and any(
        k.startswith("backbone.model.") for k in sd
    ):
        params["backbone"] = import_timm_vit_params(
            sd, depth=12, prefix="backbone.model."
        )
        print("imported timm ViT backbone weights")
    else:
        print("kept freshly initialized backbone (head-only checkpoint)")

    state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda a: jax.numpy.asarray(a), params
        ),
        batch_stats=jax.tree_util.tree_map(
            lambda a: jax.numpy.asarray(a), batch_stats
        ),
    )
    args.out.mkdir(parents=True, exist_ok=True)
    cfg.save(args.out / "config.json")
    ckpt = CheckpointManager(args.out / "checkpoints", keep=1)
    ckpt.save(0, state, force=True)
    ckpt.close()
    print(f"wrote Orbax checkpoint to {args.out}/checkpoints (step 0)")


if __name__ == "__main__":
    main()
