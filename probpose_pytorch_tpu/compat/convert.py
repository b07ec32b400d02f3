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
    parser.add_argument("--torch-checkpoint", type=Path, default=None,
                        help="reference head/full-model save; omit for the "
                        "RADIO-only flow (frozen pretrained trunk + fresh "
                        "head, the reference's primary recipe)")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--head-only", action="store_true",
                        help="checkpoint holds only the head module")
    parser.add_argument("--radio-checkpoint", type=Path, default=None,
                        help="RADIO-style backbone state dict (class/register "
                        "tokens, pos-embed resampled to the pose grid); the "
                        "model config must set num_prefix_tokens/exact_gelu "
                        "and frozen_backbone to match")
    parser.add_argument("--radio-prefix", default="model.",
                        help="key prefix of the ViT inside the RADIO ckpt")
    parser.add_argument("--radio-src-grid", type=int, nargs=2, default=None,
                        help="checkpoint's native patch grid (gh gw); "
                        "default: square grid inferred from pos_embed")
    parser.add_argument("--radio-registers", type=int, default=0,
                        help="number of register tokens in the checkpoint")
    args = parser.parse_args(argv)

    import jax

    from probpose_pytorch_tpu.compat.torch_import import (
        import_head_params,
        import_radio_adapter_params,
        import_radio_vit_params,
        import_timm_vit_params,
        state_dict_from_checkpoint,
    )
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    if args.torch_checkpoint is None and args.radio_checkpoint is None:
        parser.error(
            "need --torch-checkpoint and/or --radio-checkpoint"
        )

    cfg = TrainConfig.load(args.config) if args.config else TrainConfig()
    cfg = dataclasses.replace(cfg, out_dir=str(args.out), resume=False)
    trainer = Trainer.create(cfg, steps_per_epoch=1)

    params = dict(trainer.state.params)
    batch_stats = dict(trainer.state.batch_stats)
    sd = {}
    if args.torch_checkpoint is not None:
        sd = state_dict_from_checkpoint(str(args.torch_checkpoint))
        head_prefix = "" if args.head_only else "head."
        head_params, head_stats = import_head_params(
            sd,
            num_deconv=len(cfg.model.deconv_out_channels),
            num_conv=len(cfg.model.conv_out_channels),
            num_pool_stages=len(cfg.model.pool_sizes),
            prefix=head_prefix,
        )
        params["head"] = head_params
        batch_stats["head"] = head_stats
    else:
        print("no head checkpoint: kept freshly initialized head "
              "(train it with the frozen trunk — reference train recipe)")

    if args.radio_checkpoint is not None:
        rsd = state_dict_from_checkpoint(str(args.radio_checkpoint))
        pos_key = f"{args.radio_prefix}pos_embed"
        n_prefix = cfg.model.num_prefix_tokens
        if args.radio_src_grid is not None:
            src_grid = tuple(args.radio_src_grid)
        else:
            n_patches = rsd[pos_key].shape[1] - n_prefix
            side = int(round(n_patches**0.5))
            src_grid = (side, side)
        gh = cfg.model.img_size[0] // cfg.model.patch_size
        gw = cfg.model.img_size[1] // cfg.model.patch_size
        from probpose_pytorch_tpu.models.vit import ViTConfig

        depth = ViTConfig.PRESETS[cfg.model.backbone]["depth"]
        backbone = import_radio_vit_params(
            rsd,
            depth=depth,
            src_grid=src_grid,
            dst_grid=(gh, gw),
            num_prefix_tokens=n_prefix - args.radio_registers,
            num_register_tokens=args.radio_registers,
            prefix=args.radio_prefix,
        )
        backbone.update(import_radio_adapter_params(rsd))
        params["backbone"] = backbone
        print(
            f"imported RADIO backbone ({src_grid} -> {(gh, gw)} pos grid, "
            f"{n_prefix} prefix tokens)"
        )
    elif not args.head_only and any(
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
    # The in-process cfg disables resume so Trainer.create above never
    # restores a stale dir mid-conversion — but the SAVED config must
    # resume, or a later `train.cli --config <out>/config.json` would
    # silently train from a fresh init instead of the imported step-0
    # checkpoint (the bug the RADIO-only CLI test pins).
    dataclasses.replace(cfg, resume=True).save(args.out / "config.json")
    ckpt = CheckpointManager(args.out / "checkpoints", keep=1)
    ckpt.save(0, state, force=True)
    ckpt.close()
    print(f"wrote Orbax checkpoint to {args.out}/checkpoints (step 0)")


if __name__ == "__main__":
    main()
