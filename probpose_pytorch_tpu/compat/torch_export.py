"""Export flax params back to PyTorch reference-style state dicts.

Exact inverse of compat/torch_import.py: a checkpoint trained here converts
to (a) a timm-VisionTransformer state dict for the backbone (the layout the
reference's ScratchViTBackbone wraps, reference backbone.py:26-33) and (b) a
ProbMapHead state dict in the reference's Sequential-index naming
(reference head.py:255-474), so reference-ecosystem users can migrate in
BOTH directions without retraining. Round-trip exactness
(import(export(tree)) == tree) is tested on real model trees in
tests/test_torch_export.py.

Layout conversions (inverses of the import's):
  * flax Conv kernel (kh, kw, I, O) -> Conv2d weight (O, I, kh, kw)
  * flax ConvTranspose kernel (kh, kw, I, O) -> ConvTranspose2d weight
    (I, O, kh, kw) with spatial axes flipped back
  * flax Dense kernel (I, O) -> Linear weight (O, I)
  * params scale/bias + batch_stats mean/var -> BatchNorm2d
    weight/bias/running_mean/running_var (num_batches_tracked is emitted
    as 0 — torch tolerates any value there)

Values are numpy; `save_reference_checkpoint` wraps them in torch tensors
and torch.saves (gated on torch — the core framework never requires it).

    python -m probpose_pytorch_tpu.compat.torch_export \
        --checkpoint runs/flagship/checkpoints --out export_dir [--ema]

writes backbone.pth + head.pth state dicts.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Mapping

import numpy as np

__all__ = [
    "export_head_params",
    "export_timm_vit_params",
    "save_reference_checkpoint",
]


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _conv_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _deconv_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    # (kh, kw, I, O) -> (I, O, kh, kw), then un-flip the spatial axes
    w = _np(p["kernel"]).transpose(2, 3, 0, 1)
    sd[f"{prefix}.weight"] = np.ascontiguousarray(w[:, :, ::-1, ::-1])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _bn_out(
    sd: dict, prefix: str, p: Mapping[str, Any], stats: Mapping[str, Any]
) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _dense_out(sd: dict, prefix: str, p: Mapping[str, Any]) -> None:
    sd[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def export_head_params(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    prefix: str = "",
) -> dict[str, np.ndarray]:
    """models/head.py:ProbMapHead (params, batch_stats) -> reference
    ProbMapHead state dict. Stage counts are discovered from the tree
    (deconv{i}/conv{i}/branch conv{i} keys), so any configured geometry
    exports."""
    sd: dict[str, np.ndarray] = {}
    q = lambda s: f"{prefix}{s}"
    num_deconv = sum(1 for k in params if k.startswith("deconv") and
                     not k.startswith("deconv_bn"))
    for i in range(num_deconv):
        _deconv_out(sd, q(f"deconv_layers.{3 * i}"), params[f"deconv{i}"])
        _bn_out(sd, q(f"deconv_layers.{3 * i + 1}"),
                params[f"deconv_bn{i}"], batch_stats[f"deconv_bn{i}"])
    num_conv = sum(1 for k in params if k.startswith("conv") and
                   not k.startswith("conv_bn"))
    for i in range(num_conv):
        _conv_out(sd, q(f"conv_layers.{3 * i}"), params[f"conv{i}"])
        _bn_out(sd, q(f"conv_layers.{3 * i + 1}"),
                params[f"conv_bn{i}"], batch_stats[f"conv_bn{i}"])
    if "final" in params:
        _conv_out(sd, q("final_layer"), params["final"])
    branch_map = {
        "probability": "probability_layers",
        "visibility": "visibility_layers",
        "oks": "oks_layers",
        "error": "error_layers",
    }
    for ours, theirs in branch_map.items():
        bp, bs = params[ours], batch_stats[ours]
        num_pool = sum(1 for k in bp if k.startswith("conv"))
        for i in range(num_pool):
            _conv_out(sd, q(f"{theirs}.{4 * i}"), bp[f"conv{i}"])
            _bn_out(sd, q(f"{theirs}.{4 * i + 1}"), bp[f"bn{i}"],
                    bs[f"bn{i}"])
        _conv_out(sd, q(f"{theirs}.{4 * num_pool}"), bp["final"])
    return sd


def export_timm_vit_params(
    params: Mapping[str, Any], prefix: str = "model."
) -> dict[str, np.ndarray]:
    """ViTBackbone params -> timm VisionTransformer state dict
    (class_token=False / global_pool='', the reference's configuration).
    Depth is discovered from the block{i} keys. Plain trunks only: prefix
    tokens, adapters, and LoRA deltas have no timm counterpart — merge or
    strip them first (models/lora.py:merge_lora_params)."""
    def _unsupported(tree: Mapping[str, Any], path: str = "") -> list[str]:
        # LoRA deltas nest inside block{i}/attn etc. — scan the whole tree,
        # not just the top level, or they silently drop from the export.
        bad = []
        for k, v in tree.items():
            p = f"{path}/{k}" if path else k
            if (k in ("prefix_tokens",) or k.startswith("adapter")
                    or k.endswith("_lora")):
                bad.append(p)
            elif isinstance(v, Mapping):
                bad.extend(_unsupported(v, p))
        return bad

    unsupported = _unsupported(params)
    if unsupported:
        raise ValueError(
            f"no timm counterpart for {unsupported}; export plain ViT "
            "trunks (merge LoRA / drop adapters first)"
        )
    q = lambda s: f"{prefix}{s}"
    sd: dict[str, np.ndarray] = {}
    pe = params["patch_embed"]
    sd[q("patch_embed.proj.weight")] = _np(pe["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in pe:
        sd[q("patch_embed.proj.bias")] = _np(pe["bias"])
    sd[q("pos_embed")] = _np(params["pos_embed"])
    sd[q("norm.weight")] = _np(params["norm"]["scale"])
    sd[q("norm.bias")] = _np(params["norm"]["bias"])
    depth = sum(1 for k in params if k.startswith("block"))
    for i in range(depth):
        blk = params[f"block{i}"]
        b = q(f"blocks.{i}.")
        sd[b + "norm1.weight"] = _np(blk["norm1"]["scale"])
        sd[b + "norm1.bias"] = _np(blk["norm1"]["bias"])
        _dense_out(sd, b + "attn.qkv", blk["attn"]["qkv"])
        _dense_out(sd, b + "attn.proj", blk["attn"]["proj"])
        sd[b + "norm2.weight"] = _np(blk["norm2"]["scale"])
        sd[b + "norm2.bias"] = _np(blk["norm2"]["bias"])
        _dense_out(sd, b + "mlp.fc1", blk["mlp"]["fc1"])
        _dense_out(sd, b + "mlp.fc2", blk["mlp"]["fc2"])
    return sd


def save_reference_checkpoint(
    sd: Mapping[str, np.ndarray], path: str | Path
) -> None:
    """torch.save a {name: ndarray} state dict as torch tensors — loadable
    with torch.load(...)/load_state_dict on the reference's modules."""
    import torch

    # copy=True: arrays sourced from jax buffers are non-writable, which
    # torch tensors do not support.
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, str(path))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="export a checkpoint to torch state dicts"
    )
    parser.add_argument("--checkpoint", type=Path, required=True,
                        help="Orbax checkpoint directory")
    parser.add_argument("--config", type=Path, default=None,
                        help="TrainConfig JSON (default: beside checkpoint)")
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--ema", action="store_true", help="use EMA params")
    args = parser.parse_args(argv)

    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
    from probpose_pytorch_tpu.train.loop import restore_state_with_layout

    config_path = args.config or args.checkpoint.parent / "config.json"
    cfg = (
        TrainConfig.load(config_path)
        if Path(config_path).exists()
        else TrainConfig()
    )
    if cfg.model.lora_rank > 0:
        raise ValueError(
            "LoRA checkpoints export after merging: run "
            "python -m probpose_pytorch_tpu.compat.merge_lora first"
        )
    if cfg.model.head_type != "probmap":
        raise ValueError(
            f"torch export covers the reference's ProbMapHead layout only; "
            f"head_type={cfg.model.head_type!r} has no torch counterpart "
            "(the backbone still exports via export_backbone_params)"
        )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    # restore_state_with_layout lands params in THIS trainer's layout; for
    # export we need the torch/timm qkv-major order, so convert when the
    # config's attn_impl keeps head-major columns.
    state = restore_state_with_layout(
        CheckpointManager(args.checkpoint), trainer.state, cfg
    )
    params = (
        state.ema_params
        if (args.ema and state.ema_params is not None)
        else state.params
    )
    params = jax_to_host(params)
    if "patch_embed" not in params.get("backbone", {}):
        raise ValueError(
            f"backbone {cfg.model.backbone!r} is not a ViT trunk; only ViT "
            "backbones have a timm counterpart"
        )
    from probpose_pytorch_tpu.train.loop import qkv_layout_of, trunk_layout_of

    if trunk_layout_of(cfg.model) == "stacked":
        from probpose_pytorch_tpu.compat.layouts import unstack_vit_blocks

        params = dict(params)
        params["backbone"] = unstack_vit_blocks(params["backbone"])
    if qkv_layout_of(cfg.model) == "head_major":
        from probpose_pytorch_tpu.compat.layouts import qkv_to_qkv_major
        from probpose_pytorch_tpu.models.vit import ViTConfig

        heads = ViTConfig.PRESETS[cfg.model.backbone]["num_heads"]
        params = qkv_to_qkv_major(params, heads)
    stats = jax_to_host(state.batch_stats)

    args.out.mkdir(parents=True, exist_ok=True)
    save_reference_checkpoint(
        export_timm_vit_params(params["backbone"]),
        args.out / "backbone.pth",
    )
    save_reference_checkpoint(
        export_head_params(params["head"], stats.get("head", {})),
        args.out / "head.pth",
    )
    print(f"wrote {args.out}/backbone.pth, head.pth")


def jax_to_host(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda v: np.asarray(v), tree)


if __name__ == "__main__":
    main()
