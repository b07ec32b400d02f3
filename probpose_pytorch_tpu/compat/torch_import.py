"""Import PyTorch reference checkpoints into flax params.

The reference saves pickled torch modules (`torch.save(model)` /
`torch.save(head)`, /root/reference/probpose/train.py:171-180) and reloads
them with `torch.load(weights_only=False)` (inference.py:65,70). This module
converts such checkpoints (or plain state dicts) into our flax parameter
trees so a reference user can switch frameworks without retraining.

Layout conversions:
  * Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
  * ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, I, O); torch's transposed conv correlates with the *flipped*
    kernel relative to lax.conv_transpose, so spatial axes are flipped here
    (verified numerically in tests/test_torch_import.py).
  * Linear weight (O, I) -> flax Dense kernel (I, O)
  * BatchNorm2d weight/bias -> params scale/bias; running stats ->
    batch_stats mean/var.

Gated on torch (lazy import) — the core framework never requires it.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "state_dict_from_checkpoint",
    "import_head_params",
    "import_timm_vit_params",
    "interpolate_pos_embed",
    "import_radio_vit_params",
    "import_radio_adapter_params",
    "radio_input_stats",
]


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def state_dict_from_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a reference checkpoint (pickled module or state dict) into a flat
    {name: ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: _np(v) for k, v in sd.items()}


def _conv(sd, prefix) -> dict[str, np.ndarray]:
    out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _deconv(sd, prefix) -> dict[str, np.ndarray]:
    # (I, O, kh, kw) -> flip spatial -> (kh, kw, I, O)
    w = sd[f"{prefix}.weight"][:, :, ::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _bn(sd, prefix) -> tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _dense(sd, prefix) -> dict[str, np.ndarray]:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def import_head_params(
    sd: Mapping[str, np.ndarray],
    num_deconv: int = 2,
    num_conv: int = 0,
    num_pool_stages: int = 3,
    prefix: str = "",
) -> tuple[dict, dict]:
    """Convert a reference ProbMapHead state dict to (params, batch_stats)
    for models/head.py:ProbMapHead.

    The reference Sequential indices (head.py:433-474: [deconv, BN, ReLU] per
    stage; head.py:255-405: [conv, BN, pool, ReLU] per stage then a final
    1x1) map positionally.
    """
    p = lambda s: f"{prefix}{s}"
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i in range(num_deconv):
        params[f"deconv{i}"] = _deconv(sd, p(f"deconv_layers.{3 * i}"))
        bnp, bns = _bn(sd, p(f"deconv_layers.{3 * i + 1}"))
        params[f"deconv_bn{i}"] = bnp
        stats[f"deconv_bn{i}"] = bns
    for i in range(num_conv):
        params[f"conv{i}"] = _conv(sd, p(f"conv_layers.{3 * i}"))
        bnp, bns = _bn(sd, p(f"conv_layers.{3 * i + 1}"))
        params[f"conv_bn{i}"] = bnp
        stats[f"conv_bn{i}"] = bns
    if any(k.startswith(p("final_layer.")) for k in sd):
        params["final"] = _conv(sd, p("final_layer"))
    branch_map = {
        "probability": "probability_layers",
        "visibility": "visibility_layers",
        "oks": "oks_layers",
        "error": "error_layers",
    }
    for ours, theirs in branch_map.items():
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        for i in range(num_pool_stages):
            bp[f"conv{i}"] = _conv(sd, p(f"{theirs}.{4 * i}"))
            bnp, bns = _bn(sd, p(f"{theirs}.{4 * i + 1}"))
            bp[f"bn{i}"] = bnp
            bs[f"bn{i}"] = bns
        bp["final"] = _conv(sd, p(f"{theirs}.{4 * num_pool_stages}"))
        params[ours] = bp
        stats[ours] = bs
    return params, stats


def import_timm_vit_params(
    sd: Mapping[str, np.ndarray], depth: int = 12, prefix: str = "model."
) -> dict:
    """Convert a timm VisionTransformer state dict (the reference's
    ScratchViTBackbone wraps one, backbone.py:26-33) to ViTBackbone params.
    timm must use class_token=False / global_pool='' (as the reference does).
    """
    p = lambda s: f"{prefix}{s}"
    params: dict[str, Any] = {
        "patch_embed": {
            "kernel": sd[p("patch_embed.proj.weight")].transpose(2, 3, 1, 0),
            "bias": sd[p("patch_embed.proj.bias")],
        },
        "pos_embed": sd[p("pos_embed")],
        "norm": {
            "scale": sd[p("norm.weight")],
            "bias": sd[p("norm.bias")],
        },
    }
    for i in range(depth):
        params[f"block{i}"] = _block(sd, p(f"blocks.{i}."))
    return params


def _block(sd, b: str) -> dict:
    return {
        "norm1": {
            "scale": sd[b + "norm1.weight"],
            "bias": sd[b + "norm1.bias"],
        },
        "attn": {
            "qkv": _dense(sd, b + "attn.qkv"),
            "proj": _dense(sd, b + "attn.proj"),
        },
        "norm2": {
            "scale": sd[b + "norm2.weight"],
            "bias": sd[b + "norm2.bias"],
        },
        "mlp": {
            "fc1": _dense(sd, b + "mlp.fc1"),
            "fc2": _dense(sd, b + "mlp.fc2"),
        },
    }


def interpolate_pos_embed(
    pos: np.ndarray,
    src_grid: tuple[int, int],
    dst_grid: tuple[int, int],
) -> np.ndarray:
    """Bicubic-resample a (1, gh*gw, C) patch positional embedding from the
    checkpoint's native grid to the pose model's grid (e.g. RADIO's square
    pretraining resolution -> a 16x12 grid for 256x192 crops)."""
    if tuple(src_grid) == tuple(dst_grid):
        return pos
    import jax
    import jax.numpy as jnp

    sh, sw = src_grid
    dh, dw = dst_grid
    C = pos.shape[-1]
    grid = jnp.asarray(pos, jnp.float32).reshape(1, sh, sw, C)
    out = jax.image.resize(grid, (1, dh, dw, C), method="bicubic")
    return np.asarray(out).reshape(1, dh * dw, C)


def import_radio_vit_params(
    sd: Mapping[str, np.ndarray],
    depth: int,
    src_grid: tuple[int, int],
    dst_grid: tuple[int, int] | None = None,
    num_prefix_tokens: int = 1,
    num_register_tokens: int = 0,
    pos_embed_includes_prefix: bool = True,
    prefix: str = "",
) -> dict:
    """Convert a RADIO-style frozen ViT checkpoint (reference
    backbone.py:4-21 loads NVlabs/RADIO via torch.hub) to ViTBackbone params
    with `num_prefix_tokens = num_prefix_tokens + num_register_tokens`.

    Handles what a plain timm import cannot:
      * class/summary token (`cls_token`) and register tokens (`reg_token`)
        become our learned `prefix_tokens`; any positional-embedding rows the
        source adds to them are folded into the token values (both are
        additive learned constants, so the forward is unchanged);
      * patch positional embedding is bicubically resampled from the
        checkpoint grid (`src_grid`) to the pose grid (`dst_grid`);
      * the patch embedder may be a Conv2d (`patch_embed.proj.weight` of rank
        4) or RADIO's linear patchifier (rank 2, (C, 3*ph*pw)); the linear
        form is reshaped to the equivalent convolution.

    Use with ViTBackbone(frozen=True, exact_gelu=True, num_prefix_tokens=P,
    adapter_hidden=...) — the frozen+adapter contract of backbone.py:10-21.
    """
    p = lambda s: f"{prefix}{s}"
    n_prefix = num_prefix_tokens + num_register_tokens
    pe = sd[p("patch_embed.proj.weight")]
    if pe.ndim == 2:  # linear patchifier (C, 3*ph*pw): fold to conv kernel
        n_patch = int(round(np.sqrt(pe.shape[1] / 3)))
        pe = pe.reshape(pe.shape[0], 3, n_patch, n_patch)
    params: dict[str, Any] = {
        "patch_embed": {
            "kernel": pe.transpose(2, 3, 1, 0),
        },
        "norm": {
            "scale": sd[p("norm.weight")],
            "bias": sd[p("norm.bias")],
        },
    }
    if p("patch_embed.proj.bias") in sd:
        params["patch_embed"]["bias"] = sd[p("patch_embed.proj.bias")]

    pos = sd[p("pos_embed")]
    if pos_embed_includes_prefix and n_prefix:
        pos_prefix, pos = pos[:, :n_prefix], pos[:, n_prefix:]
    else:
        pos_prefix = 0.0
    params["pos_embed"] = interpolate_pos_embed(
        pos, src_grid, dst_grid or src_grid
    )

    if n_prefix:
        toks = []
        if num_prefix_tokens:
            cls = sd[p("cls_token")].reshape(1, -1, pos.shape[-1])
            toks.append(cls)
        if num_register_tokens:
            reg = sd[p("reg_token")].reshape(1, -1, pos.shape[-1])
            toks.append(reg)
        params["prefix_tokens"] = np.concatenate(toks, axis=1) + pos_prefix

    for i in range(depth):
        params[f"block{i}"] = _block(sd, p(f"blocks.{i}."))
    return params


def import_radio_adapter_params(
    sd: Mapping[str, np.ndarray], prefix: str = "mlp."
) -> dict:
    """Convert the reference RadioBackbone's trainable token-MLP adapter
    (backbone.py:15-21: an nn.Sequential of Linear/activation over (N, L, C))
    into ViTBackbone `adapter{j}` Dense params. Returns {} if absent."""
    linear_indices = sorted(
        int(k[len(prefix):].split(".")[0])
        for k in sd
        if k.startswith(prefix) and k.endswith(".weight")
    )
    return {
        f"adapter{j}": _dense(sd, f"{prefix}{i}")
        for j, i in enumerate(linear_indices)
    }


def radio_input_stats(
    sd: Mapping[str, np.ndarray], prefix: str = "input_conditioner."
) -> tuple[np.ndarray, np.ndarray] | None:
    """RADIO normalizes inputs with its own mean/std (the hub model's
    input_conditioner); return (mean, std) to apply in preprocessing, or
    None if the checkpoint has no conditioner."""
    mean_k, std_k = f"{prefix}norm_mean", f"{prefix}norm_std"
    if mean_k not in sd:
        return None
    return (
        np.asarray(sd[mean_k]).reshape(-1),
        np.asarray(sd[std_k]).reshape(-1),
    )
