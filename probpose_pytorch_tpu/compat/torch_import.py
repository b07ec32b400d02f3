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
        b = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {
                "scale": sd[p(b + "norm1.weight")],
                "bias": sd[p(b + "norm1.bias")],
            },
            "attn": {
                "qkv": _dense(sd, p(b + "attn.qkv")),
                "proj": _dense(sd, p(b + "attn.proj")),
            },
            "norm2": {
                "scale": sd[p(b + "norm2.weight")],
                "bias": sd[p(b + "norm2.bias")],
            },
            "mlp": {
                "fc1": _dense(sd, p(b + "mlp.fc1")),
                "fc2": _dense(sd, p(b + "mlp.fc2")),
            },
        }
    return params
