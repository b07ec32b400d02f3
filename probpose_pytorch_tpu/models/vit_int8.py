"""int8 serving forward for the ViT backbone.

Pure-function mirror of models/vit.py:ViTBackbone.__call__ with every Dense
matmul (qkv / proj / fc1 / fc2) running int8 x int8 -> int32 on the MXU;
LayerNorms, softmax, patch embedding, and residuals stay in f32/bf16.
Converted once from trained flax params by `quantize_vit_params` — a
post-training dynamic-quantization serving engine (the training graph is
untouched).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.ops.quant import (
    int8_matmul,
    quantize_weight,
    weight_only_matmul,
)

__all__ = ["quantize_vit_params", "vit_forward_int8"]

_QUANT_LAYERS = ("attn/qkv", "attn/proj", "mlp/fc1", "mlp/fc2")


def quantize_vit_params(params: dict, depth: int) -> dict:
    """flax ViTBackbone params -> quantized serving params."""
    out: dict[str, Any] = {
        "patch_embed": params["patch_embed"],
        "pos_embed": params["pos_embed"],
        "norm": params["norm"],
    }
    for i in range(depth):
        blk = params[f"block{i}"]
        qblk: dict[str, Any] = {
            "norm1": blk["norm1"],
            "norm2": blk["norm2"],
        }
        for path in _QUANT_LAYERS:
            mod, layer = path.split("/")
            leaf = blk[mod][layer]
            wq, ws = quantize_weight(jnp.asarray(leaf["kernel"], jnp.float32))
            qblk[f"{mod}.{layer}"] = dict(
                kernel_q=wq, scale=ws, bias=leaf.get("bias")
            )
        out[f"block{i}"] = qblk
    return out


def _layernorm(x: jax.Array, p: dict) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return y * p["scale"] + p["bias"]


def _qdense(x: jax.Array, p: dict, weight_only: bool = False) -> jax.Array:
    if weight_only:
        # bf16 activations: the weight-only win is HBM bytes on the weight
        # read; an f32 activation matmul would halve MXU throughput.
        return weight_only_matmul(
            x.astype(jnp.bfloat16), p["kernel_q"], p["scale"], p["bias"]
        )
    return int8_matmul(x, p["kernel_q"], p["scale"], p["bias"])


def vit_forward_int8(
    qparams: dict,
    images: jax.Array,
    *,
    patch_size: int,
    depth: int,
    num_heads: int,
    weight_only: bool = False,
) -> jax.Array:
    """(B, H, W, 3) -> (B, H/p, W/p, C) features, int8 matmuls throughout the
    transformer. Numerically validated against the f32/bf16 flax forward in
    tests/test_quant.py.

    weight_only=True keeps activations in bf16 and stores only the weights
    int8 (ops/quant.py:weight_only_matmul) — the latency-mode variant:
    wins where matmuls are weight-bandwidth-bound (single-crop serving of
    wide models; 1.43x measured on a ViT-H-width layer,
    scripts/bench_weight_only_int8.py), parity at throughput batches, and
    closer to the f32 forward than dynamic int8 since activations are
    never quantized."""
    B, H, W, _ = images.shape
    gh, gw = H // patch_size, W // patch_size

    pe = qparams["patch_embed"]
    x = jax.lax.conv_general_dilated(
        images.astype(jnp.bfloat16),
        jnp.asarray(pe["kernel"], jnp.bfloat16),
        (patch_size, patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(pe["bias"], jnp.bfloat16)
    C = x.shape[-1]
    x = x.reshape(B, gh * gw, C)
    x = x + jnp.asarray(qparams["pos_embed"], jnp.bfloat16)
    N = gh * gw
    head_dim = C // num_heads
    scale = 1.0 / np.sqrt(head_dim)

    for i in range(depth):
        blk = qparams[f"block{i}"]
        y = _layernorm(x, blk["norm1"])
        qkv = _qdense(y, blk["attn.qkv"], weight_only).reshape(B, N, 3, num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        x = x + _qdense(o, blk["attn.proj"], weight_only)
        y = _layernorm(x, blk["norm2"])
        h = _qdense(y, blk["mlp.fc1"], weight_only)
        h = jax.nn.gelu(h)
        x = x + _qdense(h, blk["mlp.fc2"], weight_only)

    x = _layernorm(x, qparams["norm"]).astype(jnp.float32)
    return x.reshape(B, gh, gw, C)
