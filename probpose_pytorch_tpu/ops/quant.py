"""int8 quantization primitives for serving (v5e int8 MXU path, ~2x bf16).

Post-training dynamic quantization:
  * weights: symmetric per-output-channel int8 (+ f32 scales), converted once
    from trained f32 params;
  * activations: symmetric per-row (per-token) int8, quantized on the fly;
  * matmul: int8 x int8 -> int32 on the MXU (plain lax.dot_general reaches the
    int8 systolic path — measured ~434 TOPS on v5e), dequantized with
    (row_scale x col_scale).

The reference has no quantization story; this is a serving enhancement
(SURVEY.md §6 perf mandate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight",
    "int8_matmul",
    "dynamic_quantize_rows",
    "weight_only_matmul",
]


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 (in, out) kernel -> (int8 kernel, f32 per-output-channel scale)."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale[0]  # (in, out) int8, (out,) f32


def dynamic_quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., K) f32/bf16 -> per-row int8 + (..., 1) f32 scales."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array | None = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """y = x @ W (+ bias) with dynamic int8 activations and int8 weights.

    x: (..., K); w_q: (K, N) int8; w_scale: (N,) f32.
    """
    *lead, K = x.shape
    xq, x_scale = dynamic_quantize_rows(x.reshape(-1, K))
    acc = jax.lax.dot_general(
        xq, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y.reshape(*lead, w_q.shape[1]).astype(out_dtype)


def weight_only_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """y = x @ dequant(W) (+ bias): int8 weights, full-precision activations.

    The latency-mode variant of int8_matmul: weights are stored int8 in HBM
    (half the bf16 bytes) and dequantized on the fly into the matmul's
    compute dtype; activations are untouched, so the elementwise
    quantize/dequantize cost that made dynamic int8 e2e-negative at
    ViT-S/B (docs/PERF.md "int8 serving") never applies. Only wins where
    the matmul is WEIGHT-bound — tiny token counts (single-frame latency
    serving of wide models); at throughput batches the convert either
    fuses into the dot (free, but no bytes saved on activations) or
    materializes a scratch copy. Measured honestly in
    scripts/bench_weight_only_int8.py.
    """
    w = w_q.astype(x.dtype) * w_scale.astype(x.dtype)[None, :]
    y = x @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
