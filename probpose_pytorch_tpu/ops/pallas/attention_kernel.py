"""Pallas TPU kernel: fused multi-head attention for short sequences.

ViT pose backbones run attention over a few hundred patch tokens (192 at
256x192/p16). At that length the (B, heads, N, N) attention matrix is pure
HBM overhead — materializing it costs ~3 round trips of ~113 MB per block at
batch 256, a quarter of backbone time — while the whole per-head problem
(q, k, v, scores) fits in VMEM. This kernel computes
softmax(q k^T / sqrt(d)) v entirely on-chip: HBM sees only q, k, v in and the
context out.

Not a flash-attention variant: no tiling/online-softmax is needed because N
is small; each grid step processes a group of (batch*head) slices with plain
MXU matmuls and an f32 softmax in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    G = q_ref.shape[0]
    for g in range(G):  # static unroll over the group
        q = q_ref[g]  # (N, d)
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, N)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _fused_attention_flat(
    q: jax.Array, k: jax.Array, v: jax.Array,
    group: int = 8, interpret: bool = False,
):
    R, N, d = q.shape
    scale = 1.0 / np.sqrt(d)
    grid = (pl.cdiv(R, group),)
    spec = pl.BlockSpec((group, N, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R, N, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    group: int = 8, interpret: bool | None = None,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v with q, k, v shaped (B, N, heads, d)
    (the layout produced by the ViT's qkv projection). Returns (B, N, heads, d).
    Forward-only (serving); training uses the XLA formulation."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, H, D = q.shape

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, N, D)

    out = _fused_attention_flat(
        flat(q), flat(k), flat(v), group=group, interpret=interpret
    )
    return jnp.transpose(out.reshape(B, H, N, D), (0, 2, 1, 3))
