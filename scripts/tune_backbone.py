"""Experiment: backbone timing variants on the real chip."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.utils.profiling import measure_fn_time

B, N, C, DEPTH, HEADS = 256, 192, 384, 12, 6
x_tokens = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)).astype(np.float32))


class Block(nn.Module):
    ln_dtype: jnp.dtype
    dtype: jnp.dtype = jnp.bfloat16
    fuse_softmax_bf16: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm1")(x)
        qkv = nn.Dense(3 * C, dtype=self.dtype)(y).reshape(B, N, 3, HEADS, C // HEADS)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (1.0 / np.sqrt(C // HEADS))
        if self.fuse_softmax_bf16:
            a = jax.nn.softmax(a, axis=-1)
        else:
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=self.dtype)(o)
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm2")(x)
        h = nn.Dense(4 * C, dtype=self.dtype)(y)
        h = nn.gelu(h)
        x = x + nn.Dense(C, dtype=self.dtype)(h)
        return x


class Trunk(nn.Module):
    ln_dtype: jnp.dtype
    fuse_softmax_bf16: bool = False
    cast_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.cast_input:
            x = x.astype(jnp.bfloat16)
        for i in range(DEPTH):
            x = Block(self.ln_dtype, fuse_softmax_bf16=self.fuse_softmax_bf16, name=f"b{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32)(x)


for name, kw in [
    ("f32 LN + f32 softmax (current)", dict(ln_dtype=jnp.float32)),
    ("bf16 LN", dict(ln_dtype=jnp.bfloat16)),
    ("bf16 LN + bf16 softmax", dict(ln_dtype=jnp.bfloat16, fuse_softmax_bf16=True)),
]:
    m = Trunk(**kw)
    vs = m.init(jax.random.PRNGKey(0), x_tokens)
    t = measure_fn_time(lambda t_: m.apply(vs, t_).astype(jnp.float32).mean(axis=(1, 2)), x_tokens)
    gflop = B * (DEPTH * (12 * C * C * N + 2 * N * N * C * 2)) * 2 / 1e9
    print(f"{name:36s} {t*1e3:7.2f} ms  {B/t:8.0f} crops/s  MFU~{gflop/1e3/t/197*100:4.1f}%")
