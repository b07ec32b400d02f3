"""Backbone variant timing, round 2: attention impls, LN dtype, gelu."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.utils.profiling import measure_fn_time

B, N, C, DEPTH, HEADS = 256, 192, 384, 12, 6
x_tokens = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)).astype(np.float32))


class Block(nn.Module):
    ln_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"  # einsum | dpa
    gelu_approx: bool = True

    @nn.compact
    def __call__(self, x):
        bf = jnp.bfloat16
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm1")(x)
        qkv = nn.Dense(3 * C, dtype=bf)(y).reshape(B, N, 3, HEADS, C // HEADS)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        if self.attn_impl == "dpa":
            o = jax.nn.dot_product_attention(q, k, v)
            o = o.reshape(B, N, C)
        else:
            a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (1.0 / np.sqrt(C // HEADS))
            a = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=bf)(o)
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm2")(x)
        h = nn.Dense(4 * C, dtype=bf)(y)
        h = nn.gelu(h, approximate=self.gelu_approx)
        x = x + nn.Dense(C, dtype=bf)(h)
        return x


class Trunk(nn.Module):
    kw: dict

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        for i in range(DEPTH):
            x = Block(**self.kw, name=f"b{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32)(x)


for name, kw in [
    ("einsum f32LN gelu-tanh (best so far)", dict()),
    ("einsum bf16LN", dict(ln_dtype=jnp.bfloat16)),
    ("dpa f32LN", dict(attn_impl="dpa")),
    ("einsum f32LN gelu-erf", dict(gelu_approx=False)),
]:
    m = Trunk(kw)
    vs = m.init(jax.random.PRNGKey(0), x_tokens)
    t = measure_fn_time(lambda t_: m.apply(vs, t_).astype(jnp.float32).mean(axis=(1, 2)), x_tokens)
    gflop = B * (DEPTH * (12 * C * C * N + 2 * N * N * C * 2)) * 2 / 1e9
    print(f"{name:40s} {t*1e3:7.2f} ms  {B/t:8.0f} crops/s  MFU~{gflop/1e3/t/197*100:4.1f}%")
