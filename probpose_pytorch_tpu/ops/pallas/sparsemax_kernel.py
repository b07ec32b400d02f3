"""Pallas TPU kernel for sparsemax over heatmap pixels.

Single-pass design: each grid step loads a (ROW_TILE, N) block of logits into
VMEM once and runs the full bisection + exact-threshold recovery there — one
HBM read and one HBM write per element, with all ~26 bisection reductions
hitting VMEM. The XLA fallback (ops/sparsemax.py) expresses the same
algorithm as a fori_loop over full arrays and relies on the compiler to block
it; the kernel makes the single-pass schedule explicit.

Used by models/head.py when enabled; numerics are identical to the XLA path
(tests/test_pallas.py checks bit-level agreement on CPU interpret mode and
the sort-based oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sparsemax_pallas"]

_BISECT_ITERS = 30


def _sparsemax_kernel(z_ref, out_ref):
    z = z_ref[:].astype(jnp.float32)
    zmax = jnp.max(z, axis=-1, keepdims=True)

    def body(_, bracket):
        lo, hi = bracket
        mid = (lo + hi) * 0.5
        f = jnp.sum(jnp.maximum(z - mid, 0.0), axis=-1, keepdims=True) - 1.0
        lo = jnp.where(f > 0, mid, lo)
        hi = jnp.where(f > 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (zmax - 1.0, zmax))
    tau_approx = (lo + hi) * 0.5
    support = z > tau_approx
    k = jnp.maximum(
        jnp.sum(support.astype(jnp.float32), axis=-1, keepdims=True), 1.0
    )
    ssum = jnp.sum(jnp.where(support, z, 0.0), axis=-1, keepdims=True)
    tau = (ssum - 1.0) / k
    out_ref[:] = jnp.maximum(z - tau, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def _sparsemax_pallas_2d(
    z: jax.Array, row_tile: int = 128, interpret: bool = False
) -> jax.Array:
    R, N = z.shape
    grid = (pl.cdiv(R, row_tile),)
    return pl.pallas_call(
        _sparsemax_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N), z.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (row_tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (row_tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(z)


def sparsemax_pallas(z: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Sparsemax along the last axis via the Pallas kernel (forward only —
    wrap with the custom-VJP entry point in ops/sparsemax.py for training)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, N = z.shape
    R = 1
    for d in lead:
        R *= d
    flat = z.reshape(R, N)
    out = _sparsemax_pallas_2d(flat, interpret=interpret)
    return out.reshape(*lead, N)
