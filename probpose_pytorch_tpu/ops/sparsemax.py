"""Sparsemax over heatmap pixels, TPU-native.

The reference head normalizes flattened heatmaps with the pip `sparsemax`
package (/root/reference/probpose/head.py:10-15, 240-245, 527-531). A direct
port would sort each (H*W,) row — O(n log n) XLA sorts over ~9k-pixel rows.

Instead we use the defining property of the sparsemax threshold tau:
    f(tau) = sum_i max(z_i - tau, 0) - 1
is continuous, strictly decreasing on the active range, with a root in
[max(z) - 1, max(z)]. We bisect ~30 iterations (VPU reductions only), recover
the exact support from the approximate tau, then compute the *exact* tau in
closed form from the support: tau = (sum support z - 1) / |support|. The
result is exact (not approximate) as long as bisection separates the support
boundary, which 30 halvings of a width-1 bracket (2^-30 resolution) do for
f32 inputs.

The backward pass uses the known closed-form Jacobian of sparsemax:
    dz = where(p > 0, g - mean(g over support), 0).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = [
    "sparsemax",
    "sparsemax_tpu",
    "sparsemax_auto",
    "force_xla_sparsemax",
]

_BISECT_ITERS = 30


def _sparsemax_fwd_impl(z: jax.Array) -> jax.Array:
    z32 = z.astype(jnp.float32)
    zmax = jnp.max(z32, axis=-1, keepdims=True)

    def body(_, bracket):
        lo, hi = bracket
        mid = (lo + hi) / 2.0
        f = jnp.sum(jnp.maximum(z32 - mid, 0.0), axis=-1, keepdims=True) - 1.0
        lo = jnp.where(f > 0, mid, lo)
        hi = jnp.where(f > 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(
        0, _BISECT_ITERS, body, (zmax - 1.0, zmax)
    )
    tau_approx = (lo + hi) / 2.0
    support = z32 > tau_approx
    k = jnp.sum(support, axis=-1, keepdims=True).astype(jnp.float32)
    k = jnp.maximum(k, 1.0)
    ssum = jnp.sum(jnp.where(support, z32, 0.0), axis=-1, keepdims=True)
    tau = (ssum - 1.0) / k
    return jnp.maximum(z32 - tau, 0.0).astype(z.dtype)


@jax.custom_vjp
def sparsemax(z: jax.Array) -> jax.Array:
    """Sparsemax along the last axis (Martins & Astudillo, 2016).

    Returns the Euclidean projection of `z` onto the probability simplex:
    sparse, non-negative, sums to 1 along the last axis.
    """
    return _sparsemax_fwd_impl(z)


def _fwd(z):
    p = _sparsemax_fwd_impl(z)
    return p, p


def _bwd(p, g):
    support = p > 0
    k = jnp.maximum(jnp.sum(support, axis=-1, keepdims=True), 1)
    gsum = jnp.sum(jnp.where(support, g, 0.0), axis=-1, keepdims=True)
    dz = jnp.where(support, g - gsum / k, 0.0)
    return (dz.astype(g.dtype),)


sparsemax.defvjp(_fwd, _bwd)


@jax.custom_vjp
def sparsemax_tpu(z: jax.Array) -> jax.Array:
    """Sparsemax with the single-pass Pallas forward kernel
    (ops/pallas/sparsemax_kernel.py) and the same closed-form backward.
    Falls back to interpret mode off-TPU."""
    from probpose_pytorch_tpu.ops.pallas import sparsemax_pallas

    return sparsemax_pallas(z)


def _fwd_tpu(z):
    from probpose_pytorch_tpu.ops.pallas import sparsemax_pallas

    p = sparsemax_pallas(z)
    return p, p


sparsemax_tpu.defvjp(_fwd_tpu, _bwd)


_FORCE_XLA = False


@contextlib.contextmanager
def force_xla_sparsemax():
    """Trace sparsemax with the pure-XLA formulation even on TPU — for
    multi-platform `jax.export` (serve/export.py portable bundles), where a
    Pallas call would fail to lower for non-TPU targets. Identical math
    (the Pallas kernel is a fusion of the same projection)."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


def sparsemax_auto(z: jax.Array) -> jax.Array:
    """Pick the Pallas kernel on TPU, the XLA formulation elsewhere."""
    if not _FORCE_XLA and jax.default_backend() == "tpu":
        return sparsemax_tpu(z)
    return sparsemax(z)
