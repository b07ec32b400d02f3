"""Stride-2 transposed convolution with a hand-derived custom backward.

Status: **e2e-neutral-to-negative at flagship geometry — kept as tested
infrastructure, not the default.** A noisy micro-profile attributed ~6.6 ms
of the B=128 train step to the deconv backward; a paired end-to-end A/B
(scripts/train_speed.py) measured the custom VJP at 55.5 ms/step vs 53.2 ms
for XLA's autodiff — the whole-step XLA schedule already handles the
transposed-conv gradient well, and the micro-attribution was a
differencing artifact (docs/PERF.md). The op stays available as
`ProbMapHead(deconv_impl="fastvjp")` for geometries where the autodiff
backward does misbehave, and as the reference construction for the tap
algebra. (A phase-decomposed conv+pixel-shuffle forward was also tried and
measured slower than XLA's native conv_transpose forward.)

`conv_transpose2` keeps `lax.conv_transpose(..., strides=(2,2), "SAME")` as
the forward and installs a custom VJP:

- dX is a plain stride-2 correlation of the cotangent with the
  spatially-flipped, in/out-swapped kernel — a standard strided conv that
  XLA maps straight onto the MXU.
- dW decomposes over kernel taps: tap t of phase (a, b) needs
  `sum_m g[2m+a, 2n+b] * x[m+j_r, n+j_c]` — one (Cin x BHW) @ (BHW x Cout)
  matmul per tap (k^2 of them), on phase-sliced cotangents and shifted
  inputs. No dilation anywhere.

Gradients equal jax's autodiff of lax.conv_transpose to float rounding
(tests/test_deconv.py). The kernel keeps the `(k, k, Cin, Cout)` flax
layout, so checkpoints and torch imports are unchanged.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["conv_transpose2"]

_DN = ("NHWC", "HWIO", "NHWC")


def _pad_a(k: int, s: int) -> int:
    # lax.conv_transpose's SAME-padding rule (jax _conv_transpose_padding).
    pad_len = k + s - 2
    if s > k - 1:
        return k - 1
    return int(np.ceil(pad_len / 2))


def _tap_map(k: int, pad_a: int) -> dict[int, tuple[int, int]]:
    """tap t -> (phase a, input offset j) with y[2i+a] += x[i+j]·W[t]."""
    out = {}
    for a in range(2):
        for t in range(k):
            q = a - pad_a + t
            if q % 2 == 0:
                out[t] = (a, q // 2)
    return out


@jax.custom_vjp
def conv_transpose2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """`lax.conv_transpose(x, kernel, (2, 2), "SAME")` (flax ConvTranspose
    semantics, no kernel flip) with an MXU-friendly custom backward.
    x: (B, H, W, Cin); kernel: (k, k, Cin, Cout), k in (2, 3, 4)."""
    return jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME", dimension_numbers=_DN
    )


def _fwd(x, kernel):
    return conv_transpose2(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    k = kernel.shape[0]
    B, H, W, cin = x.shape
    pad = _pad_a(k, 2)
    g = g.astype(x.dtype)

    # dX: stride-2 correlation with flipped, io-swapped kernel. The
    # conv_transpose padding (pa, pb) is asymmetric for odd k; the
    # transposed correlation uses the complement (k-1-pa, k-1-pb).
    pb = k + 2 - 2 - pad
    wf = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2)).astype(x.dtype)
    dx = jax.lax.conv_general_dilated(
        g, wf,
        window_strides=(2, 2),
        padding=((k - 1 - pad, k - 1 - pb),) * 2,
        dimension_numbers=_DN,
    )

    # dW: one einsum per (row-tap, col-tap). Phase (a, b) cotangent slice
    # pairs with the input shifted by that tap's offset (zero outside).
    taps = _tap_map(k, pad)
    jmin = min(j for _, j in taps.values())
    jmax = max(j for _, j in taps.values())
    xp = jnp.pad(x, ((0, 0), (-jmin, jmax), (-jmin, jmax), (0, 0)))
    rows = []
    for tr in range(k):
        a, jr = taps[tr]
        cols = []
        for tc in range(k):
            b, jc = taps[tc]
            xs = jax.lax.dynamic_slice(
                xp, (0, jr - jmin, jc - jmin, 0), (B, H, W, cin)
            )
            gp = g[:, a::2, b::2, :]
            cols.append(
                jnp.einsum(
                    "bhwc,bhwo->co", xs, gp,
                    preferred_element_type=jnp.float32,
                )
            )
        rows.append(jnp.stack(cols, axis=0))
    dw = jnp.stack(rows, axis=0).astype(kernel.dtype)
    return dx, dw


conv_transpose2.defvjp(_fwd, _bwd)
