"""Pallas TPU kernel: fused expected-value decode.

Fuses the whole decode chain — separable reflect-boundary OKS convolution
(two MXU matmuls) -> flat argmax -> sub-pixel Taylor refinement -> raw-value
readout — into one kernel. The XLA path (ops/heatmap.py) materializes the
convolved maps to HBM between stages; here a (row-tile, H, W) block of
heatmaps is read once, everything happens in VMEM, and only the (x, y, value)
triplets are written back.

Neighbor extraction for the sub-pixel step uses one-hot reductions instead of
gathers (TPU-friendly: VPU compare + multiply + reduce); argmax is
hierarchical (per-row max, then within-row) because Mosaic cannot collapse
(TB, H, W) -> (TB, H*W) for lane-unaligned W — tie semantics match row-major
flat argmax exactly.

Measured on v5e at (256, 17, 64, 48): 1.23 ms vs 0.71 ms for the XLA
formulation (ops/heatmap.py) — XLA's own fusion wins here, so the XLA path
stays the production default and this kernel is kept as the fused-decode
alternative (useful where the convolved maps must never hit HBM, e.g. much
larger heatmaps). Its matmuls run at default f32 precision, so on
adversarially flat inputs argmax ties can resolve differently than the
HIGHEST-precision XLA path; on realistic (peaked) heatmaps results agree to
<1e-4 px (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probpose_pytorch_tpu.ops.heatmap import OKSConvOperators

__all__ = ["expected_value_decode_pallas"]


def _decode_kernel(hm_ref, row_ref, col_ref, out_ref):
    hm = hm_ref[:, 0]  # (TB, H, W)
    row = row_ref[0]  # (H, H)
    col = col_ref[0]  # (W, W)
    TB, H, W = hm.shape

    # conv[b, h, w] = sum_{g, v} row[h, g] * hm[b, g, v] * col[w, v]
    t = jax.lax.dot_general(
        hm, col, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TB, H, W): t[b, g, w] = sum_v hm[b, g, v] col[w, v]
    conv_t = jax.lax.dot_general(
        t, row, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TB, W, H): conv_t[b, w, h]
    conv = jnp.transpose(conv_t, (0, 2, 1))  # (TB, H, W)

    # Hierarchical argmax (same first-occurrence tie semantics as row-major
    # flat argmax: smallest y among maxima, then smallest x within that row).
    # Mosaic can't collapse (TB, H, W) -> (TB, H*W) for unaligned W, so no
    # flattening happens anywhere in this kernel.
    per_row_max = jnp.max(conv, axis=2)  # (TB, H)
    yi = jnp.argmax(per_row_max, axis=1)  # (TB,)

    def rows_at(yoff):
        onehot = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (TB, H), 1)
            == (yi + yoff)[:, None],
            1.0,
            0.0,
        )
        # (TB, W): conv values of row yi+yoff (all-zero when out of range).
        # Broadcast-multiply-reduce (Mosaic rejects batched-matvec einsums).
        return jnp.sum(onehot[:, :, None] * conv, axis=1)

    row_c = rows_at(0)
    row_up = rows_at(-1)
    row_dn = rows_at(1)
    xi = jnp.argmax(row_c, axis=1)  # (TB,)

    lanes_w = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)

    def at(vals, xoff):
        onehot = jnp.where(lanes_w == (xi + xoff)[:, None], 1.0, 0.0)
        return jnp.sum(vals * onehot, axis=1)

    c = at(row_c, 0)
    right = at(row_c, 1)
    left = at(row_c, -1)
    up = at(row_up, 0)
    down = at(row_dn, 0)

    dx = (right - left) / 2.0
    dy = (down - up) / 2.0
    dxx = right + left - 2.0 * c
    dyy = down + up - 2.0 * c
    dxx = jnp.where(dxx != 0, dxx, 1e-6)
    dyy = jnp.where(dyy != 0, dyy, 1e-6)
    # Integer->float casts of the argmax vectors fail to legalize in Mosaic;
    # recover the float coordinates through the same one-hot reductions.
    # 2-D int iota -> f32 cast legalizes; 1-D casts and float iota do not.
    lane_vals_w = lanes_w.astype(jnp.float32)
    lane_vals_h = jax.lax.broadcasted_iota(jnp.int32, (TB, H), 1).astype(
        jnp.float32
    )
    onehot_y_f = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (TB, H), 1) == yi[:, None],
        1.0,
        0.0,
    )
    x = at(lane_vals_w, 0)
    y = jnp.sum(onehot_y_f * lane_vals_h, axis=1)
    valid = (xi > 0) & (xi < W - 1) & (yi > 0) & (yi < H - 1)
    x_out = jnp.where(valid, x - dx / dxx, x)
    y_out = jnp.where(valid, y - dy / dyy, y)

    # Raw-heatmap value at the integer argmax (reference heatmap.py:375-379).
    onehot_y = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (TB, H), 1) == yi[:, None],
        1.0,
        0.0,
    )
    hm_row = jnp.sum(onehot_y[:, :, None] * hm, axis=1)
    v_out = at(hm_row, 0)

    # (8, B) output row block: rows 0/1/2 = x/y/value, rest padding (the
    # sublane dim must be a multiple of 8 for VMEM outputs).
    zeros = jnp.zeros_like(x_out)
    out_ref[0] = jnp.stack(
        [x_out, y_out, v_out, zeros, zeros, zeros, zeros, zeros], axis=0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_pallas(
    heatmaps: jax.Array,
    row_op: jax.Array,
    col_op: jax.Array,
    interpret: bool = False,
):
    # Grid over keypoints; a full batch column of one keypoint's heatmaps
    # lives in VMEM per step (B*H*W*4 bytes — 3 MB at B=256, 64x48).
    B, K, H, W = heatmaps.shape
    kwargs = dict(
        grid=(K,),
        in_specs=[
            pl.BlockSpec(
                (B, 1, H, W),
                lambda k: (0, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H, H), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, W, W), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, B), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, 8, B), jnp.float32),
        interpret=interpret,
    )
    out = pl.pallas_call(_decode_kernel, **kwargs)(heatmaps, row_op, col_op)
    x, y, v = out[:, 0], out[:, 1], out[:, 2]
    return jnp.stack([x.T, y.T], axis=-1), v.T


def expected_value_decode_pallas(
    heatmaps: jax.Array,
    ops: OKSConvOperators,
    interpret: bool | None = None,
):
    """Fused expected-value decode; same contract as
    ops.heatmap.expected_value_decode (minus return_heatmap)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hm = jnp.asarray(heatmaps, jnp.float32)
    B, K, H, W = hm.shape
    row = jnp.asarray(ops.row_op)
    col = jnp.asarray(ops.col_op)
    # Keep the per-step input block near 1 MB: kernel intermediates (conv,
    # separable products, one-hot broadcasts) are ~10x the block size and the
    # scoped VMEM limit is 16 MB.
    max_b = max(8, (1 << 20) // (H * W * 4))
    if B <= max_b:
        return _decode_pallas(hm, row, col, interpret=interpret)
    locs, vals = [], []
    for s in range(0, B, max_b):
        l, v = _decode_pallas(hm[s : s + max_b], row, col, interpret=interpret)
        locs.append(l)
        vals.append(v)
    return jnp.concatenate(locs), jnp.concatenate(vals)
