"""GPipe-style SPMD pipeline parallelism over a mesh "pipe" axis.

The reference is strictly single-device (SURVEY.md §2.3: no DDP/pipeline
anywhere); this is greenfield TPU scale-out design for deep trunks (ViT-L/H)
whose weights or activations outgrow one chip even under tensor parallelism.

Design (the standard TPU pipelining recipe — scan over ticks, ppermute
between neighbor stages, all inside one shard_map so XLA overlaps the
per-tick compute with the ICI hop):

* The trunk's `depth` blocks are split into S contiguous stages; every
  block parameter is stacked along a leading depth axis and that axis is
  sharded over the mesh's "pipe" axis, so each device holds depth/S blocks.
* The per-device batch is split into M microbatches. At tick t, stage s
  runs its blocks on microbatch t-s (a `jnp.where` on `lax.axis_index`
  feeds stage 0 fresh microbatches and makes other stages consume the
  activation ppermuted from stage s-1 at tick t-1).
* After M+S-1 ticks the last stage holds every microbatch's output; a
  masked psum over the pipe axis replicates it to the other stages (they
  run the small non-trunk layers redundantly — at trunk depths where PP
  pays off, the trunk dominates).
* Bubble fraction is (S-1)/(M+S-1): choose M ≥ 2S to keep it under a
  third. Backward: plain autodiff through the scan/ppermute emits the
  reverse pipeline (ppermute transposes to the reverse shift), GPipe-style
  — all microbatch activations live until the backward tick, so combine
  with per-block remat for long pipelines.

Composes with data parallelism (batch axis sharded over "data") and with
tensor parallelism inside a stage: pass `param_specs` that shard the
Megatron dims of the stacked leaves over the mesh "model" axis and a
`block_fn` that psums its row-parallel matmul outputs over that axis
(models/vit.py:tp_block_apply builds exactly that pair). The single
shard_map then spans (data, model, pipe): per tick, each stage's blocks run
head/column-sharded with one in-block psum over "model", and the per-tick
ppermute still rides the innermost "pipe" ICI hop.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = ["pipeline_spmd", "pick_microbatches"]


def pick_microbatches(local_batch: int, n_stages: int) -> int:
    """Largest microbatch count ≤ 2·S that divides the per-device batch.

    2·S caps the bubble at (S-1)/(3S-1) < 1/3 while keeping microbatches
    big enough to feed the MXU; falls back toward 1 for tiny batches
    (correct, just bubble-heavy).
    """
    cap = min(2 * n_stages, local_batch)
    for m in range(cap, 0, -1):
        if local_batch % m == 0:
            return m
    return 1


def pipeline_spmd(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh,
    *,
    pipe_axis: str = "pipe",
    batch_axis: str = "data",
    microbatches: int = 0,
    param_specs: Any = None,
    seq_block_fn: Callable[[Any, jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """Run `depth` blocks over `x` as an S-stage SPMD pipeline.

    Args:
        block_fn: (params_i, h) -> h applying ONE block; params_i is
            `stacked_params` with the leading depth axis indexed away.
            Runs INSIDE the shard_map: with `param_specs` sharding leaves
            over a tensor-parallel axis, block_fn sees local shards and is
            responsible for the in-block collectives (psum over that axis).
        stacked_params: pytree whose every leaf has leading dim `depth`.
        x: (B, ...) activations; B shards over `batch_axis`, the rest of
            the program sees the same shapes as a sequential trunk.
        mesh: jax.sharding.Mesh containing `pipe_axis` (and usually
            `batch_axis`).
        microbatches: per-device microbatch count (0 = auto via
            `pick_microbatches`).
        param_specs: optional PartitionSpec pytree matching stacked_params
            (default: every leaf P(pipe_axis) — depth-sharded, otherwise
            replicated). Use to additionally shard Megatron dims over a
            "model" axis for tensor parallelism inside each stage.
        seq_block_fn: block application used on the SEQUENTIAL fallback
            paths (S == 1 or an indivisible batch), which run OUTSIDE any
            shard_map on logically-full parameters — a TP block_fn that
            psums must supply its collective-free full-width form here.
            Default: block_fn.

    Returns (B, ...) activations, numerically equal (up to reduction
    order) to folding block_fn over the depth axis sequentially.
    """
    shape = dict(mesh.shape) if mesh is not None else {}
    S = shape.get(pipe_axis, 1)
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    dp = shape.get(batch_axis, 1)
    B = x.shape[0]
    # Batches that don't divide the data axis (model.init's B=1 sample,
    # odd serving buckets) run the blocks sequentially instead — B is
    # static, so this resolves at trace time (same precedent as the fused
    # attention's batch_axis handling in models/vit.py). The loop is
    # unrolled, not lax.scan: a scanned ViT-S trunk measured 72.5 ms/step
    # vs 51.9 unrolled on v5e (XLA schedules/fuses across unrolled layers
    # but not across scan iterations; docs/PERF.md).
    if S == 1 or B % dp != 0:
        seq_fn = seq_block_fn or block_fn
        out = x
        for i in range(depth):
            out = seq_fn(
                jax.tree_util.tree_map(lambda a: a[i], stacked_params), out
            )
        return out
    if depth % S != 0:
        raise ValueError(f"depth={depth} not divisible by pipe axis size {S}")
    local_b = B // dp
    M = microbatches or pick_microbatches(local_b, S)
    if local_b % M != 0:
        raise ValueError(
            f"per-device batch {local_b} not divisible by microbatches={M}"
        )

    x_spec = P(batch_axis)
    if param_specs is None:
        param_specs = jax.tree_util.tree_map(
            lambda _: P(pipe_axis), stacked_params
        )
    perm = [(i, (i + 1) % S) for i in range(S)]

    def pipelined(x_local, p_local):
        stage = lax.axis_index(pipe_axis)
        mb = x_local.shape[0] // M
        mbs = x_local.reshape(M, mb, *x_local.shape[1:])
        state = jnp.zeros_like(mbs[0])
        outs = jnp.zeros_like(mbs)

        # In-stage blocks are unrolled (L = depth/S is static): XLA fuses
        # and prefetches across unrolled layers but not across lax.scan
        # iterations — a scanned ViT-S trunk measured 1.4x slower than
        # unrolled on v5e (docs/PERF.md). Only the tick loop stays a scan.
        L = depth // S

        def run_stage(h):
            for i in range(L):
                h = block_fn(
                    jax.tree_util.tree_map(lambda a: a[i], p_local), h
                )
            return h

        def tick(carry, t):
            state, outs = carry
            inp = lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            # Stage 0 consumes fresh microbatches; later stages consume the
            # activation shifted in from stage-1 at the previous tick. Ticks
            # past M re-feed the last microbatch to stage 0 — its output
            # never reaches a valid collection slot, so it (and its
            # cotangent) is dead weight only during the drain bubble.
            h = jnp.where(stage == 0, inp, state)
            y = run_stage(h)
            j = t - (S - 1)
            collected = lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(j, 0, M - 1), 0
            )
            outs = jnp.where((stage == S - 1) & (j >= 0), collected, outs)
            state = lax.ppermute(y, pipe_axis, perm)
            return (state, outs), None

        (state, outs), _ = lax.scan(
            tick, (state, outs), jnp.arange(M + S - 1)
        )
        # Replicate the last stage's outputs across the pipe axis so the
        # (replicated) layers after the trunk see a full batch everywhere.
        # One activation-sized all-reduce per step — amortized over S
        # stages of trunk compute.
        outs = lax.psum(
            jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)), pipe_axis
        )
        return outs.reshape(x_local.shape)

    fn = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(x_spec, param_specs),
        out_specs=x_spec,
        check_vma=False,  # Pallas custom_vjp may run inside block_fn
    )
    return fn(x, stacked_params)
