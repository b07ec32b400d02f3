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

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = [
    "pipeline_spmd",
    "pipeline_1f1b",
    "pipeline_1f1b_interleaved",
    "circular_chunk_order",
    "pick_microbatches",
    "tp_enter",
    "tp_leave",
]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_enter(x: jax.Array, axis: str) -> jax.Array:
    """Megatron "f" boundary: identity forward, psum backward.

    Place at the point where a replicated activation enters model-sharded
    compute (after the replicated LayerNorm, before the column-parallel
    matmul). The backward psum merges the per-shard partial cotangents so
    the joined cotangent upstream of the boundary is the true full one —
    which is what makes a plain `jax.vjp` of a Megatron-form block exact
    per shard (pipeline_1f1b runs exactly that inside its scheduled scan,
    where shard_map's boundary transpose machinery cannot help)."""
    return x


def _tp_enter_fwd(x, axis):
    return x, None


def _tp_enter_bwd(axis, _, g):
    return (lax.psum(g, axis),)


tp_enter.defvjp(_tp_enter_fwd, _tp_enter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_leave(x: jax.Array, axis: str) -> jax.Array:
    """Megatron "g" boundary: psum forward, identity backward.

    Place where model-sharded partial outputs merge back to a replicated
    activation (the row-parallel matmul output, before its replicated bias
    add). Together with `tp_enter` this makes every cotangent between
    blocks replicated-and-true, so pipeline_1f1b needs no transpose-factor
    corrections."""
    return lax.psum(x, axis)


def _tp_leave_fwd(x, axis):
    return lax.psum(x, axis), None


def _tp_leave_bwd(axis, _, g):
    return (g,)


tp_leave.defvjp(_tp_leave_fwd, _tp_leave_bwd)


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


def pipeline_1f1b(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    loss_fn: Callable[[Any, jax.Array, Any], jax.Array],
    loss_params: Any,
    x: jax.Array,
    targets: Any,
    mesh,
    *,
    pipe_axis: str = "pipe",
    batch_axis: str = "data",
    model_axis: str | None = None,
    microbatches: int = 0,
    param_specs: Any = None,
    seq_block_fn: Callable[[Any, jax.Array], jax.Array] | None = None,
    loss_has_aux: bool = False,
) -> tuple[jax.Array, Any, Any, jax.Array]:
    """One-forward-one-backward (1F1B) pipelined loss + gradients.

    Why a separate engine instead of autodiff through `pipeline_spmd`:
    autodiff of the GPipe scan necessarily runs ALL forwards before the
    first backward, so every microbatch's stage activations stay live —
    O(M) peak memory per stage. 1F1B interleaves each microbatch's backward
    as soon as its loss cotangent exists, which requires the loss to be
    computed *inside* the pipeline at the last stage. This engine therefore
    takes the post-trunk computation as `loss_fn` and returns gradients
    directly; the activation stash holds at most 2(S-1)+1 microbatch inputs
    per stage — O(S), independent of M — so M can grow without growing
    memory. Backward slots recompute the stage forward from the stashed
    input (flash-style, 2x forward FLOPs — the same trade `remat=True`
    makes on the GPipe path).

    Cycle accounting (this synchronous lock-step SPMD scan, NOT the classic
    async-MPMD figure): the scan runs C = M + 2(S-1) cycles, each executing
    one forward and one (possibly masked) backward slot on every stage, so
    wall-clock is (M+2S-2)*(tF+tB) and the idle fraction is
    2(S-1)/(M+2S-2) — about double the textbook (S-1)/(M+S-1), which only
    an asynchronous MPMD 1F1B achieves. The win over GPipe here is the O(S)
    activation memory (GPipe autodiff is O(M) per stage), not wall-clock:
    GPipe's fwd+bwd completes in the equivalent of (M+S-1)*(tF+tB). Grow M
    (memory-free in this engine) to amortize. Full table: docs/SCALING.md.

    Schedule (synchronous SPMD, one scan over C = M + 2(S-1) cycles, all
    inside one shard_map): at cycle c, stage s forwards microbatch c-s and
    backwards microbatch c-2(S-1)+s; the last stage's backward microbatch
    equals its forward microbatch, so its loss vjp feeds its own backward
    in the same cycle. Activations ppermute s->s+1 and cotangents s->s-1
    once per cycle, riding the same ICI hops as the forward-only pipeline.

    Args:
        block_fn: (params_i, h) -> h for ONE trunk block (as pipeline_spmd).
        stacked_params: pytree, every leaf leading dim `depth`.
        loss_fn: (loss_params, h, targets_mb) -> scalar mean loss over the
            microbatch. Runs at the last stage (replicated compute on the
            other stages, masked out). Everything after the trunk — final
            norm, heads, loss — lives here.
        loss_params: pytree (replicated across the mesh).
        x: (B, ...) trunk input; B shards over `batch_axis`.
        targets: pytree of (B, ...) arrays consumed by loss_fn.
        model_axis: name of a tensor-parallel mesh axis when block_fn runs
            Megatron-style. Contract: the block must implement its
            model-axis collectives with the `tp_enter` / `tp_leave`
            boundaries from this module (identity-fwd/psum-bwd at the
            sharded-branch entry, psum-fwd/identity-bwd at its exit)
            instead of bare lax.psum — that makes the plain jax.vjp this
            engine runs per cycle exact per shard, with replicated seam
            cotangents and true local param grads, independent of
            shard_map's transpose bookkeeping (which only fires at the
            shard_map boundary and cannot help inside the scheduled scan).
            `tp_block_apply(..., vjp_boundaries=...)` in models/vit.py
            emits this form for the real ViT block.
        microbatches: 0 = auto. Unlike GPipe's pick (capped at 2S for
            memory), 1F1B can afford M >> S; auto picks the largest divisor
            of the per-device batch that is <= 4S.
        seq_block_fn: collective-free block form for the S==1/indivisible
            fallback (as pipeline_spmd).
        loss_has_aux: when True, loss_fn returns (scalar_loss, aux) where
            aux is a pytree of float arrays computed per microbatch at the
            last stage (per-term loss metrics, BatchNorm running-stat
            updates, ...). The engine returns aux averaged over microbatches
            (uniform weights) and over the data axis, replicated like the
            loss. Non-decomposable statistics (e.g. cross-microbatch
            variance) are approximated by this mean — the same semantics as
            gradient accumulation.

    Returns:
        (loss, d_stacked, d_loss_params, dx[, aux]): global mean loss
        (replicated scalar), trunk grads (laid out like
        stacked_params/param_specs), loss-side grads (replicated), the
        cotangent of x (batch-sharded) for chaining into upstream layers
        (patch embed), and — iff loss_has_aux — the microbatch-averaged aux.
    """
    shape = dict(mesh.shape) if mesh is not None else {}
    S = shape.get(pipe_axis, 1)
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    dp = shape.get(batch_axis, 1)
    B = x.shape[0]

    if S == 1 or B % dp != 0:
        # Sequential fallback: plain autodiff (under an outer jit, GSPMD
        # shards the batch math over `batch_axis` automatically).
        seq_fn = seq_block_fn or block_fn

        def total(p, lp, xin):
            h = xin
            for i in range(depth):
                h = seq_fn(
                    jax.tree_util.tree_map(lambda a: a[i], p), h
                )
            return loss_fn(lp, h, targets)

        if loss_has_aux:
            # Sequential semantics: ONE full-batch loss_fn evaluation (M=1),
            # so batch statistics inside loss_fn see the whole batch.
            (loss, aux), (d_p, d_lp, d_x) = jax.value_and_grad(
                total, argnums=(0, 1, 2), has_aux=True
            )(stacked_params, loss_params, x)
            return loss, d_p, d_lp, d_x, aux
        loss, (d_p, d_lp, d_x) = jax.value_and_grad(
            total, argnums=(0, 1, 2)
        )(stacked_params, loss_params, x)
        return loss, d_p, d_lp, d_x

    if depth % S != 0:
        raise ValueError(f"depth={depth} not divisible by pipe axis size {S}")
    local_b = B // dp
    if microbatches:
        M = microbatches
    else:
        M = 1
        for m in range(min(4 * S, local_b), 0, -1):
            if local_b % m == 0:
                M = m
                break
    if local_b % M != 0:
        raise ValueError(
            f"per-device batch {local_b} not divisible by microbatches={M}"
        )

    x_spec = P(batch_axis)
    t_specs = jax.tree_util.tree_map(lambda _: P(batch_axis), targets)
    if param_specs is None:
        param_specs = jax.tree_util.tree_map(
            lambda _: P(pipe_axis), stacked_params
        )
    lp_specs = jax.tree_util.tree_map(lambda _: P(), loss_params)
    fperm = [(i, (i + 1) % S) for i in range(S)]
    bperm = [(i, (i - 1) % S) for i in range(S)]
    L = depth // S
    Q = 2 * (S - 1) + 1  # stash slots: max microbatch in-flight per stage

    def scheduled(x_local, p_local, lp, t_local):
        stage = lax.axis_index(pipe_axis)
        mb = x_local.shape[0] // M
        mbs = x_local.reshape(M, mb, *x_local.shape[1:])
        t_mbs = jax.tree_util.tree_map(
            lambda a: a.reshape(M, mb, *a.shape[1:]), t_local
        )

        def run_stage(p, h):
            for i in range(L):
                h = block_fn(
                    jax.tree_util.tree_map(lambda a: a[i], p), h
                )
            return h

        def cycle(carry, c):
            (
                stash,
                fwd_in,
                bwd_in,
                dp_acc,
                dlp_acc,
                dx_acc,
                loss_acc,
                aux_acc,
            ) = carry
            # ---- forward slot: microbatch f = c - stage ----
            f = c - stage
            f_valid = (f >= 0) & (f < M)
            fc = jnp.clip(f, 0, M - 1)
            h_in = jnp.where(
                stage == 0,
                lax.dynamic_index_in_dim(mbs, fc, 0, keepdims=False),
                fwd_in,
            )
            # Stash the stage input for the recompute backward. Slot Q is a
            # scratch slot that absorbs invalid-cycle writes so warmup/drain
            # garbage never clobbers a live microbatch.
            stash = lax.dynamic_update_index_in_dim(
                stash, h_in, jnp.where(f_valid, fc % Q, Q), 0
            )
            y = run_stage(p_local, h_in)
            # ---- backward slot: microbatch b = c - 2(S-1) + stage ----
            # At the last stage b == f: the loss vjp on the activation just
            # produced seeds its own backward in the same cycle.
            b = c - 2 * (S - 1) + stage
            b_valid = (b >= 0) & (b < M)
            bc = jnp.clip(b, 0, M - 1)
            t_mb = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, bc, 0, keepdims=False),
                t_mbs,
            )
            if loss_has_aux:
                lval, loss_vjp, aux = jax.vjp(
                    loss_fn, lp, y, t_mb, has_aux=True
                )
            else:
                lval, loss_vjp, aux = (
                    *jax.vjp(loss_fn, lp, y, t_mb),
                    (),
                )
            # d(device loss)/d(mb loss) = 1/M (device loss = mean over mbs)
            dlp_mb, g_loss, _ = loss_vjp(jnp.asarray(1.0 / M, lval.dtype))
            g_in = jnp.where(stage == S - 1, g_loss, bwd_in)
            h_b = lax.dynamic_index_in_dim(stash, bc % Q, 0, keepdims=False)
            _, stage_vjp = jax.vjp(run_stage, p_local, h_b)
            dp_mb, dh = stage_vjp(g_in)
            dp_acc = jax.tree_util.tree_map(
                lambda acc, g: acc + jnp.where(b_valid, g, 0), dp_acc, dp_mb
            )
            last = b_valid & (stage == S - 1)
            dlp_acc = jax.tree_util.tree_map(
                lambda acc, g: acc + jnp.where(last, g, 0), dlp_acc, dlp_mb
            )
            loss_acc = loss_acc + jnp.where(last, lval / M, 0.0)
            # aux rides the same mask: at the last stage b == f, so the aux
            # evaluated on this cycle's forward output y belongs to exactly
            # the microbatch being counted.
            aux_acc = jax.tree_util.tree_map(
                lambda acc, a: acc
                + jnp.where(last, a.astype(acc.dtype) / M, 0),
                aux_acc,
                aux,
            )
            dx_acc = lax.dynamic_update_index_in_dim(
                dx_acc,
                dh,
                jnp.where(b_valid & (stage == 0), bc, M),
                0,
            )
            return (
                stash,
                lax.ppermute(y, pipe_axis, fperm),
                lax.ppermute(dh, pipe_axis, bperm),
                dp_acc,
                dlp_acc,
                dx_acc,
                loss_acc,
                aux_acc,
            ), None

        aux_init: Any = ()
        if loss_has_aux:
            # Abstract-eval the loss to learn aux's structure/shapes; the
            # accumulator carries float32 means (aux must be float-typed).
            aux_struct = jax.eval_shape(
                loss_fn,
                lp,
                mbs[0],
                jax.tree_util.tree_map(lambda a: a[0], t_mbs),
            )[1]
            aux_init = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), aux_struct
            )
        init = (
            jnp.zeros((Q + 1, mb, *x_local.shape[1:]), x_local.dtype),
            jnp.zeros_like(mbs[0]),
            jnp.zeros_like(mbs[0]),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), p_local
            ),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), lp
            ),
            # dx slots carry the activation cotangent, whose dtype follows
            # the activations (bf16 trunks emit bf16 cotangents)
            jnp.zeros((M + 1, mb, *x_local.shape[1:]), x_local.dtype),
            jnp.zeros((), jnp.float32),
            aux_init,
        )
        carry, _ = lax.scan(cycle, init, jnp.arange(M + 2 * (S - 1)))
        _, _, _, dp_acc, dlp_acc, dx_acc, loss_acc, aux_acc = carry
        stage = lax.axis_index(pipe_axis)
        # Mean over microbatches is already folded in (1/M cotangent);
        # reduce across the mesh: data axis averages (global batch mean),
        # pipe axis shares the last stage's loss-side results.
        loss = lax.pmean(
            lax.psum(jnp.where(stage == S - 1, loss_acc, 0.0), pipe_axis),
            batch_axis,
        )
        dp_acc = jax.tree_util.tree_map(
            lambda g: lax.pmean(g, batch_axis), dp_acc
        )
        dlp_acc = jax.tree_util.tree_map(
            lambda g: lax.pmean(lax.psum(g, pipe_axis), batch_axis), dlp_acc
        )
        # dx has no cross-device reduction (each example lives on one data
        # shard), so the global-mean factor 1/dp is applied explicitly.
        dx = lax.psum(
            jnp.where(
                stage == 0, dx_acc[:M], jnp.zeros_like(dx_acc[:M])
            ),
            pipe_axis,
        ).reshape(x_local.shape) / dp
        if loss_has_aux:
            aux_out = jax.tree_util.tree_map(
                lambda a: lax.pmean(
                    lax.psum(
                        jnp.where(stage == S - 1, a, jnp.zeros_like(a)),
                        pipe_axis,
                    ),
                    batch_axis,
                ),
                aux_acc,
            )
            return loss, dp_acc, dlp_acc, dx, aux_out
        return loss, dp_acc, dlp_acc, dx

    out_specs = (P(), param_specs, lp_specs, x_spec)
    if loss_has_aux:
        a_struct = _aux_structure(loss_fn, loss_params, x, targets, dp, M)
        out_specs = out_specs + (
            jax.tree_util.tree_map(lambda _: P(), a_struct),
        )
    fn = jax.shard_map(
        scheduled,
        mesh=mesh,
        in_specs=(x_spec, param_specs, lp_specs, t_specs),
        out_specs=out_specs,
        check_vma=False,  # manual collectives + Pallas custom_vjp inside
    )
    return fn(x, stacked_params, loss_params, targets)


def _aux_structure(loss_fn, loss_params, x, targets, dp, M):
    """Abstract aux pytree of a has-aux loss_fn on one microbatch's shapes
    (for building shard_map out_specs)."""
    mb = x.shape[0] // dp // M
    xs = jax.ShapeDtypeStruct((mb, *x.shape[1:]), x.dtype)
    ts = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct((mb, *a.shape[1:]), a.dtype), targets
    )
    return jax.eval_shape(loss_fn, loss_params, xs, ts)[1]


def circular_chunk_order(depth: int, n_stages: int, virtual: int) -> list:
    """Depth permutation taking LOGICAL block order to the CIRCULAR layout
    `pipeline_1f1b_interleaved` shards: device s's contiguous depth shard
    holds its `virtual` chunks [chunk s, chunk S+s, ..., chunk (V-1)S+s]
    (chunk k = logical blocks [k*L', (k+1)*L'), L' = depth/(S*V)).

    Returns `order` with order[pos] = logical index, i.e.
    ``circ = tree_map(lambda a: a[np.asarray(order)], logical_stacked)``.
    Invert with ``np.argsort(order)`` (checkpoints stay logical)."""
    S, V = n_stages, virtual
    if depth % (S * V):
        raise ValueError(
            f"depth={depth} not divisible by stages*virtual={S * V}"
        )
    Lp = depth // (S * V)
    return [
        (r * S + s) * Lp + l
        for s in range(S)
        for r in range(V)
        for l in range(Lp)
    ]


def pipeline_1f1b_interleaved(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    loss_fn: Callable[[Any, jax.Array, Any], jax.Array],
    loss_params: Any,
    x: jax.Array,
    targets: Any,
    mesh,
    *,
    virtual: int = 2,
    pipe_axis: str = "pipe",
    batch_axis: str = "data",
    model_axis: str | None = None,
    microbatches: int = 0,
    param_specs: Any = None,
    seq_block_fn: Callable[[Any, jax.Array], jax.Array] | None = None,
    loss_has_aux: bool = False,
) -> tuple:
    """Circular-interleaved (virtual-stage) 1F1B: `pipeline_1f1b` with V
    depth chunks per device, cutting the synchronous schedule's idle
    fraction for deep trunks (the depth-32 ViT-H user).

    Layout contract: `stacked_params` must be in the CIRCULAR depth order
    (`circular_chunk_order`) so each device's contiguous shard is its V
    strided chunks; activations ride the same ring as `pipeline_1f1b`
    (chunk k sits on device k mod S, so chunk->chunk+1 is always the
    s->s+1 ICI hop, wrapping from the last device back to device 0 for
    the next ring pass).

    Schedule (mixed-radix, one scan over MINI-cycles of 1/V stage cost):
    microbatch m = g*S + j forwards through chunk k = r*S + s at
    mini-cycle c_f = g*S*V + r*S + s + j — a unique (g, r, j)
    decomposition of c - s, so every device runs exactly one forward and
    one backward slot per mini-cycle, fully dense in steady state. Its
    backward through chunk k runs at c_b = c_f(m, SV-1) + (SV-1-k); at
    the last chunk c_b == c_f, so the loss vjp seeds its own backward in
    the same mini-cycle (as in `pipeline_1f1b`).

    Cycle accounting (M a multiple of S): C = M*V + S*V + S - 2
    mini-cycles at (tF+tB)/V each, vs the plain engine's
    (M + 2S - 2)*(tF+tB) — e.g. S=4, M=8, V=2: 13.0 vs 14.0 (tF+tB)
    units, idle 38.5% vs 42.9%. The classic interleaved figure
    ((S-1)/V-ish bubbles) requires per-device asynchronous F/B slot
    choice, which a lock-step SPMD scan cannot express (every device
    executes both slots every cycle, masked or not) — this engine is the
    best synchronous form: denser steady state, V-times-finer warmup
    granularity. Memory: the input stash grows to V*(2S+2) microbatch
    inputs per device (vs 2S-1 plain) — still O(S·V), independent of M.
    Full table: docs/SCALING.md.

    Args are as `pipeline_1f1b` plus `virtual` (V; 1 reduces to the plain
    schedule exactly). Returns (loss, d_stacked_circular, d_loss_params,
    dx[, aux]) — trunk grads in the SAME circular layout as the input.
    """
    shape = dict(mesh.shape) if mesh is not None else {}
    S = shape.get(pipe_axis, 1)
    V = virtual
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    dp = shape.get(batch_axis, 1)
    B = x.shape[0]

    if S == 1 or B % dp != 0:
        # Sequential fallback in LOGICAL order: circular layout position
        # -> logical block via the permutation's inverse.
        seq_fn = seq_block_fn or block_fn
        order = circular_chunk_order(depth, max(S, 1), V) if S > 1 else list(
            range(depth)
        )
        inv = np.argsort(np.asarray(order)) if S > 1 else np.arange(depth)

        def total(p, lp, xin):
            h = xin
            for kk in range(depth):
                h = seq_fn(
                    jax.tree_util.tree_map(lambda a: a[int(inv[kk])], p), h
                )
            return loss_fn(lp, h, targets)

        if loss_has_aux:
            (loss, aux), (d_p, d_lp, d_x) = jax.value_and_grad(
                total, argnums=(0, 1, 2), has_aux=True
            )(stacked_params, loss_params, x)
            return loss, d_p, d_lp, d_x, aux
        loss, (d_p, d_lp, d_x) = jax.value_and_grad(
            total, argnums=(0, 1, 2)
        )(stacked_params, loss_params, x)
        return loss, d_p, d_lp, d_x

    if depth % (S * V) != 0:
        raise ValueError(
            f"depth={depth} not divisible by stages*virtual={S * V}"
        )
    local_b = B // dp
    if microbatches:
        M = microbatches
    else:
        M = 1
        for m in range(min(4 * S, local_b), 0, -1):
            if local_b % m == 0:
                M = m
                break
    if local_b % M != 0:
        raise ValueError(
            f"per-device batch {local_b} not divisible by microbatches={M}"
        )

    x_spec = P(batch_axis)
    t_specs = jax.tree_util.tree_map(lambda _: P(batch_axis), targets)
    if param_specs is None:
        param_specs = jax.tree_util.tree_map(
            lambda _: P(pipe_axis), stacked_params
        )
    lp_specs = jax.tree_util.tree_map(lambda _: P(), loss_params)
    fperm = [(i, (i + 1) % S) for i in range(S)]
    bperm = [(i, (i - 1) % S) for i in range(S)]
    Lp = depth // (S * V)  # blocks per chunk
    Qv = 2 * S + 2  # stash slots per chunk (max in-flight mbs < 2S+1)
    SV = S * V
    # Mini-cycle count: largest backward completion + 1 (chunk 0 of the
    # last microbatch: c_f(M-1, SV-1) + SV-1).
    gM, jM = (M - 1) // S, (M - 1) % S
    C = gM * SV + (V - 1) * S + (S - 1) + jM + (SV - 1) + 1

    def scheduled(x_local, p_local, lp, t_local):
        stage = lax.axis_index(pipe_axis)
        mb = x_local.shape[0] // M
        mbs = x_local.reshape(M, mb, *x_local.shape[1:])
        t_mbs = jax.tree_util.tree_map(
            lambda a: a.reshape(M, mb, *a.shape[1:]), t_local
        )

        def chunk_params(r):
            # local layout: (V*Lp, ...) = [r, l]; chunk r = rows r*Lp+l
            return jax.tree_util.tree_map(
                lambda a: lax.dynamic_slice_in_dim(a, r * Lp, Lp, 0),
                p_local,
            )

        def run_chunk(p_chunk, h):
            for i in range(Lp):
                h = block_fn(
                    jax.tree_util.tree_map(lambda a: a[i], p_chunk), h
                )
            return h

        aux_init: Any = ()
        if loss_has_aux:
            aux_struct = jax.eval_shape(
                loss_fn,
                lp,
                mbs[0],
                jax.tree_util.tree_map(lambda a: a[0], t_mbs),
            )[1]
            aux_init = jax.tree_util.tree_map(
                lambda s_: jnp.zeros(s_.shape, jnp.float32), aux_struct
            )

        def cycle(carry, c):
            (
                stash,
                fwd_in,
                bwd_in,
                dp_acc,
                dlp_acc,
                dx_acc,
                loss_acc,
                aux_acc,
            ) = carry
            # ---- forward slot: decompose c - stage = g*SV + r*S + j ----
            cf = c - stage
            j_f = jnp.mod(cf, S)
            r_f = jnp.mod(cf // S, V)
            g_f = cf // SV
            m_f = g_f * S + j_f
            f_valid = (cf >= 0) & (m_f >= 0) & (m_f < M)
            mfc = jnp.clip(m_f, 0, M - 1)
            # chunk entry: fresh microbatch only at device 0, ring 0
            h_in = jnp.where(
                (stage == 0) & (r_f == 0),
                lax.dynamic_index_in_dim(mbs, mfc, 0, keepdims=False),
                fwd_in,
            )
            # stash[(r, m mod Qv)]; slot V*Qv is the scratch absorber
            f_slot = jnp.where(
                f_valid, r_f * Qv + jnp.mod(mfc, Qv), V * Qv
            )
            stash = lax.dynamic_update_index_in_dim(stash, h_in, f_slot, 0)
            p_f = chunk_params(jnp.clip(r_f, 0, V - 1))
            y = run_chunk(p_f, h_in)
            # ---- backward slot: j_b = (c+stage+2) mod S; Q = ... -------
            t_ = c + stage + 2
            j_b = jnp.mod(t_, S)
            Q = (t_ - j_b) // S
            r_b = jnp.mod(-Q, V)
            g_b = (Q + r_b) // V - 2
            m_b = g_b * S + j_b
            b_valid = (g_b >= 0) & (m_b >= 0) & (m_b < M)
            mbc = jnp.clip(m_b, 0, M - 1)
            rbc = jnp.clip(r_b, 0, V - 1)
            t_mb = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(
                    a, mbc, 0, keepdims=False
                ),
                t_mbs,
            )
            if loss_has_aux:
                lval, loss_vjp, aux = jax.vjp(
                    loss_fn, lp, y, t_mb, has_aux=True
                )
            else:
                lval, loss_vjp, aux = (*jax.vjp(loss_fn, lp, y, t_mb), ())
            dlp_mb, g_loss, _ = loss_vjp(jnp.asarray(1.0 / M, lval.dtype))
            # last chunk (device S-1, ring V-1): loss vjp on the forward
            # output just produced (same m by construction) seeds its own
            # backward this mini-cycle.
            is_last_chunk = (stage == S - 1) & (rbc == V - 1)
            g_in = jnp.where(is_last_chunk, g_loss, bwd_in)
            b_slot = rbc * Qv + jnp.mod(mbc, Qv)
            h_b = lax.dynamic_index_in_dim(stash, b_slot, 0, keepdims=False)
            p_b = chunk_params(rbc)
            _, chunk_vjp = jax.vjp(run_chunk, p_b, h_b)
            dp_mb, dh = chunk_vjp(g_in)
            # scatter the chunk grads back into the local (V*Lp, ...) rows
            dp_acc = jax.tree_util.tree_map(
                lambda acc, g: lax.dynamic_update_slice_in_dim(
                    acc,
                    lax.dynamic_slice_in_dim(acc, rbc * Lp, Lp, 0)
                    + jnp.where(b_valid, g, 0).astype(acc.dtype),
                    rbc * Lp,
                    0,
                ),
                dp_acc,
                dp_mb,
            )
            last = b_valid & is_last_chunk
            dlp_acc = jax.tree_util.tree_map(
                lambda acc, g: acc + jnp.where(last, g, 0), dlp_acc, dlp_mb
            )
            loss_acc = loss_acc + jnp.where(last, lval / M, 0.0)
            aux_acc = jax.tree_util.tree_map(
                lambda acc, a: acc
                + jnp.where(last, a.astype(acc.dtype) / M, 0),
                aux_acc,
                aux,
            )
            dx_acc = lax.dynamic_update_index_in_dim(
                dx_acc,
                dh,
                jnp.where(b_valid & (stage == 0) & (rbc == 0), mbc, M),
                0,
            )
            return (
                stash,
                lax.ppermute(y, pipe_axis, fperm),
                lax.ppermute(dh, pipe_axis, bperm),
                dp_acc,
                dlp_acc,
                dx_acc,
                loss_acc,
                aux_acc,
            ), None

        init = (
            jnp.zeros(
                (V * Qv + 1, mb, *x_local.shape[1:]), x_local.dtype
            ),
            jnp.zeros_like(mbs[0]),
            jnp.zeros_like(mbs[0]),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), p_local
            ),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), lp
            ),
            jnp.zeros((M + 1, mb, *x_local.shape[1:]), x_local.dtype),
            jnp.zeros((), jnp.float32),
            aux_init,
        )
        carry, _ = lax.scan(cycle, init, jnp.arange(C))
        _, _, _, dp_acc, dlp_acc, dx_acc, loss_acc, aux_acc = carry
        stage = lax.axis_index(pipe_axis)
        loss = lax.pmean(
            lax.psum(jnp.where(stage == S - 1, loss_acc, 0.0), pipe_axis),
            batch_axis,
        )
        dp_acc = jax.tree_util.tree_map(
            lambda g: lax.pmean(g, batch_axis), dp_acc
        )
        dlp_acc = jax.tree_util.tree_map(
            lambda g: lax.pmean(lax.psum(g, pipe_axis), batch_axis), dlp_acc
        )
        dx = lax.psum(
            jnp.where(stage == 0, dx_acc[:M], jnp.zeros_like(dx_acc[:M])),
            pipe_axis,
        ).reshape(x_local.shape) / dp
        if loss_has_aux:
            aux_out = jax.tree_util.tree_map(
                lambda a: lax.pmean(
                    lax.psum(
                        jnp.where(stage == S - 1, a, jnp.zeros_like(a)),
                        pipe_axis,
                    ),
                    batch_axis,
                ),
                aux_acc,
            )
            return loss, dp_acc, dlp_acc, dx, aux_out
        return loss, dp_acc, dlp_acc, dx

    out_specs = (P(), param_specs, lp_specs, x_spec)
    if loss_has_aux:
        a_struct = _aux_structure(loss_fn, loss_params, x, targets, dp, M)
        out_specs = out_specs + (
            jax.tree_util.tree_map(lambda _: P(), a_struct),
        )
    fn = jax.shard_map(
        scheduled,
        mesh=mesh,
        in_specs=(x_spec, param_specs, lp_specs, t_specs),
        out_specs=out_specs,
        check_vma=False,  # manual collectives + Pallas custom_vjp inside
    )
    return fn(x, stacked_params, loss_params, targets)
