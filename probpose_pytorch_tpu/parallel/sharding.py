"""Sharding rules: how params and batches lay out on the (data, model) mesh.

Tensor-parallel layout for the ViT (the standard Megatron-style split,
expressed as GSPMD shardings rather than explicit collectives):

  * attention qkv kernel (C, 3C): split the fused output dim -> each model
    shard owns a head subset; the following proj kernel (C, C) splits its
    *input* dim so the block ends in a partial-sum that GSPMD all-reduces.
  * MLP fc1 (C, hidden): split output; fc2 (hidden, C): split input.
  * everything else (LayerNorms, pos embed, head branches) is replicated.
  * batches shard over the "data" axis on their leading dim.

XLA then inserts psum over "model" inside each block and psum over "data"
for gradients — the collectives ride ICI without any hand-written NCCL-style
code (the reference has none to mirror; SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.tree_util as jtu
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "param_shardings",
    "batch_sharding",
    "head_batch_spec",
    "shard_params",
    "shard_batch",
    "opt_state_shardings",
    "shard_opt_state",
]


def head_batch_spec(mesh: Mesh | None, batch_size: int) -> P | None:
    """Batch PartitionSpec that data-parallelizes over EVERY mesh axis.

    Model- and pipeline-parallel meshes shard only the trunk; everything
    after it (the ProbMapHead, losses) holds replicated params, so under a
    plain P("data") batch the non-data axes would recompute the head
    redundantly on every shard. Resharding the trunk's output to
    P(("data", "model", "pipe")) instead splits that work across the whole
    mesh — the feature map is small (B x H/16 x W/16 x C), so the reshard
    is cheap next to head compute it deduplicates. Returns None (no
    constraint) when every non-data axis has size 1 or the batch does not
    divide the full mesh.
    """
    if mesh is None:
        return None
    shape = dict(mesh.shape)
    extra = tuple(
        ax for ax in mesh.axis_names if ax != "data" and shape[ax] > 1
    )
    if not extra:
        return None
    total = np.prod([shape[ax] for ax in ("data", *extra)])
    if batch_size % int(total):
        return None
    return P(("data", *extra))


def _param_spec(path: tuple, leaf: Any, axes: tuple = ()) -> P:
    names = [str(getattr(p, "key", p)) for p in path]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    if "blocks" in names:
        # Stacked pipeline-parallel trunk params (models/vit.py
        # _StackedBlockParams): leading depth axis shards over "pipe";
        # with a model axis alongside, the Megatron dims shard too
        # (mirrors models/vit.py:stacked_param_specs — the in_specs the
        # pipeline's shard_map consumes, so device_put places the leaves
        # exactly where the pipeline reads them).
        if "pipe" not in axes:
            return P()
        if "model" in axes:
            name = names[-1]
            if name in ("qkv_kernel", "fc1_kernel"):
                return P("pipe", None, "model")
            if name in ("qkv_bias", "fc1_bias"):
                return P("pipe", "model")
            if name in ("proj_kernel", "fc2_kernel"):
                return P("pipe", "model", None)
        return P("pipe")
    if "attn" in joined and names[-1] == "kernel" and ndim == 2:
        if "qkv" in joined:
            return P(None, "model")
        if "proj" in joined:
            return P("model", None)
    if "mlp" in joined and names[-1] == "kernel" and ndim == 2:
        if "fc1" in joined:
            return P(None, "model")
        if "fc2" in joined:
            return P("model", None)
    if "mlp" in joined and names[-1] == "bias" and "fc1" in joined and ndim == 1:
        return P("model")
    if "attn" in joined and names[-1] == "bias" and "qkv" in joined and ndim == 1:
        return P("model")
    return P()  # replicated


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a param/variable pytree."""
    return jtu.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_spec(path, leaf, mesh.axis_names)
        ),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data-parallel sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jtu.tree_map(lambda x: jax.device_put(x, sh), batch)


def opt_state_shardings(opt_state: Any, mesh: Mesh, min_size: int = 1024) -> Any:
    """ZeRO-1-style optimizer-state sharding over the data axis.

    Under pure data parallelism the params are replicated but the Adam
    moments need not be: each moment leaf's largest divisible axis is
    sharded over "data", cutting optimizer memory by ~1/dp per device. XLA
    then computes the (already all-reduced) gradient's moment update
    shard-locally and all-gathers only the parameter delta — the GSPMD
    rendering of ZeRO-1 (no hand-written collectives; the scaling-book
    recipe). Leaves smaller than `min_size` elements (scheduler counts,
    scalars) stay replicated — sharding them would cost more in collective
    latency than it saves.

    dp-only meshes (model == pipe == 1): with tensor- or pipeline-parallel
    params the moments inherit those layouts instead (Trainer.create guards
    this).
    """
    dp = dict(mesh.shape).get("data", 1)

    def spec(leaf) -> P:
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0 or getattr(leaf, "size", 0) < min_size:
            return P()
        dims = sorted(
            range(ndim), key=lambda i: leaf.shape[i], reverse=True
        )
        for i in dims:
            if leaf.shape[i] % dp == 0 and leaf.shape[i] >= dp:
                axes: list = [None] * ndim
                axes[i] = "data"
                return P(*axes)
        return P()

    return jtu.tree_map(
        lambda leaf: NamedSharding(mesh, spec(leaf)), opt_state
    )


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    return jax.device_put(opt_state, opt_state_shardings(opt_state, mesh))
