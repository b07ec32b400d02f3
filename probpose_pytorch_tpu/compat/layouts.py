"""Parameter layout conversions.

`attn_impl="fused_tp"` interprets the qkv projection's output columns in the
head-major packing ([h0(q|k|v) | h1(q|k|v) | ...]) so a Megatron column
shard hands each model-parallel device exactly its own heads' packed qkv
(ops/pallas/attention_kernel.py:_qkv_offsets). Checkpoints trained with the
default "qkv_major" layout ([q | k | v], heads h-major within each — the
torch/timm `Dense(3C)` + `reshape(B,N,3,H,d)` order) convert losslessly by
permuting the qkv kernel columns and bias entries; every other parameter is
layout-invariant (the attention context is h-major in both layouts, so the
proj matrix needs no change).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "convert_qkv_layout",
    "convert_trunk_layout",
    "qkv_head_major_permutation",
    "qkv_to_head_major",
    "qkv_to_qkv_major",
    "stack_vit_blocks",
    "unstack_vit_blocks",
]


def qkv_head_major_permutation(embed_dim: int, num_heads: int) -> np.ndarray:
    """perm such that head_major[i] = qkv_major[perm[i]] over the 3C dim."""
    d = embed_dim // num_heads
    # qkv_major index of (t, h, j) is t*C + h*d + j; enumerate in
    # head-major order (h, t, j).
    idx = np.arange(3 * embed_dim).reshape(3, num_heads, d)
    return np.transpose(idx, (1, 0, 2)).reshape(-1)


def _permute_qkv(params: Any, num_heads: int, invert: bool) -> Any:
    import jax

    def perm_for(C: int) -> np.ndarray:
        perm = qkv_head_major_permutation(C, num_heads)
        return np.argsort(perm) if invert else perm

    def convert(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(names)
        # Stacked (pipeline-parallel) trunk layout: flat leaf names with a
        # leading depth axis (models/vit.py:_StackedBlockParams).
        if names[-1] == "qkv_kernel" and leaf.ndim == 3:
            return leaf[:, :, perm_for(leaf.shape[1])]
        if names[-1] == "qkv_bias" and leaf.ndim == 2:
            return leaf[:, perm_for(leaf.shape[1] // 3)]
        if "attn" not in joined or "qkv" not in joined:
            return leaf
        # LoRA delta on qkv (models/lora.py): b's columns live in the same
        # 3C packing as the qkv kernel's and permute identically; a is
        # layout-invariant (input-side).
        if "qkv_lora" in names and names[-1] == "b" and leaf.ndim == 2:
            return leaf[:, perm_for(leaf.shape[1] // 3)]
        if "qkv_lora" in names:
            return leaf
        if names[-1] == "kernel" and leaf.ndim == 2:
            return leaf[:, perm_for(leaf.shape[0])]
        if names[-1] == "bias" and leaf.ndim == 1:
            return leaf[perm_for(leaf.shape[0] // 3)]
        return leaf

    return jax.tree_util.tree_map_with_path(convert, params)


def qkv_to_head_major(params: Any, num_heads: int) -> Any:
    """Convert a param tree's attention qkv kernels/biases from the default
    qkv_major layout to head_major (for `attn_impl="fused_tp"`)."""
    return _permute_qkv(params, num_heads, invert=False)


def qkv_to_qkv_major(params: Any, num_heads: int) -> Any:
    """Inverse of `qkv_to_head_major`."""
    return _permute_qkv(params, num_heads, invert=True)


def stack_vit_blocks(backbone_params: Any) -> Any:
    """Convert a ViTBackbone param (sub)tree from the per-block layout
    (block0..block{D-1} subtrees) to the stacked pipeline-parallel layout
    (one "blocks" subtree, every leaf with a leading depth axis) — the
    parameterization `ViTBackbone(pp_stages>1)` declares. Non-block entries
    (patch_embed, pos_embed, norm, adapters) pass through unchanged.
    Accepts numpy or jax leaves; works on any params-shaped tree (EMA,
    optimizer moments) holding the same structure.
    """
    from probpose_pytorch_tpu.models.vit import BLOCK_LEAF_PATHS

    out = {k: v for k, v in backbone_params.items() if not _is_block_key(k)}
    block_keys = sorted(
        (k for k in backbone_params if _is_block_key(k)),
        key=lambda k: int(k[len("block"):]),
    )
    if not block_keys:
        return backbone_params
    flat = {}
    for name, path in BLOCK_LEAF_PATHS.items():
        leaves = []
        for k in block_keys:
            node = backbone_params[k]
            for p in path:
                node = node[p]
            leaves.append(np.asarray(node))
        flat[name] = np.stack(leaves, axis=0)
    out["blocks"] = flat
    return out


def unstack_vit_blocks(backbone_params: Any) -> Any:
    """Inverse of `stack_vit_blocks`."""
    from probpose_pytorch_tpu.models.vit import BLOCK_LEAF_PATHS

    if "blocks" not in backbone_params:
        return backbone_params
    out = {k: v for k, v in backbone_params.items() if k != "blocks"}
    flat = backbone_params["blocks"]
    depth = np.asarray(next(iter(flat.values()))).shape[0]
    for i in range(depth):
        tree: dict = {}
        for name, path in BLOCK_LEAF_PATHS.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = np.asarray(flat[name])[i]
        out[f"block{i}"] = tree
    return out


def _is_block_key(key: str) -> bool:
    return (
        key.startswith("block")
        and key != "blocks"
        and key[len("block"):].isdigit()
    )


def convert_trunk_layout(tree: Any, src: str, dst: str) -> Any:
    """Convert every ViT trunk found anywhere in a pytree between the
    per-block ("per_block": block0..block{D-1} subtrees) and stacked
    ("stacked": one "blocks" subtree, leading depth axis) layouts.

    Works on whole TrainStates: trunk subtrees are located structurally (a
    dict holding block{i} keys or a "blocks" key), so params, EMA, and the
    optimizer's Adam moments convert wherever they nest — a cross-layout
    resume stays numerically exact. No-op when src == dst.
    """
    if src == dst:
        return tree
    if {src, dst} != {"per_block", "stacked"}:
        raise ValueError(f"unknown trunk layout conversion {src!r} -> {dst!r}")
    import jax

    def is_trunk(node: Any) -> bool:
        return isinstance(node, dict) and (
            "blocks" in node or any(_is_block_key(k) for k in node)
        )

    def convert(node: Any) -> Any:
        if not is_trunk(node):
            return node
        return (
            stack_vit_blocks(node)
            if dst == "stacked"
            else unstack_vit_blocks(node)
        )

    return jax.tree_util.tree_map(convert, tree, is_leaf=is_trunk)


def convert_qkv_layout(
    tree: Any, num_heads: int, src: str, dst: str
) -> Any:
    """Convert any params-shaped pytree (params, EMA, optimizer moments — a
    whole TrainState works: the path filter matches the attn/qkv leaves
    wherever they nest) between qkv layouts. No-op when src == dst."""
    if src == dst:
        return tree
    if (src, dst) == ("qkv_major", "head_major"):
        return qkv_to_head_major(tree, num_heads)
    if (src, dst) == ("head_major", "qkv_major"):
        return qkv_to_qkv_major(tree, num_heads)
    raise ValueError(f"unknown qkv layout conversion {src!r} -> {dst!r}")
