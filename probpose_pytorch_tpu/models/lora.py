"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

Greenfield superset (SURVEY.md §2.4 — the reference's only fine-tuning
control is a frozen backbone + MLP adapter, backbone.py:10-21). LoRA keeps
the pretrained projection weights frozen and learns a rank-r update
ΔW = (α/r)·A·B per projection (qkv, attn proj, fc1, fc2), cutting trainable
backbone state from O(C²·depth) to O(C·r·depth) — the standard recipe for
fine-tuning imported RADIO/ViTPose checkpoints without touching them.

TPU notes: the delta is computed activation-side ((x·A)·B, two skinny
matmuls in the compute dtype) rather than weight-side (W + AB), so the big
base matmul stays a single MXU-friendly op and XLA fuses the rank-r path
alongside it. B initializes to zero, so enabling LoRA on a checkpoint is
output-identical at step 0 (tested). `merge_lora_params` folds the learned
deltas back into the base kernels for deployment (bundles/export see a
standard checkpoint).

Train only the LoRA (+head) parameters with `TrainConfig.train_lora_only`,
which masks everything else to zero updates via optax.multi_transform
(train/state.py:make_optimizer).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["LoRADelta", "lora_frozen_labels", "merge_lora_params"]


class LoRADelta(nn.Module):
    """Rank-r delta for a Dense layer: returns (α/r)·(x·A)·B.

    Added to the base projection's OUTPUT (activation-side form); params
    live beside the base layer as `<layer>_lora/{a, b}`. B starts at zero,
    so the delta is exactly 0 at init.
    """

    features: int
    rank: int
    alpha: float = 16.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param(
            "a",
            nn.initializers.normal(0.02),
            (x.shape[-1], self.rank),
            jnp.float32,
        )
        b = self.param(
            "b",
            nn.initializers.zeros,
            (self.rank, self.features),
            jnp.float32,
        )
        scale = self.alpha / self.rank
        return ((x @ a.astype(self.dtype)) @ b.astype(self.dtype)) * scale


def lora_frozen_labels(params: Any) -> Any:
    """Label params for optax.multi_transform under LoRA-only fine-tuning:
    LoRA deltas and the head train; everything else freezes. Pass the
    FUNCTION itself as `make_optimizer(..., frozen_labels=lora_frozen_labels)`
    — optax resolves callable label pytrees lazily against the params."""
    import jax.tree_util as jtu

    def label(path, _leaf):
        keys = [
            p.key for p in path if isinstance(p, jtu.DictKey)
        ]
        if any("lora" in str(k) for k in keys):
            return "trainable"
        if keys and str(keys[0]) == "head":
            return "trainable"
        return "frozen"

    return jtu.tree_map_with_path(label, params)


def merge_lora_params(params: Any, alpha: float) -> Any:
    """Fold every `<layer>_lora/{a, b}` delta into its sibling base kernel
    (kernel += (α/r)·A·B) and strip the LoRA parameters. Returns a standard
    checkpoint tree for deployment; outputs match the unmerged model to
    compute-dtype rounding (the delta moves from activation-side bf16
    matmuls into the f32 kernel).

    `alpha` is REQUIRED and must be the `ModelConfig.lora_alpha` the deltas
    were trained with — it is not recoverable from the tree, and a silent
    default would mis-scale every delta (the compat/merge_lora.py CLI
    threads it from the run config)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k.endswith("_lora"):
                continue
            out[k] = walk(v)
        for k, v in node.items():
            if not k.endswith("_lora"):
                continue
            base = k[: -len("_lora")]
            if base not in out or "kernel" not in out[base]:
                raise ValueError(
                    f"LoRA params {k!r} have no sibling {base}/kernel"
                )
            a = np.asarray(v["a"], np.float32)
            b = np.asarray(v["b"], np.float32)
            rank = a.shape[-1]
            kernel = np.asarray(out[base]["kernel"], np.float32)
            out[base] = dict(out[base])
            out[base]["kernel"] = jnp.asarray(
                kernel + (alpha / rank) * (a @ b)
            )
        return out

    return walk(params)
