"""Vision Transformer backbone, TPU-native (flax.linen).

Fills the role of the reference's timm-based `ScratchViTBackbone`
(/root/reference/probpose/backbone.py:23-40): image -> NHWC spatial feature
grid with no class token and no pooling. Design differences for TPU:

* NHWC layout end to end; matmuls run in a configurable compute dtype
  (bfloat16 by default) with float32 params and float32 LayerNorm/softmax.
* Attention and MLP are explicit einsums so sharding constraints can be
  attached (see parallel/sharding.py); the ViT-S geometry (embed 384,
  depth 12, mlp ratio 4) matches the reference's trained config
  (train.py:40-43 uses timm embed_dim=384 at 384x384/p16).
* `jax.checkpoint`-friendly: blocks are scanned-free plain modules so XLA can
  fuse; remat is applied at the train-step level when enabled.
"""

from __future__ import annotations

import os
from dataclasses import field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "ViTBackbone",
    "ViTConfig",
    "tp_block_apply",
    "stacked_param_specs",
    "pp_block_fns",
]


def _fused_kernels_enabled() -> bool:
    """The Pallas kernels run natively on TPU; off-TPU they are exercised in
    interpret mode only when PROBPOSE_PALLAS_INTERPRET=1 (tests and the
    driver's virtual-mesh dryrun set it — interpret mode is far too slow to
    be a default CPU path)."""
    return (
        jax.default_backend() == "tpu"
        or os.environ.get("PROBPOSE_PALLAS_INTERPRET", "") == "1"
    )


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    # tanh-approximate gelu is the TPU-fast default; imported torch/timm
    # checkpoints (incl. RADIO) were trained with the exact erf form.
    exact_gelu: bool = False
    lora_rank: int = 0  # rank-r LoRA deltas on fc1/fc2 (models/lora.py)
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        if self.lora_rank:
            from probpose_pytorch_tpu.models.lora import LoRADelta

            h = h + LoRADelta(
                self.hidden_dim, self.lora_rank, self.lora_alpha,
                dtype=self.dtype, name="fc1_lora",
            )(x)
        h = nn.gelu(h, approximate=not self.exact_gelu)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)
        if self.lora_rank:
            from probpose_pytorch_tpu.models.lora import LoRADelta

            out = out + LoRADelta(
                self.out_dim, self.lora_rank, self.lora_alpha,
                dtype=self.dtype, name="fc2_lora",
            )(h)
        return out


class Attention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    softmax_dtype: jnp.dtype = jnp.float32
    # "fused": packed-layout Pallas kernel with recompute VJP (training +
    # serving; f32 softmax in VMEM, no (B,h,N,N) HBM traffic, no transposes).
    # "fused_tp": same kernel on the head-major qkv layout — the Megatron
    # column-shard of the qkv projection then hands each model shard its own
    # heads' packed blocks, so the kernel tensor-parallelizes via shard_map
    # over (data, model) with zero added collectives. Parameters are
    # SEMANTICALLY head-major in this mode (convert imported checkpoints
    # with compat.qkv_to_head_major).
    # "einsum": XLA formulation. "pallas": legacy flat-layout kernel
    # (forward-only, needs transposes; kept for comparison).
    impl: str = "einsum"
    # Device mesh for the fused kernel under data parallelism: shard_map
    # runs the kernel per-device on its local batch shard (a bare pallas_call
    # has no GSPMD rule and would be fed a replicated batch). None =
    # single-device. Tensor parallelism (model axis > 1) must use "einsum".
    mesh: Any = None
    lora_rank: int = 0  # rank-r LoRA deltas on qkv/proj (models/lora.py)
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        if self.lora_rank:
            # Activation-side delta: the (x·A)·B columns follow whatever
            # packing the base qkv kernel uses (qkv-major or head-major),
            # so LoRA composes with every attn_impl unchanged; layout
            # conversions permute lora b like the kernel columns
            # (compat/layouts.py).
            from probpose_pytorch_tpu.models.lora import LoRADelta

            qkv = qkv + LoRADelta(
                3 * C, self.lora_rank, self.lora_alpha,
                dtype=self.dtype, name="qkv_lora",
            )(x)

        def project(out):
            y = nn.Dense(C, dtype=self.dtype, name="proj")(out)
            if self.lora_rank:
                from probpose_pytorch_tpu.models.lora import LoRADelta

                y = y + LoRADelta(
                    C, self.lora_rank, self.lora_alpha,
                    dtype=self.dtype, name="proj_lora",
                )(out)
            return y
        if self.impl in ("fused", "fused_tp") and _fused_kernels_enabled():
            # Packed-layout VMEM kernel with recompute VJP: f32 softmax at
            # better-than-bf16-einsum speed (54.9% MFU fwd / 64.7% fwd+bwd at
            # ViT-S B=256 vs 39.5%/39.8% einsum — docs/PERF.md). On a
            # data-parallel mesh the kernel rides shard_map over the batch
            # axis; "fused_tp" additionally shard_maps heads over the model
            # axis (head-major qkv layout).
            from probpose_pytorch_tpu.ops.pallas import (
                packed_attention,
                sharded_packed_attention,
            )

            shape = dict(self.mesh.shape) if self.mesh is not None else {}
            data_size = shape.get("data", 1)
            model_size = shape.get("model", 1)
            layout = "head_major" if self.impl == "fused_tp" else "qkv_major"
            # Batches that don't divide the data axis (model.init's B=1
            # sample, sub-mesh serving buckets) skip batch sharding —
            # B is static, so this resolves at trace time.
            batch_axis = (
                "data" if data_size > 1 and B % data_size == 0 else None
            )
            if self.impl == "fused_tp" and model_size > 1:
                out = sharded_packed_attention(
                    qkv,
                    self.num_heads,
                    self.mesh,
                    axis=batch_axis,
                    model_axis="model",
                )
            elif batch_axis is not None:
                out = sharded_packed_attention(
                    qkv,
                    self.num_heads,
                    self.mesh,
                    axis=batch_axis,
                    layout=layout,
                )
            else:
                out = packed_attention(
                    qkv, self.num_heads, layout=layout
                )
            return project(out)
        if self.impl == "fused_tp":
            # head-major einsum fallback (off-TPU without interpret mode):
            # same parameter semantics as the kernel path.
            qkv = qkv.reshape(B, N, self.num_heads, 3, head_dim)
            q, k, v = jnp.moveaxis(qkv, 3, 0)
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = jnp.moveaxis(qkv, 2, 0)
        if self.impl == "pallas":
            # Fused VMEM attention (ops/pallas/attention_kernel.py): never
            # materializes the (B, h, N, N) matrix in HBM; f32 scores at
            # bf16-softmax speed. Forward-only — use for serving.
            from probpose_pytorch_tpu.ops.pallas import fused_attention

            out = fused_attention(q, k, v, group=16).reshape(B, N, C)
            return project(out)
        scale = 1.0 / np.sqrt(head_dim)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        # f32 softmax is the safe default for training; serving configs set
        # softmax_dtype=bf16 — the f32 cast round-trips the (B,h,N,N) matrix
        # through HBM and costs ~20% of backbone time at 192 tokens.
        attn = jax.nn.softmax(attn.astype(self.softmax_dtype), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return project(out)


class _LayerNormParams(nn.Module):
    """Declares LayerNorm params without computing — used by the fused
    LN+MLP kernel path so its parameter tree stays byte-identical to the
    nn.LayerNorm/nn.Dense modules of the XLA path (checkpoints interchange)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32),
        )


class _DenseParams(nn.Module):
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (self.din, self.dout),
                jnp.float32,
            ),
            self.param("bias", nn.initializers.zeros, (self.dout,), jnp.float32),
        )


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        k1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        k2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return k1, b1, k2, b2


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.bfloat16
    softmax_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"  # "fused" = VMEM LN+MLP+residual kernel on TPU
    exact_gelu: bool = False
    mesh: Any = None  # for shard_map-wrapped fused attention under dp
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(
            self.num_heads,
            dtype=self.dtype,
            softmax_dtype=self.softmax_dtype,
            impl=self.attn_impl,
            mesh=self.mesh,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            name="attn",
        )(y)
        if self.mlp_impl == "fused" and jax.default_backend() == "tpu":
            # One VMEM pass for LN2 -> fc1 -> gelu -> fc2 -> +x: the (R, 4C)
            # hidden state and the f32 LN output never touch HBM
            # (ops/pallas/mlp_kernel.py; recompute backward via custom_vjp).
            from probpose_pytorch_tpu.ops.pallas import fused_ln_mlp

            scale, bias = _LayerNormParams(C, name="norm2")()
            k1, b1, k2, b2 = _MlpParams(
                C, int(C * self.mlp_ratio), name="mlp"
            )()
            B, N, _ = x.shape
            out = fused_ln_mlp(
                x.reshape(B * N, C),
                scale,
                bias,
                k1.astype(self.dtype),
                b1,
                k2.astype(self.dtype),
                b2,
                self.exact_gelu,
            )
            return out.reshape(B, N, C)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + MlpBlock(
            int(C * self.mlp_ratio), C, dtype=self.dtype,
            exact_gelu=self.exact_gelu, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, name="mlp",
        )(y)
        return x


def _layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """f32 LayerNorm matching nn.LayerNorm(dtype=float32) numerics
    (single-pass moments, eps 1e-6) for the pure-function TP block."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def tp_block_apply(
    p: dict,
    h: jax.Array,
    *,
    heads: int,
    dtype: jnp.dtype,
    softmax_dtype: jnp.dtype = jnp.float32,
    exact_gelu: bool = False,
    model_axis: str | None = None,
    vjp_boundaries: bool = False,
) -> jax.Array:
    """One transformer block as a pure function over flat stacked-layout
    params (BLOCK_LEAF_PATHS names, depth axis already indexed away) with
    explicit Megatron tensor-parallel collectives.

    Runs inside the pipeline's shard_map where GSPMD cannot insert the
    collectives itself: qkv/fc1 kernels are column-sharded over `model_axis`
    (head-major qkv packing — each shard's columns are whole heads' [q|k|v]
    packs), proj/fc2 kernels are row-sharded, and the two row-parallel
    matmul outputs are psum-ed over `model_axis` before their (replicated)
    bias adds. `heads` is the LOCAL head count; with `model_axis=None` and
    full-width params this is exactly the sequential block (the collective-
    free form pipeline_spmd's fallback paths use). Numerics mirror `Block`
    with attn_impl='fused_tp': f32 LayerNorms, matmuls in `dtype`, packed
    Pallas attention on TPU / head-major einsum elsewhere.

    vjp_boundaries=True emits the Megatron f/g boundary form (tp_enter /
    tp_leave from parallel/pipeline.py — same forward, custom backward
    collectives) that pipeline_1f1b's in-scan jax.vjp requires; the default
    bare-psum form is what autodiff THROUGH shard_map (the GPipe path)
    transposes correctly on its own.
    """
    if vjp_boundaries and model_axis is not None:
        from probpose_pytorch_tpu.parallel.pipeline import tp_enter, tp_leave

        enter = lambda a: tp_enter(a, model_axis)
        leave = lambda a: tp_leave(a, model_axis)
    else:
        enter = lambda a: a
        leave = (
            (lambda a: jax.lax.psum(a, model_axis))
            if model_axis is not None
            else (lambda a: a)
        )
    y = _layernorm(h, p["norm1_scale"], p["norm1_bias"]).astype(dtype)
    qkv = enter(y) @ p["qkv_kernel"].astype(dtype) + p["qkv_bias"].astype(
        dtype
    )
    if _fused_kernels_enabled():
        from probpose_pytorch_tpu.ops.pallas import packed_attention

        ctx = packed_attention(qkv, heads, layout="head_major")
    else:
        B, N, C3l = qkv.shape
        d = C3l // (3 * heads)
        q, k, v = jnp.moveaxis(qkv.reshape(B, N, heads, 3, d), 3, 0)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (1.0 / np.sqrt(d))
        attn = jax.nn.softmax(attn.astype(softmax_dtype), axis=-1).astype(
            dtype
        )
        ctx = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, heads * d)
    out = leave(ctx @ p["proj_kernel"].astype(dtype))
    h = h + (out + p["proj_bias"].astype(dtype))
    y = _layernorm(h, p["norm2_scale"], p["norm2_bias"]).astype(dtype)
    a = enter(y) @ p["fc1_kernel"].astype(dtype) + p["fc1_bias"].astype(
        dtype
    )
    a = nn.gelu(a, approximate=not exact_gelu)
    out = leave(a @ p["fc2_kernel"].astype(dtype))
    return h + (out + p["fc2_bias"].astype(dtype))


def pp_block_fns(
    *,
    num_heads: int,
    mlp_ratio: float,
    embed_dim: int,
    dtype: jnp.dtype,
    softmax_dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "einsum",
    mlp_impl: str = "dense",
    exact_gelu: bool = False,
    tp: int = 1,
    remat: bool = False,
    vjp_boundaries: bool = False,
):
    """(block_fn, seq_block_fn, param_specs) for the stacked pipeline trunk.

    The single source of the per-stage block application used by BOTH
    pipeline engines: ViTBackbone._pp_trunk (GPipe, autodiff through
    shard_map — bare-psum TP collectives) and the Trainer's 1F1B step
    (in-scan jax.vjp — pass vjp_boundaries=True so the TP block emits the
    tp_enter/tp_leave Megatron boundary form pipeline_1f1b requires).

    tp == 1 returns (Block.apply over the unstacked tree, same, None);
    tp > 1 returns the tp_block_apply pair plus stacked_param_specs().
    """
    hidden = int(embed_dim * mlp_ratio)
    if tp > 1:
        if attn_impl != "fused_tp":
            raise ValueError(
                "tensor parallelism inside a pipeline stage requires "
                f"attn_impl='fused_tp' (got {attn_impl!r}); the "
                "head-major qkv packing is what the model-axis column "
                "shard slices into whole heads"
            )
        if num_heads % tp or hidden % tp:
            raise ValueError(
                f"heads ({num_heads}) and mlp hidden ({hidden}) must "
                f"divide the model axis ({tp})"
            )
        if mlp_impl == "fused":
            raise ValueError(
                "mlp_impl='fused' does not compose with tensor "
                "parallelism inside a pipeline stage"
            )
        kw = dict(
            dtype=dtype, softmax_dtype=softmax_dtype, exact_gelu=exact_gelu
        )

        def block_fn(pflat, h):
            return tp_block_apply(
                pflat, h, heads=num_heads // tp, model_axis="model",
                vjp_boundaries=vjp_boundaries, **kw,
            )

        def seq_block_fn(pflat, h):
            return tp_block_apply(
                pflat, h, heads=num_heads, model_axis=None, **kw
            )

        if remat:
            block_fn = jax.checkpoint(block_fn)
            seq_block_fn = jax.checkpoint(seq_block_fn)
        return block_fn, seq_block_fn, stacked_param_specs()

    block = Block(
        num_heads,
        mlp_ratio,
        dtype=dtype,
        softmax_dtype=softmax_dtype,
        attn_impl="einsum" if attn_impl == "pallas" else attn_impl,
        mlp_impl=mlp_impl,
        exact_gelu=exact_gelu,
        mesh=None,
    )

    def block_fn(pflat, h):
        return block.apply({"params": _block_tree(pflat)}, h)

    if remat:
        block_fn = jax.checkpoint(block_fn)
    return block_fn, block_fn, None


def stacked_param_specs(pipe_axis: str = "pipe", model_axis: str = "model"):
    """PartitionSpecs for the stacked trunk layout under pipeline + tensor
    parallelism: depth over `pipe_axis`; Megatron dims over `model_axis`
    (qkv/fc1 column-sharded, proj/fc2 row-sharded, norms/biases of
    row-parallel outputs replicated). Keys = BLOCK_LEAF_PATHS names."""
    from jax.sharding import PartitionSpec as P

    return {
        "norm1_scale": P(pipe_axis),
        "norm1_bias": P(pipe_axis),
        "qkv_kernel": P(pipe_axis, None, model_axis),
        "qkv_bias": P(pipe_axis, model_axis),
        "proj_kernel": P(pipe_axis, model_axis, None),
        "proj_bias": P(pipe_axis),
        "norm2_scale": P(pipe_axis),
        "norm2_bias": P(pipe_axis),
        "fc1_kernel": P(pipe_axis, None, model_axis),
        "fc1_bias": P(pipe_axis, model_axis),
        "fc2_kernel": P(pipe_axis, model_axis, None),
        "fc2_bias": P(pipe_axis),
    }


# Flat-name <-> Block-param-tree mapping for the stacked (pipeline-parallel)
# trunk parameterization. Kept module-level so compat/layouts.py converts
# checkpoints between the per-block and stacked layouts with the same table.
BLOCK_LEAF_PATHS = {
    "norm1_scale": ("norm1", "scale"),
    "norm1_bias": ("norm1", "bias"),
    "qkv_kernel": ("attn", "qkv", "kernel"),
    "qkv_bias": ("attn", "qkv", "bias"),
    "proj_kernel": ("attn", "proj", "kernel"),
    "proj_bias": ("attn", "proj", "bias"),
    "norm2_scale": ("norm2", "scale"),
    "norm2_bias": ("norm2", "bias"),
    "fc1_kernel": ("mlp", "fc1", "kernel"),
    "fc1_bias": ("mlp", "fc1", "bias"),
    "fc2_kernel": ("mlp", "fc2", "kernel"),
    "fc2_bias": ("mlp", "fc2", "bias"),
}


def _block_tree(flat: dict) -> dict:
    """Assemble one Block's nested param tree from flat stacked-leaf names."""
    tree: dict = {}
    for name, path in BLOCK_LEAF_PATHS.items():
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = flat[name]
    return tree


class _StackedBlockParams(nn.Module):
    """Declares all `depth` transformer blocks' parameters stacked along a
    leading depth axis (leaf shapes (depth, ...)) — the layout pipeline
    parallelism shards over the mesh "pipe" axis. Kernel initializers draw
    per-block (vmapped over split keys) so distributions match the
    per-block modules; convert checkpoints between layouts with
    compat.stack_vit_blocks / unstack_vit_blocks."""

    depth: int
    dim: int
    hidden: int

    @nn.compact
    def __call__(self) -> dict:
        D, C, H = self.depth, self.dim, self.hidden

        def stacked(base):
            def init(key, shape, dtype=jnp.float32):
                keys = jax.random.split(key, shape[0])
                return jax.vmap(lambda k: base(k, shape[1:], dtype))(keys)

            return init

        kern = stacked(nn.initializers.lecun_normal())
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        shapes = {
            "norm1_scale": (ones, (D, C)),
            "norm1_bias": (zeros, (D, C)),
            "qkv_kernel": (kern, (D, C, 3 * C)),
            "qkv_bias": (zeros, (D, 3 * C)),
            "proj_kernel": (kern, (D, C, C)),
            "proj_bias": (zeros, (D, C)),
            "norm2_scale": (ones, (D, C)),
            "norm2_bias": (zeros, (D, C)),
            "fc1_kernel": (kern, (D, C, H)),
            "fc1_bias": (zeros, (D, H)),
            "fc2_kernel": (kern, (D, H, C)),
            "fc2_bias": (zeros, (D, C)),
        }
        return {
            name: self.param(name, init, shape, jnp.float32)
            for name, (init, shape) in shapes.items()
        }


class ViTConfig:
    """Static geometry presets (ViTPose-style sizes)."""

    PRESETS = {
        "vit-s": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0),
        "vit-b": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0),
        "vit-l": dict(embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0),
        # ViTPose-H geometry: the depth-32 trunk is the natural pipeline-
        # parallelism user (divides pipe axes 2/4/8; parallel/pipeline.py).
        "vit-h": dict(embed_dim=1280, depth=32, num_heads=16, mlp_ratio=4.0),
        # timm's VisionTransformer(embed_dim=384) default keeps 12 heads —
        # the reference backbone's actual geometry (backbone.py:26-33).
        "vit-s-timm": dict(embed_dim=384, depth=12, num_heads=12, mlp_ratio=4.0),
        # Tiny debug geometry for CPU smokes / multi-process dryruns.
        "vit-nano": dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0),
    }


class ViTBackbone(nn.Module):
    """ViT backbone producing an NHWC feature grid.

    Args:
        img_size: (H, W) input image size (static).
        patch_size: patch edge in pixels.
        embed_dim / depth / num_heads / mlp_ratio: transformer geometry.
        dtype: compute dtype for matmuls (params stay float32).
        frozen: stop gradients through the trunk (the RADIO-style frozen
            backbone mode, reference backbone.py:10-12); an optional trainable
            MLP adapter over tokens mirrors backbone.py:15-21.
        adapter_hidden: hidden widths of the token MLP adapter ([] = none).
        num_prefix_tokens: learned non-spatial tokens (class/summary/register)
            prepended to the patch sequence. They participate in attention in
            every block and are stripped before the grid reshape — required
            for faithful RADIO-checkpoint import, whose summary tokens shape
            the patch features through attention. Any positional embedding
            the source model adds to its prefix tokens is folded into the
            learned token values at import time (additive constants compose).
        exact_gelu: use erf gelu (torch/timm parity) instead of the
            TPU-fast tanh approximation.
    """

    img_size: tuple[int, int] = (256, 192)
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    softmax_dtype: jnp.dtype = jnp.float32
    frozen: bool = False
    adapter_hidden: Sequence[int] = ()
    remat: bool = False  # rematerialize blocks (memory <- FLOPs trade)
    attn_impl: str = "einsum"  # "fused" = packed Pallas attention on TPU
    mlp_impl: str = "dense"  # "fused" = VMEM LN+MLP+residual kernel on TPU
    num_prefix_tokens: int = 0
    exact_gelu: bool = False
    # Device mesh for shard_map-wrapping the fused attention kernel under
    # data parallelism (build_model threads it from Trainer.create).
    mesh: Any = None
    # Pipeline parallelism (parallel/pipeline.py): split the `depth` blocks
    # into pp_stages contiguous stages over the mesh "pipe" axis, block
    # params stacked along a leading depth axis (checkpoints interchange via
    # compat.stack_vit_blocks/unstack_vit_blocks). 0 microbatches = auto.
    pp_stages: int = 1
    pp_microbatches: int = 0
    # LoRA fine-tuning (models/lora.py): rank-r deltas on qkv/proj/fc1/fc2.
    # Composes with attn_impl 'einsum'/'fused'/'fused_tp'; not with the
    # stacked pipeline layout or the fused LN+MLP kernel (validated below).
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def grid_size(self) -> tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, segment: str = "all"
    ) -> jax.Array:
        """(B, H, W, 3) image in [0, 1] -> (B, H/p, W/p, C) features.

        `segment` slices the forward for externally-scheduled pipeline
        engines (train/loop.py's 1F1B step, which runs the trunk blocks
        itself inside parallel/pipeline.py:pipeline_1f1b):
          * "all"        — the whole backbone (default).
          * "embed"      — patch embed + pos embed + prefix tokens only;
                           returns the (B, N, C) token stream entering the
                           trunk.
          * "post_trunk" — treats `x` as the (B, N, C) token stream LEAVING
                           the trunk; runs the final norm, prefix strip, and
                           `_finish` (frozen stop-grad + adapters + grid
                           reshape).
        Segments only read/declare the parameters they touch, so applying a
        segment against the full param tree is exact.
        """
        B = x.shape[0]
        gh, gw = self.grid_size
        if segment in ("all", "embed"):
            x = nn.Conv(
                self.embed_dim,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                dtype=self.dtype,
                name="patch_embed",
            )(x.astype(self.dtype))
            x = x.reshape(B, gh * gw, self.embed_dim)
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, gh * gw, self.embed_dim),
                jnp.float32,
            )
            x = x + pos.astype(self.dtype)
            if self.num_prefix_tokens:
                prefix = self.param(
                    "prefix_tokens",
                    nn.initializers.truncated_normal(0.02),
                    (1, self.num_prefix_tokens, self.embed_dim),
                    jnp.float32,
                )
                x = jnp.concatenate(
                    [jnp.broadcast_to(
                        prefix.astype(self.dtype),
                        (B, self.num_prefix_tokens, self.embed_dim),
                    ), x],
                    axis=1,
                )
            if segment == "embed":
                return x
        if self.lora_rank:
            if self.pp_stages > 1:
                raise ValueError(
                    "lora_rank > 0 does not compose with the stacked "
                    "pipeline-parallel trunk layout (pp_stages > 1)"
                )
            if self.mlp_impl == "fused":
                raise ValueError(
                    "lora_rank > 0 does not compose with mlp_impl='fused' "
                    "(the VMEM LN+MLP kernel bypasses the Dense modules)"
                )
        if segment != "post_trunk":
            if self.pp_stages > 1:
                x = self._pp_trunk(x)
            else:
                block_cls = nn.remat(Block) if self.remat else Block
                for i in range(self.depth):
                    x = block_cls(
                        self.num_heads,
                        self.mlp_ratio,
                        dtype=self.dtype,
                        softmax_dtype=self.softmax_dtype,
                        attn_impl=self.attn_impl,
                        mlp_impl=self.mlp_impl,
                        exact_gelu=self.exact_gelu,
                        mesh=self.mesh,
                        lora_rank=self.lora_rank,
                        lora_alpha=self.lora_alpha,
                        name=f"block{i}",
                    )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        if self.num_prefix_tokens:
            x = x[:, self.num_prefix_tokens:]
        return self._finish(x, B, gh, gw)

    def _pp_trunk(self, x: jax.Array) -> jax.Array:
        """Run the blocks as an SPMD pipeline over the mesh "pipe" axis.

        Inside the pipeline's shard_map each device already holds its local
        batch shard, so the per-block Attention runs the packed Pallas
        kernel directly (mesh=None — no nested shard_map). attn_impl
        semantics carry over unchanged: 'fused_tp' keeps head-major qkv
        params, 'fused'/'einsum' keep qkv-major.

        When the mesh also carries a model axis of size > 1, each stage's
        blocks additionally run tensor-parallel: the stacked Megatron dims
        shard over "model" (stacked_param_specs) and `tp_block_apply`
        supplies the explicit in-block psums — attn_impl must be 'fused_tp'
        (the head-major packing is what makes the qkv column shard land on
        whole heads).
        """
        from probpose_pytorch_tpu.parallel.pipeline import pipeline_spmd

        C = self.embed_dim
        if self.depth % self.pp_stages != 0:
            raise ValueError(
                f"depth={self.depth} not divisible by pp_stages="
                f"{self.pp_stages}"
            )
        flat = _StackedBlockParams(
            self.depth, C, int(C * self.mlp_ratio), name="blocks"
        )()
        tp = (
            dict(self.mesh.shape).get("model", 1)
            if self.mesh is not None
            else 1
        )
        block_fn, seq_block_fn, param_specs = pp_block_fns(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            embed_dim=C,
            dtype=self.dtype,
            softmax_dtype=self.softmax_dtype,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            exact_gelu=self.exact_gelu,
            tp=tp,
            remat=self.remat,
        )
        return pipeline_spmd(
            block_fn,
            flat,
            x,
            self.mesh,
            microbatches=self.pp_microbatches,
            param_specs=param_specs,
            seq_block_fn=seq_block_fn,
        )

    def _finish(self, x: jax.Array, B: int, gh: int, gw: int) -> jax.Array:

        if self.frozen:
            x = jax.lax.stop_gradient(x)
        for j, hidden in enumerate(self.adapter_hidden):
            x = nn.Dense(hidden, dtype=self.dtype, name=f"adapter{j}")(x)
            if j < len(self.adapter_hidden) - 1:
                x = nn.relu(x)

        C = x.shape[-1]
        return x.reshape(B, gh, gw, C)
