"""Backbone + head composition (reference ProbPoseModel,
/root/reference/probpose/model.py:4-11) plus a config-driven builder."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.models.head import ProbMapHead
from probpose_pytorch_tpu.models.vit import ViTBackbone, ViTConfig

__all__ = ["ProbPoseModel", "ModelConfig", "build_model"]


class ProbPoseModel(nn.Module):
    """forward = head(backbone(x)); returns the 5-tuple
    (heatmaps, probability, visibility, oks, error).

    On model-/pipeline-parallel meshes the trunk output is reshard-
    constrained to be batch-sharded over EVERY mesh axis before the head
    (parallel/sharding.py:head_batch_spec): the head's params are
    replicated, so without the constraint the non-data axes would run the
    head (22% of the train step at ViT-S) redundantly on every shard.
    """

    backbone: nn.Module
    head: nn.Module
    mesh: Any = None

    def __call__(self, x: jax.Array, train: bool = False):
        feats = self.backbone(x, train=train)
        from probpose_pytorch_tpu.parallel.sharding import head_batch_spec

        spec = head_batch_spec(self.mesh, x.shape[0])
        if spec is not None:
            from jax.sharding import NamedSharding

            feats = jax.lax.with_sharding_constraint(
                feats, NamedSharding(self.mesh, spec)
            )
        return self.head(feats, train=train)


@dataclass(frozen=True)
class ModelConfig:
    """Static model configuration (greenfield — the reference hard-codes its
    architecture in train.py:40-45)."""

    img_size: tuple[int, int] = (256, 192)  # (H, W)
    patch_size: int = 16
    num_keypoints: int = 17
    backbone: str = "vit-s"
    # Keypoint head family: "probmap" (the reference's 2-D heatmap head) |
    # "simcc" (1-D coordinate classification, models/simcc.py — two MXU
    # matmuls instead of the deconv pyramid; superset family).
    head_type: str = "probmap"
    simcc_split_ratio: float = 2.0
    simcc_sigma: float = 6.0  # label spread in bin units
    frozen_backbone: bool = False
    adapter_hidden: tuple[int, ...] = ()
    deconv_out_channels: tuple[int, ...] = (256, 256)
    deconv_kernel_sizes: tuple[int, ...] = (4, 4)
    conv_out_channels: tuple[int, ...] = ()
    conv_kernel_sizes: tuple[int, ...] = ()
    final_layer_kernel_size: int | None = 1
    pool_sizes: tuple[tuple[int, int], ...] = ((4, 3), (2, 2), (2, 2))
    normalize: float | None = 1.0
    compute_dtype: str = "bfloat16"
    softmax_dtype: str = "float32"  # serving configs may use "bfloat16"
    attn_impl: str = "einsum"  # "fused" = packed Pallas attention on TPU
    mlp_impl: str = "dense"  # "fused" = VMEM LN+MLP+residual kernel on TPU
    scalar_impl: str = "separate"  # head scalar branches ("fused" measured slower on v5e)
    deconv_impl: str = "lax"  # head deconvs: "lax" | "fastvjp"
    remat: bool = False  # jax.checkpoint the ViT blocks
    # RADIO-import mode (reference backbone.py:4-21): prefix tokens ride
    # through attention; erf gelu matches the torch checkpoint.
    num_prefix_tokens: int = 0
    exact_gelu: bool = False
    # Pipeline parallelism over the mesh "pipe" axis (parallel/pipeline.py):
    # block params stacked along depth (compat.stack_vit_blocks converts
    # per-block checkpoints). Trainer.create sets pp_stages from the mesh.
    pp_stages: int = 1
    pp_microbatches: int = 0  # 0 = auto (parallel.pipeline.pick_microbatches)
    # LoRA fine-tuning (models/lora.py): rank-r deltas on the ViT's
    # qkv/proj/fc1/fc2 projections; 0 = off. Train only the deltas (+head)
    # with TrainConfig.train_lora_only; fold into the base kernels for
    # deployment with models.lora.merge_lora_params.
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def heatmap_size(self) -> tuple[int, int]:
        """(W, H): feature grid upsampled 2x per deconv stage."""
        up = 2 ** len(self.deconv_out_channels)
        return (
            self.img_size[1] // self.patch_size * up,
            self.img_size[0] // self.patch_size * up,
        )

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)


def build_model(cfg: ModelConfig, mesh=None) -> ProbPoseModel:
    """Build the model; `mesh` (a jax.sharding.Mesh) lets the fused Pallas
    attention ride shard_map over the mesh's data axis under data
    parallelism — it does not affect parameters or numerics."""
    if cfg.backbone.startswith("conv"):
        if cfg.lora_rank:
            raise ValueError("lora_rank applies to ViT backbones only")
        from probpose_pytorch_tpu.models.convnet import (
            CONV_PRESETS,
            ConvBackbone,
        )

        channels, blocks = CONV_PRESETS[cfg.backbone]
        backbone = ConvBackbone(
            img_size=cfg.img_size,
            stage_channels=channels,
            stage_blocks=blocks,
            dtype=cfg.dtype,
            frozen=cfg.frozen_backbone,
        )
    else:
        vit_kw = ViTConfig.PRESETS[cfg.backbone]
        backbone = ViTBackbone(
            img_size=cfg.img_size,
            patch_size=cfg.patch_size,
            dtype=cfg.dtype,
            softmax_dtype=jnp.dtype(cfg.softmax_dtype),
            attn_impl=cfg.attn_impl,
            mlp_impl=cfg.mlp_impl,
            frozen=cfg.frozen_backbone,
            adapter_hidden=cfg.adapter_hidden,
            remat=cfg.remat,
            num_prefix_tokens=cfg.num_prefix_tokens,
            exact_gelu=cfg.exact_gelu,
            mesh=mesh,
            pp_stages=cfg.pp_stages,
            pp_microbatches=cfg.pp_microbatches,
            lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha,
            **vit_kw,
        )
    if cfg.head_type == "simcc":
        from probpose_pytorch_tpu.models.simcc import SimCCHead

        head = SimCCHead(
            out_channels=cfg.num_keypoints,
            input_size=cfg.img_size,
            split_ratio=cfg.simcc_split_ratio,
            pool_sizes=cfg.pool_sizes,
            dtype=cfg.dtype,
        )
    elif cfg.head_type == "probmap":
        head = ProbMapHead(
            out_channels=cfg.num_keypoints,
            pool_sizes=cfg.pool_sizes,
            deconv_out_channels=cfg.deconv_out_channels,
            deconv_kernel_sizes=cfg.deconv_kernel_sizes,
            conv_out_channels=cfg.conv_out_channels,
            conv_kernel_sizes=cfg.conv_kernel_sizes,
            final_layer_kernel_size=cfg.final_layer_kernel_size,
            normalize=cfg.normalize,
            dtype=cfg.dtype,
            scalar_impl=cfg.scalar_impl,
            deconv_impl=cfg.deconv_impl,
        )
    else:
        raise ValueError(
            f"unknown head_type {cfg.head_type!r} (expected probmap | simcc)"
        )
    return ProbPoseModel(backbone=backbone, head=head, mesh=mesh)
