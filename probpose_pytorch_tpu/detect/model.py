"""Anchor-free person detector model (CenterNet-style heads on the residual
conv backbone family).

Greenfield superset: the reference ships no detector (SURVEY.md §2.4 — its
inference whole-image-resizes, /root/reference/probpose/inference.py:74-75).
This model supplies the boxes the top-down pose pipeline consumes, making
"frame in -> poses out" a single framework.

TPU-first shape choices: NHWC throughout, bf16 matmuls/convs on the MXU with
f32 BatchNorm and f32 prediction heads; upsampling is nearest-resize + 3x3
conv (resize lowers to a reshape/broadcast — cheap, deterministic layout —
and the conv carries the learnable mixing; transpose convs at stride 2 hit
XLA's slow grad path for no accuracy gain at this scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.models.convnet import CONV_PRESETS, ConvBackbone

__all__ = ["PersonDetector"]


class PersonDetector(nn.Module):
    """image (B, H, W, 3) -> dict(center (B, H/4, W/4, 1) logits,
    size (B, H/4, W/4, 2), offset (B, H/4, W/4, 2)).

    With `num_keypoints > 0` the same trunk becomes a SINGLE-STAGE
    multi-person pose model (the CenterNet objects-as-points pose
    formulation): an extra `kpts` head (B, H/4, W/4, 2K) regresses each
    joint's displacement from the person center, so one forward on the
    full frame yields every person's pose — no detector -> crop -> pose
    round trip. Superset family: the reference is top-down only."""

    img_size: tuple[int, int] = (512, 512)
    preset: str = "conv-t"
    head_channels: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    out_stride: int = 4  # backbone stride 16, two 2x upsamples
    num_keypoints: int = 0  # >0: add the joint-offset pose head
    # With the pose head: also emit per-joint heatmaps (K channels) and a
    # shared 2-channel sub-cell joint offset, for snap refinement at decode
    # (the CenterNet pose recipe: regression proposes, heatmaps refine).
    kpt_heatmaps: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict:
        chans, blocks = CONV_PRESETS[self.preset]
        y = ConvBackbone(
            img_size=self.img_size,
            stage_channels=chans,
            stage_blocks=blocks,
            dtype=self.dtype,
            name="backbone",
        )(x, train=train)  # stride 16
        for i, ch in enumerate((self.head_channels * 2, self.head_channels)):
            B, Hf, Wf, C = y.shape
            y = jax.image.resize(
                y.astype(jnp.float32), (B, 2 * Hf, 2 * Wf, C), "nearest"
            ).astype(self.dtype)
            y = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"up{i}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name=f"up{i}_bn")(y)
            y = nn.relu(y)
        y = nn.Conv(self.head_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="head_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="head_bn")(y)
        y = nn.relu(y).astype(jnp.float32)
        # Focal-loss prior: bias the center logits so the initial sigmoid
        # sits near 0.01 — without it the first steps drown in the ~H*W
        # easy negatives.
        center = nn.Conv(
            1, (1, 1), dtype=jnp.float32,
            bias_init=nn.initializers.constant(-4.6), name="center",
        )(y)
        size = nn.Conv(2, (1, 1), dtype=jnp.float32, name="size")(y)
        offset = nn.Conv(2, (1, 1), dtype=jnp.float32, name="offset")(y)
        out = dict(center=center, size=size, offset=offset)
        if self.num_keypoints > 0:
            out["kpts"] = nn.Conv(
                2 * self.num_keypoints, (1, 1), dtype=jnp.float32,
                name="kpts",
            )(y)
            if self.kpt_heatmaps:
                # Same focal-prior bias as the center head: K joint-type
                # channels, trained with the identical penalty-reduced
                # focal (detect/loss.py).
                out["kpt_heat"] = nn.Conv(
                    self.num_keypoints, (1, 1), dtype=jnp.float32,
                    bias_init=nn.initializers.constant(-4.6),
                    name="kpt_heat",
                )(y)
                out["kpt_offset"] = nn.Conv(
                    2, (1, 1), dtype=jnp.float32, name="kpt_offset"
                )(y)
        return out

    @property
    def feat_hw(self) -> tuple[int, int]:
        return (
            self.img_size[0] // self.out_stride,
            self.img_size[1] // self.out_stride,
        )
