"""Small convolutional backbone family (BASELINE config #2: "small conv
backbone end-to-end inference").

ResNet-style residual stages in NHWC producing the same feature-grid contract
as the ViT backbones (image -> (B, H/stride, W/stride, C)), so heads, codecs,
and the serving pipeline are backbone-agnostic. bf16 matmuls on the MXU,
BatchNorm in f32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvBackbone", "CONV_PRESETS"]

CONV_PRESETS = {
    # name: (stage_channels, blocks_per_stage) — total stride 16 to match the
    # ViT/p16 feature-grid geometry.
    "conv-s": ((64, 128, 256, 384), (2, 2, 2, 2)),
    "conv-t": ((32, 64, 128, 256), (1, 1, 2, 2)),
}


class _ResBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(y)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="proj")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name="proj_bn")(x)
        return nn.relu(x + y)


class ConvBackbone(nn.Module):
    """Residual conv backbone; output stride 16 (stem /2, stage strides
    1,2,2,2)."""

    img_size: tuple[int, int] = (256, 192)
    stage_channels: Sequence[int] = (64, 128, 256, 384)
    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.bfloat16
    frozen: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Conv(self.stage_channels[0], (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        for s, (ch, nb) in enumerate(zip(self.stage_channels, self.stage_blocks)):
            for b in range(nb):
                stride = 2 if (b == 0 and s > 0) else 1
                x = _ResBlock(ch, stride, dtype=self.dtype,
                              name=f"stage{s}_block{b}")(x, train)
        if self.frozen:
            x = jax.lax.stop_gradient(x)
        return x
