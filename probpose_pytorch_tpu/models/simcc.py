"""SimCC coordinate-classification head — a second keypoint-head family.

Localizes each keypoint as two 1-D classification problems over sub-pixel
x / y bins (the SimCC / RTMPose formulation) instead of a 2-D heatmap:
a 1x1 conv maps the feature grid to K channels, each keypoint's flattened
spatial map feeds two Dense projections producing `int(W * split_ratio)` /
`int(H * split_ratio)` bin logits.

Why this is TPU-native: the whole localization branch is one 1x1 conv plus
two large dense matmuls — (B*K, h*w) x (h*w, bins) — which land directly on
the MXU with zero transpose-convolution stages, and decode is two 1-D
argmaxes instead of a 2-D heatmap scan. Output resolution is set by
`split_ratio` (bins per input pixel), not by how many deconv stages fit.

The ProbPose scalar branches (probability / visibility / oks / error) are
kept verbatim (`_ScalarBranch`), so every downstream surface — trainer,
predictor, eval, serving bundles, TTA — sees the same 5-field contract
with only pred[0]'s type differing ((x_logits, y_logits) instead of a
heatmap tensor).

Reference anchor: /root/reference/probpose/head.py:18-594 is the heatmap
counterpart; the reference has no SimCC family (superset addition).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.models.head import _ScalarBranch

__all__ = ["SimCCHead"]


class SimCCHead(nn.Module):
    """Coordinate-classification head with ProbPose scalar branches.

    Args:
        out_channels: number of keypoints K.
        input_size: (H, W) crop size the bins span.
        split_ratio: bins per input pixel (2.0 = half-pixel bins).
        pool_sizes: scalar-branch pooling schedule (as ProbMapHead).
        detach_probability / detach_visibility: stop-gradient the shared
            features entering those branches (oks/error always detach).

    Returns ((x_logits (B,K,Wb), y_logits (B,K,Hb)) , probability,
    visibility, oks, error) with the scalars each (B, K, 1, 1) — the
    ProbPose head contract with the localization entry swapped.
    """

    out_channels: int
    input_size: tuple[int, int]  # (H, W)
    split_ratio: float = 2.0
    pool_sizes: Sequence = ((4, 4), (2, 2), (2, 2))
    detach_probability: bool = True
    detach_visibility: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, feats: jax.Array, train: bool = False
    ) -> tuple[tuple[jax.Array, jax.Array], ...]:
        B, h, w, C = feats.shape
        H, W = self.input_size
        Wb = int(W * self.split_ratio)
        Hb = int(H * self.split_ratio)

        # Localization: 1x1 conv -> K channels, flatten each keypoint's
        # spatial map, project to x / y bin logits (weights shared across
        # keypoints, as in SimCC).
        x = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="final"
        )(feats)
        tokens = jnp.transpose(x, (0, 3, 1, 2)).reshape(
            B, self.out_channels, h * w
        )
        logits_x = nn.Dense(Wb, dtype=self.dtype, name="mlp_x")(tokens)
        logits_y = nn.Dense(Hb, dtype=self.dtype, name="mlp_y")(tokens)
        logits_x = logits_x.astype(jnp.float32)
        logits_y = logits_y.astype(jnp.float32)

        def branch(name: str, act: str, detach: bool) -> jax.Array:
            src = jax.lax.stop_gradient(feats) if detach else feats
            out = _ScalarBranch(
                self.out_channels,
                self.pool_sizes,
                act,
                dtype=self.dtype,
                name=name,
            )(src, train)
            return jnp.transpose(out, (0, 3, 1, 2))  # (B, K, 1, 1)

        probability = branch("probability", "sigmoid", self.detach_probability)
        visibility = branch("visibility", "sigmoid", self.detach_visibility)
        oks = branch("oks", "sigmoid", True)
        error = branch("error", "relu", True)
        return (logits_x, logits_y), probability, visibility, oks, error
