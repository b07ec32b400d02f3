"""SimCC codec: 1-D bin-label encoding and coordinate decoding, batched.

Companion to models/simcc.py (the SimCC head family — a superset; the
reference has only the 2-D ProbMap codecs, codec.py:73-543). Keypoints
encode into two 1-D Gaussian bin distributions per axis at `split_ratio`
bins per input pixel; decode is per-axis argmax + 3-tap parabolic
sub-pixel refinement, everything jittable and batched.

Interface parity with `codec.Codec`: `encode(keypoints, visible,
keypoints_visibility=...)` returns the gt-dict schema the train loop
threads, and `decode(pred)` consumes the head's 5-tuple and returns
((keypoints, scores), probabilities, visibilities, oks, errors) with the
same shapes the ProbMap facade produces — so the predictor, eval pipeline,
and serving stack are codec-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SimCCLabel", "SimCCCodec"]


def _axis_labels(
    coords_bins: jax.Array, n_bins: int, sigma: float
) -> jax.Array:
    """(B, K) bin-space coordinates -> (B, K, n_bins) normalized Gaussian
    label distributions (sum 1 over bins)."""
    bins = jnp.arange(n_bins, dtype=jnp.float32)
    g = jnp.exp(
        -((bins[None, None, :] - coords_bins[..., None]) ** 2)
        / (2.0 * sigma**2)
    )
    return g / jnp.maximum(g.sum(axis=-1, keepdims=True), 1e-12)


def _axis_decode(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, K, N) logits -> (coords_bins (B, K), score (B, K)).

    argmax + parabolic 3-tap refinement on the softmax distribution; score
    is the peak probability."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    N = probs.shape[-1]
    center = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    left = jnp.take_along_axis(
        probs, jnp.clip(idx - 1, 0, N - 1)[..., None], axis=-1
    )[..., 0]
    right = jnp.take_along_axis(
        probs, jnp.clip(idx + 1, 0, N - 1)[..., None], axis=-1
    )[..., 0]
    denom = left - 2.0 * center + right
    delta = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    # Parabolic refinement is only meaningful at interior maxima.
    delta = jnp.where((idx > 0) & (idx < N - 1), delta, 0.0)
    return idx.astype(jnp.float32) + delta, center


@dataclass(frozen=True)
class SimCCLabel:
    """Per-axis bin label codec.

    Args:
        input_size: (in_w, in_h) crop extent in pixels (the `codec.ProbMap`
            convention).
        split_ratio: bins per pixel.
        sigma: Gaussian label spread in BIN units.
        sigmas: per-keypoint OKS sigmas (loss target derivation).
    """

    input_size: tuple[int, int]
    split_ratio: float = 2.0
    sigma: float = 6.0
    sigmas: tuple[float, ...] = ()

    def __post_init__(self):
        object.__setattr__(
            self,
            "sigmas",
            tuple(float(s) for s in np.asarray(self.sigmas).ravel()),
        )

    @property
    def bins(self) -> tuple[int, int]:
        """(Wb, Hb)."""
        in_w, in_h = self.input_size
        return int(in_w * self.split_ratio), int(in_h * self.split_ratio)

    @property
    def sigmas_array(self) -> np.ndarray:
        return np.asarray(self.sigmas, np.float32)

    def encode(
        self,
        keypoints: jax.Array,
        keypoints_visible: jax.Array | None = None,
        keypoints_visibility: jax.Array | None = None,
        id_similarity: float = 0.0,
    ) -> dict[str, Any]:
        kpts = jnp.asarray(keypoints, jnp.float32)
        if kpts.ndim == 2:
            kpts = kpts[None]
        B, K, _ = kpts.shape
        if keypoints_visible is None:
            keypoints_visible = jnp.ones((B, K), jnp.float32)
        if keypoints_visibility is None:
            keypoints_visibility = jnp.zeros((B, K), jnp.float32)
        vis = jnp.asarray(keypoints_visible, jnp.float32).reshape(B, K)

        Wb, Hb = self.bins
        bx = kpts[..., 0] * self.split_ratio
        by = kpts[..., 1] * self.split_ratio
        x_labels = _axis_labels(bx, Wb, self.sigma)
        y_labels = _axis_labels(by, Hb, self.sigma)

        in_w, in_h = self.input_size
        in_image = (
            (kpts[:, :, 0] >= 0)
            & (kpts[:, :, 0] < in_w)
            & (kpts[:, :, 1] >= 0)
            & (kpts[:, :, 1] < in_h)
        )
        # Labeled keypoints whose distribution lies on the grid get weight;
        # off-grid keypoints contribute nothing (the ProbMap weight
        # semantics, generate_probmaps).
        weights = vis * in_image.astype(jnp.float32)
        return dict(
            x_labels=x_labels,
            y_labels=y_labels,
            keypoint_weights=weights,
            annotated=vis > 0,
            in_image=in_image,
            keypoints_scaled=kpts,
            keypoints_visibility=jnp.asarray(
                keypoints_visibility, jnp.float32
            ).reshape(B, K),
            identification_similarity=id_similarity,
        )

    def decode_axis_pair(
        self, x_logits: jax.Array, y_logits: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Logits -> (keypoints (B, K, 2) input-space pixels, scores)."""
        cx, sx = _axis_decode(x_logits)
        cy, sy = _axis_decode(y_logits)
        kpts = jnp.stack([cx, cy], axis=-1) / self.split_ratio
        return kpts, 0.5 * (sx + sy)


@dataclass(frozen=True)
class SimCCCodec:
    """Facade matching `codec.Codec`'s surface for the SimCC family."""

    label: SimCCLabel

    def encode(
        self,
        keypoints,
        keypoints_visible=None,
        keypoints_visibility=None,
        id_similarity=0.0,
    ):
        return self.label.encode(
            keypoints,
            keypoints_visible,
            keypoints_visibility=keypoints_visibility,
            id_similarity=id_similarity,
        )

    def decode(self, pred: tuple[Any, ...]):
        """Decode the head's 5-tuple ((x_logits, y_logits), probabilities,
        visibilities, oks, errors); same return contract as Codec.decode.
        Errors normalize by the bin-grid diagonal (the SimCC analogue of
        the ProbMap facade's heatmap-diagonal normalization)."""
        (x_logits, y_logits), probabilities, visibilities, oks, errors = pred
        B, C = x_logits.shape[:2]
        preds = self.label.decode_axis_pair(x_logits, y_logits)
        Wb, Hb = self.label.bins
        probabilities = jnp.reshape(probabilities, (B, 1, C))
        visibilities = jnp.reshape(visibilities, (B, 1, C))
        oks = jnp.reshape(oks, (B, 1, C))
        errors = jnp.reshape(errors, (B, 1, C)) / float(
            np.sqrt(Wb**2 + Hb**2)
        )
        return preds, probabilities, visibilities, oks, errors
