"""Fused two-stage serving: detector -> crops -> top-down pose in ONE
jitted program.

The standalone top-down path (`TopDownPredictor(detector=...)`,
/root/reference has no detector at all — its inference resizes the whole
image, probpose/inference.py:74-75) launches TWO device programs per
frame with a host round-trip between them: the detector returns boxes to
the host, the host expands them and re-dispatches the pose program
(which re-uploads nothing, but pays a second dispatch plus a device->
host->device synchronization on the box tensor). On a tunneled/PCIe
link that sync is milliseconds — comparable to the compute itself at
small person counts.

`FusedTwoStagePredictor` composes the two stages inside one `jax.jit`:

    frames (B, Hf, Wf, 3) uint8, device-resident once
      -> detector full-frame resize + forward + static top-K box decode
      -> on-device box conditioning (aspect pad + scale, the same
         expand_bbox geometry pose training used)
      -> indexed crop gather (each frame read from HBM, never re-uploaded)
      -> pose forward (+ flip/scale TTA, calibration — everything the
         TopDownPredictor's program supports) + codec decode
      -> frame-space keypoints

Zero host syncs between the stages, one dispatch per batch, and XLA
overlaps the detector tail with the pose head's prologue. Static shapes
throughout: every frame yields `max_people` pose slots (score-descending;
the host thresholds afterwards) — the usual TPU trade of bounded padding
for no recompilation and no data-dependent control flow.

Single-device by design (the two stages' programs already scale
data-parallel individually via their `mesh=` knobs; fusing across a mesh
would shard frames identically — add it when a profile demands it).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["FusedTwoStagePredictor", "expand_boxes_jax"]


def expand_boxes_jax(boxes, input_size: tuple[int, int], scale: float):
    """Vectorized on-device twin of detect.pipeline.expand_detections
    (aspect-pad to the pose crop's W/H and expand about the center;
    degenerate detections floor at 1 px). boxes (N, 4) xywh -> (N, 4)."""
    import jax.numpy as jnp

    H, W = input_size
    aspect = W / H
    boxes = boxes.astype(jnp.float32)
    x, y = boxes[:, 0], boxes[:, 1]
    w = jnp.maximum(boxes[:, 2], 1.0)
    h = jnp.maximum(boxes[:, 3], 1.0)
    cx, cy = x + w / 2.0, y + h / 2.0
    wide = w / h > aspect
    h2 = jnp.where(wide, w / aspect, h)
    w2 = jnp.where(wide, w, h * aspect)
    w2, h2 = w2 * scale, h2 * scale
    return jnp.stack([cx - w2 / 2.0, cy - h2 / 2.0, w2, h2], axis=-1)


@dataclasses.dataclass
class FusedTwoStagePredictor:
    """One-program frame->poses serving over a DetectorPredictor and a
    TopDownPredictor (both single-device; the pose predictor's flip-test /
    scale-test / calibration / quantization all apply inside the fused
    program — `return_heatmaps` is the one knob that must stay off, the
    per-crop maps would dominate the output transfer)."""

    detector: Any  # detect.pipeline.DetectorPredictor
    pose: Any  # inference.TopDownPredictor
    max_people: int = 8  # pose slots per frame (top-K by detector score)
    bbox_scale: float = 1.25  # expand_bbox conditioning, as in training
    score_threshold: float = 0.3  # predict_frame's host-side cut

    def __post_init__(self):
        import jax

        self._jax = jax
        self._jitted: dict[tuple, Any] = {}
        if not hasattr(self.detector, "_fn") or not hasattr(
            self.pose, "_fn"
        ):
            raise ValueError(
                "fusing composes the LIVE predictors' programs; exported "
                "bundles are already-lowered StableHLO (export the fused "
                "program itself: serve.export --fused-detector)"
            )
        if self.detector.mesh is not None or self.pose.mesh is not None:
            raise ValueError(
                "fused two-stage serving is single-device; scale the two "
                "stages' own mesh= knobs instead"
            )
        if self.pose.return_heatmaps:
            raise ValueError(
                "fused two-stage serving needs return_heatmaps=False "
                "(per-crop heatmaps for every pose slot would dominate "
                "the output transfer)"
            )
        if self.max_people < 1:
            raise ValueError(f"max_people must be >= 1: {self.max_people}")
        if self.max_people > self.detector.max_detections:
            raise ValueError(
                f"max_people ({self.max_people}) exceeds the detector's "
                f"max_detections ({self.detector.max_detections})"
            )

    def _fn(self):
        import jax.numpy as jnp

        det_fn = self.detector._fn()  # (vars, frames) -> boxes, scores
        pose_fn = self.pose._fn()  # (vars, frames, boxes, ids) -> dict
        K = self.max_people

        def run(det_vars, pose_vars, frames):
            B = frames.shape[0]
            det_boxes, det_scores = det_fn(det_vars, frames)
            det_boxes = det_boxes[:, :K]  # score-descending already
            det_scores = det_scores[:, :K]
            crop_boxes = expand_boxes_jax(
                det_boxes.reshape(B * K, 4),
                self.pose.input_size,
                self.bbox_scale,
            )
            # Indexed crop gather: the pose program reads each frame from
            # HBM (frames were uploaded once for the detector) — the same
            # one-upload-per-unique-frame path as indexed serving.
            ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
            out = pose_fn(pose_vars, frames, crop_boxes, ids)
            out = {
                k: v.reshape((B, K) + v.shape[1:]) for k, v in out.items()
            }
            out["boxes"] = crop_boxes.reshape(B, K, 4)
            out["det_scores"] = det_scores
            return out

        return run

    def dispatch(self, frames: np.ndarray) -> dict:
        """Non-blocking enqueue: frames (B, Hf, Wf, 3) uint8 -> dict of
        in-flight device arrays, every pose field shaped (B, max_people,
        ...) plus `boxes` (B, max_people, 4) (the expanded crop geometry,
        frame px) and `det_scores` (B, max_people), detector-score-
        descending and UNthresholded."""
        frames = np.ascontiguousarray(np.asarray(frames, np.uint8))
        key = frames.shape
        if key not in self._jitted:
            self._jitted[key] = self._jax.jit(self._fn())
        return self._jitted[key](
            self.detector.variables, self.pose.variables, frames
        )

    def __call__(self, frames: np.ndarray) -> dict:
        """Blocking batched form of `dispatch` (numpy outputs)."""
        return {k: np.asarray(v) for k, v in self.dispatch(frames).items()}

    def predict_frame(
        self,
        frame: np.ndarray,
        score_threshold: float | None = None,
    ) -> dict[str, np.ndarray]:
        """One frame -> the standalone-mode contract (inference.py
        predict_frame(boxes=None)): dict(keypoints (n, K, 2), scores,
        probabilities, visibilities, oks, errors, boxes (n, 4),
        det_scores (n,)) for the n detections above the threshold."""
        thr = (
            self.score_threshold
            if score_threshold is None
            else score_threshold
        )
        out = self(np.asarray(frame, np.uint8)[None])
        keep = out["det_scores"][0] >= thr
        return {k: v[0][keep] for k, v in out.items()}
