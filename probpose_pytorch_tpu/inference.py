"""Inference: the single-image CLI (reference probpose/inference.py) and a
batched top-down predictor for the multi-person pipeline (BASELINE config #4).

Usage (mirrors the reference CLI surface, inference.py:16-60):
    python -m probpose_pytorch_tpu.inference \
        --checkpoint runs/x/checkpoints --image img.jpg --output out/ \
        [--config runs/x/config.json] [--input-size 256,192] [--normalize]

Differences by design: checkpoints are Orbax TrainStates (not pickled
modules); whole-image resize is kept for CLI parity, while `TopDownPredictor`
adds the detector-box path the reference lacks (SURVEY.md §2.4).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Any, Sequence

import numpy as np


def _load_autotune_entry() -> dict:
    """Per-device-kind record from the persisted autotune sweep
    (scripts/autotune_serving.py ->
    probpose_pytorch_tpu/configs/autotune_serving.json — package data, so it
    resolves in wheel installs too). Empty dict when nothing is recorded for
    this hardware."""
    try:
        from importlib.resources import files

        text = (
            files("probpose_pytorch_tpu")
            .joinpath("configs/autotune_serving.json")
            .read_text()
        )
        import jax

        return json.loads(text)[jax.devices()[0].device_kind]
    except (KeyError, ValueError, RuntimeError, OSError):
        return {}


def tuned_serving_batch(default: int = 64) -> int:
    """Best serving batch for this host's device kind. Falls back to
    `default` when no sweep has been recorded for this hardware."""
    try:
        return int(_load_autotune_entry()["batch"])
    except (KeyError, ValueError):
        return default


def derive_bucket_ladder(
    sweep: "Sequence[dict]", margin: float = 0.10
) -> tuple[int, ...]:
    """Prune a measured per-batch latency sweep into a padding-bucket ladder.

    `predict_frame` pads a variable box count up to the next bucket; each
    bucket costs one compiled program, so rungs are only worth keeping when
    they are measurably faster than padding up to the next rung. Walking
    from the largest batch down, a smaller batch stays on the ladder iff its
    measured latency beats the next kept rung by at least `margin` (small
    batches on a TPU sit on a latency floor — batch 1..32 often cost the
    same wall time, so one rung covers them all).

    sweep rows: {"batch": int, "ms_per_batch": float} (extra keys ignored).
    Returns ascending batch sizes ending at the largest swept batch.
    """
    rows = sorted(
        ({"batch": int(r["batch"]), "ms": float(r["ms_per_batch"])}
         for r in sweep),
        key=lambda r: r["batch"],
    )
    if not rows:
        raise ValueError("empty sweep")
    bad = [r for r in rows if r["ms"] <= 0]
    if bad:
        raise ValueError(
            f"non-positive latency for batches {[r['batch'] for r in bad]} — "
            "below the measurement noise floor; re-sweep with more repeats"
        )
    ladder = [rows[-1]]
    for row in reversed(rows[:-1]):
        if row["ms"] < ladder[-1]["ms"] * (1.0 - margin):
            ladder.append(row)
    return tuple(r["batch"] for r in reversed(ladder))


def tuned_bucket_ladder() -> tuple[int, ...] | None:
    """Autotuned `predict_frame` bucket ladder for this hardware
    (persisted by `scripts/autotune_serving.py --buckets`), or None when no
    bucket sweep has been recorded."""
    entry = _load_autotune_entry()
    ladder = entry.get("bucket_ladder")
    if ladder:
        return tuple(int(b) for b in ladder)
    return None


def _scale_boxes(boxes, s: float):
    """Rescale xywh boxes about their centers by factor `s` (multi-scale
    TTA geometry: the crop sees s x more context at s > 1)."""
    x, y, w, h = (boxes[..., i] for i in range(4))
    import jax.numpy as jnp

    return jnp.stack(
        [x + w * (1.0 - s) / 2.0, y + h * (1.0 - s) / 2.0, w * s, h * s],
        axis=-1,
    )


@dataclasses.dataclass
class TopDownPredictor:
    """Batched top-down pose predictor: frames + person boxes -> keypoints.

    The whole path (fused crop -> forward -> decode -> coordinate un-mapping)
    is one jitted program per static (batch, frame-size) bucket.
    """

    model: Any
    variables: Any
    codec: Any
    input_size: tuple[int, int]  # (H, W)
    preprocess_method: str = "bilinear_matmul"
    mesh: Any = None  # jax.sharding.Mesh for data-parallel serving
    # Include raw (B, K, Hh, Wh) heatmaps in the output dict. Off by default:
    # heatmaps dominate the device->host transfer (~50x the keypoint bytes),
    # so only debug/visualization callers (the CLI) should pay for them.
    return_heatmaps: bool = False
    # Round frame (H, W) up to this multiple in `predict_frame` (zero-pad
    # bottom/right) so a stream of slightly-varying camera resolutions
    # compiles one program per size bucket instead of one per exact shape.
    # Zero padding is semantically free: crop_resize already treats samples
    # outside the source extent as black (ops/preprocess.py:14), so padded
    # pixels produce the values out-of-frame samples produced anyway.
    # None disables (exact frame shapes).
    frame_size_multiple: int | None = 64
    # Flip-test TTA: a second forward on the W-mirrored crops, heatmaps
    # mirrored back with left/right channels swapped, predictions averaged
    # (standard top-down eval practice; ~2x compute for a small AP gain).
    # Baked into the jitted program — and therefore into exported serving
    # bundles. flip_pairs defaults to the COCO-17 skeleton.
    flip_test: bool = False
    flip_pairs: tuple = None  # type: ignore[assignment]
    # Multi-scale TTA: re-crop each box at these area scales about its
    # center (e.g. (0.9, 1.0, 1.1)), run the full forward(+flip) per scale,
    # decode each in its own crop geometry, un-map to frame space, and
    # average there (heatmaps from different box geometries don't share a
    # pixel grid, so coordinate-space averaging is the well-defined mean).
    # ~len(scale_test)x compute; () disables. Baked into the jitted program
    # and therefore into exported bundles, like flip_test.
    scale_test: tuple[float, ...] = ()
    # What multi-scale does to the CONFIDENCE fields (scores /
    # probabilities / visibilities / oks / errors):
    #   "unit" (default) — keypoints average across scales, confidences
    #     come from the unit-scale (or first-scale) forward. Off-scale
    #     crops mis-calibrate confidence and scramble AP's instance
    #     ranking (measured: docs/PERF.md "TTA ablation").
    #   "mean" — average everything (the naive composition).
    scale_test_scores: str = "unit"
    # Per-branch temperature scaling for the probabilistic outputs, fitted
    # offline on a held-out split (eval/calibration.fit_temperature — the
    # eval CLI's --calibration dump records it; re-apply with
    # --apply-temperature). Keys: "presence" (rescales `probabilities`)
    # and/or "visibility" (rescales `visibilities`); values T > 0 (T > 1
    # softens an overconfident branch). Applied in logit space inside the
    # jitted program — and therefore baked into exported serving bundles.
    # None/{} disables.
    calibration: dict | None = None
    # Optional detect.DetectorPredictor: `predict_frame(frame)` (boxes
    # omitted or None) then finds the people itself — standalone mode.
    # Detected boxes are expanded to this predictor's crop aspect
    # (detect/pipeline.expand_detections) and returned under "boxes".
    detector: Any = None
    # "int8": post-training dynamic-quantized backbone matmuls
    # (models/vit_int8.py). Opt-in and honest: measured SLOWER than bf16 at
    # ViT-S and ViT-B on v5e (the transformer is HBM-bound there; the
    # quantize/dequantize elementwise passes cost more than the int8 MXU
    # saves — docs/PERF.md "int8 serving"), with ~0.9998 feature
    # correlation. "int8_wo": weight-only int8 (bf16 activations) — the
    # latency-mode variant; wins where the matmuls are weight-bandwidth-
    # bound (single-crop serving of wide models: 1.43x measured at ViT-H
    # width, scripts/bench_weight_only_int8.py), parity at throughput
    # batches. Plain ViT backbones only (no prefix tokens / adapters);
    # single-device (mesh=None).
    quantize: str | None = None

    def __post_init__(self):
        import jax

        self._jitted: dict[tuple, Any] = {}
        self._jax = jax
        self.scale_test = tuple(float(s) for s in (self.scale_test or ()))
        if any(s <= 0 for s in self.scale_test):
            raise ValueError(f"scale_test must be positive: {self.scale_test}")
        if self.scale_test_scores not in ("unit", "mean"):
            raise ValueError(
                f"scale_test_scores must be 'unit' or 'mean': "
                f"{self.scale_test_scores!r}"
            )
        if self.calibration:
            bad = set(self.calibration) - {"presence", "visibility"}
            if bad:
                raise ValueError(
                    f"unknown calibration branches {sorted(bad)}; expected "
                    "'presence' and/or 'visibility'"
                )
            for k, t in self.calibration.items():
                t = float(t)
                if not (0.0 < t < float("inf")):
                    raise ValueError(
                        f"calibration temperature {k}={t!r} must be a "
                        "positive finite float"
                    )
        if self.quantize is not None:
            if self.quantize not in ("int8", "int8_wo"):
                raise ValueError(f"unknown quantize mode {self.quantize!r}")
            if self.mesh is not None:
                raise ValueError(f"quantize={self.quantize!r} is single-device only")
            bb = self.model.backbone
            from probpose_pytorch_tpu.models.vit import ViTBackbone

            if not isinstance(bb, ViTBackbone) or bb.num_prefix_tokens or (
                bb.adapter_hidden
            ):
                raise ValueError(
                    "quantize='int8' supports plain ViTBackbones (no prefix "
                    "tokens, no adapters)"
                )
            from probpose_pytorch_tpu.models.vit_int8 import (
                quantize_vit_params,
            )

            head_vars = {"params": self.variables["params"]["head"]}
            if "batch_stats" in self.variables:
                head_vars["batch_stats"] = self.variables["batch_stats"][
                    "head"
                ]
            self.variables = {
                "qparams": quantize_vit_params(
                    self.variables["params"]["backbone"], depth=bb.depth
                ),
                "head": head_vars,
            }
        if self.mesh is not None:
            from probpose_pytorch_tpu.parallel.sharding import shard_params

            backbone = getattr(self.model, "backbone", None)
            impl = getattr(backbone, "attn_impl", None)
            model_size = dict(self.mesh.shape).get("model", 1)
            if model_size > 1 and backbone is not None:
                # Tensor-parallel serving: heads shard over the model axis.
                # The fused kernel needs the head-major qkv packing
                # ('fused_tp'); qkv-major variables convert losslessly
                # (compat/layouts.py) BEFORE Megatron sharding. Heads that
                # don't divide the model axis fall back to einsum, which
                # GSPMD tensor-parallelizes with its own collectives.
                heads = getattr(backbone, "num_heads", 0)
                if impl in ("fused", "fused_tp") and heads % model_size == 0:
                    if impl == "fused":
                        from probpose_pytorch_tpu.compat.layouts import (
                            qkv_to_head_major,
                        )

                        self.variables = qkv_to_head_major(
                            self.variables, heads
                        )
                    self.model = self.model.clone(
                        backbone=backbone.clone(
                            attn_impl="fused_tp", mesh=self.mesh
                        ),
                        mesh=self.mesh,  # head reshards batch over all axes
                    )
                elif impl in ("fused", "fused_tp", "pallas"):
                    self.model = self.model.clone(
                        backbone=backbone.clone(
                            attn_impl="einsum", mesh=None
                        ),
                        mesh=self.mesh,
                    )
                else:
                    self.model = self.model.clone(mesh=self.mesh)
            elif (
                backbone is not None
                and impl == "fused"
                and getattr(backbone, "mesh", None) is None
            ):
                # Data-parallel mesh: the fused Pallas attention rides
                # shard_map over the data axis instead of being replicated
                # by GSPMD (params untouched — mesh is static metadata).
                self.model = self.model.clone(
                    backbone=backbone.clone(mesh=self.mesh)
                )
            self.variables = shard_params(self.variables, self.mesh)

    def _fn(self):
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.preprocess import (
            crop_resize,
            untransform_keypoints,
        )

        def forward(variables, crops):
            if self.quantize in ("int8", "int8_wo"):
                from probpose_pytorch_tpu.models.vit_int8 import (
                    vit_forward_int8,
                )

                bb = self.model.backbone
                feats = vit_forward_int8(
                    variables["qparams"],
                    crops,
                    patch_size=bb.patch_size,
                    depth=bb.depth,
                    num_heads=bb.num_heads,
                    weight_only=self.quantize == "int8_wo",
                )
                return self.model.head.apply(
                    variables["head"], feats, train=False
                )
            return self.model.apply(variables, crops, train=False)

        def predict_boxes(variables, frames, boxes):
            """One forward(+flip) + decode at one box geometry, un-mapped
            to frame space."""
            crops = crop_resize(
                frames, boxes, self.input_size, self.preprocess_method
            )
            pred = forward(variables, crops)
            if self.flip_test:
                from probpose_pytorch_tpu.ops.augment import (
                    COCO_FLIP_PAIRS,
                    average_flip_pred,
                    average_flip_pred_simcc,
                )

                pairs = (
                    self.flip_pairs
                    if self.flip_pairs is not None
                    else COCO_FLIP_PAIRS
                )
                pred_f = forward(variables, crops[:, :, ::-1, :])
                if isinstance(pred[0], (tuple, list)):
                    pred = average_flip_pred_simcc(
                        pred, pred_f, pairs,
                        self.codec.label.split_ratio,
                    )
                else:
                    pred = average_flip_pred(pred, pred_f, pairs)
            (kpts, scores), probs, vis, oks, errs = self.codec.decode(pred)
            H, W = self.input_size
            kpts = untransform_keypoints(kpts, boxes, (H, W))
            return (kpts, scores, probs, vis, oks, errs), pred

        def run(variables, frames, boxes, frame_ids=None):
            if frame_ids is not None:
                # indexed serving: frames holds each UNIQUE frame once
                # (F, Hs, Ws, 3) and frame_ids (B,) maps crops to frames —
                # the host->device link carries each frame once instead of
                # once per crop; the gather is one HBM pass (~free next to
                # any transfer link).
                frames = jnp.take(frames, frame_ids, axis=0)
            scales = self.scale_test or (1.0,)
            results = []
            pred_unit = None
            unit_fields = None
            for s in scales:
                boxes_s = boxes if s == 1.0 else _scale_boxes(boxes, s)
                fields, pred = predict_boxes(variables, frames, boxes_s)
                results.append(fields)
                if pred_unit is None or s == 1.0:
                    pred_unit = pred
                    unit_fields = fields
            if len(results) == 1:
                kpts, scores, probs, vis, oks, errs = results[0]
            else:
                kpts, scores, probs, vis, oks, errs = (
                    sum(field) / len(scales) for field in zip(*results)
                )
                if self.scale_test_scores == "unit":
                    _, scores, probs, vis, oks, errs = unit_fields
            if self.calibration:
                from probpose_pytorch_tpu.eval.calibration import P_HI, P_LO

                def rescale(p, t):
                    # logit-space 1/T rescale; the same f32 saturation clip
                    # the host-side metrics use keeps logit() finite.
                    p = jnp.clip(p.astype(jnp.float32), P_LO, P_HI)
                    return jax.nn.sigmoid(
                        (jnp.log(p) - jnp.log1p(-p)) / float(t)
                    )

                if "presence" in self.calibration:
                    probs = rescale(probs, self.calibration["presence"])
                if "visibility" in self.calibration:
                    vis = rescale(vis, self.calibration["visibility"])
            out = dict(
                keypoints=kpts,
                scores=scores,
                probabilities=probs,
                visibilities=vis,
                oks=oks,
                errors=errs,
            )
            if self.return_heatmaps:
                # Heatmaps from different box geometries don't share a
                # grid; expose the unit-scale (or first-scale) maps. For
                # the SimCC family, render the outer product of the
                # per-axis distributions — a (B, K, Hb, Wb) heatmap the
                # CLI's PNG dump consumes unchanged.
                loc = pred_unit[0]
                if isinstance(loc, (tuple, list)):
                    px = jax.nn.softmax(loc[0].astype(jnp.float32), axis=-1)
                    py = jax.nn.softmax(loc[1].astype(jnp.float32), axis=-1)
                    out["heatmaps"] = py[..., :, None] * px[..., None, :]
                else:
                    out["heatmaps"] = loc
            return out

        return run

    def _dispatch(
        self,
        frames: np.ndarray,
        boxes: np.ndarray,
        frame_ids: np.ndarray | None = None,
    ) -> dict:
        """Enqueue one batch on the device and return the (still in-flight)
        device output dict — JAX async dispatch means this returns as soon
        as the program is enqueued, not when it finishes."""
        import jax.numpy as jnp

        key = (
            frames.shape,
            boxes.shape,
            None if frame_ids is None else frame_ids.shape,
            self.return_heatmaps,
            self.flip_test,
            self.scale_test,
            self.scale_test_scores,
        )
        if key not in self._jitted:
            self._jitted[key] = self._jax.jit(self._fn())
        frames = jnp.asarray(frames)
        boxes = jnp.asarray(boxes)
        if self.mesh is not None:
            if frame_ids is not None:
                raise ValueError(
                    "indexed frames are single-device; mesh serving takes "
                    "per-crop frames"
                )
            from probpose_pytorch_tpu.parallel.sharding import shard_batch

            frames, boxes = shard_batch((frames, boxes), self.mesh)
        if frame_ids is not None:
            return self._jitted[key](
                self.variables, frames, boxes,
                jnp.asarray(frame_ids, jnp.int32),
            )
        return self._jitted[key](self.variables, frames, boxes)

    def __call__(
        self,
        frames: np.ndarray,
        boxes: np.ndarray,
        frame_ids: np.ndarray | None = None,
    ) -> dict:
        """frames: (B, Hs, Ws, 3) uint8; boxes: (B, 4) xywh. Returns a dict
        of numpy arrays with frame-space keypoints.

        frame_ids (B,) int switches to indexed serving: frames then holds
        each unique frame once, (F, Hs, Ws, 3), and crop i reads
        frames[frame_ids[i]] — F transfers instead of B (the win for
        multi-person frames on any transfer-bound link)."""
        out = self._dispatch(frames, boxes, frame_ids)
        return {k: np.asarray(v) for k, v in out.items()}

    def predict_stream(self, batches, depth: int = 2):
        """Stream serving: iterate (frames, boxes) batches, yield output
        dicts in order, keeping up to `depth` batches in flight. Uploads +
        dispatch run on a worker thread while the main thread downloads
        results, so batch i+1's host→device transfer overlaps batch i's
        compute and device→host readback — transfers block the calling
        thread on tunneled/PCIe links, so same-thread async dispatch alone
        cannot overlap them; the thread pipeline can. This is the
        wall-clock serving path for video / request streams. depth=2
        suffices; larger depths only add device memory pressure."""
        if depth < 1:
            raise ValueError("depth must be >= 1")
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        in_flight: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            for item in batches:
                # (frames, boxes) or (frames, boxes, frame_ids) — the
                # indexed form uploads each unique frame once (see __call__)
                in_flight.append(pool.submit(self._dispatch, *item))
                if len(in_flight) > depth:
                    out = in_flight.popleft().result()
                    yield {k: np.asarray(v) for k, v in out.items()}
            while in_flight:
                out = in_flight.popleft().result()
                yield {k: np.asarray(v) for k, v in out.items()}

    def predict_frame(
        self,
        frame: np.ndarray,
        boxes: np.ndarray | None = None,
        buckets: tuple[int, ...] | None = None,
        nms: str | None = None,
        nms_threshold: float = 0.9,
        nms_sigmas: np.ndarray | None = None,
        detector_threshold: float | None = None,
    ) -> dict:
        """Variable-count detector boxes on one frame: pads the box list to
        the next bucket size (bounding recompilation to len(buckets) programs)
        and strips the padding from the outputs. Default buckets come from
        the per-hardware autotune record: the measured-latency ladder when a
        bucket sweep was recorded (`tuned_bucket_ladder` — rungs that don't
        beat padding up to the next rung are pruned), else powers of two up
        to the autotuned serving batch (`tuned_serving_batch`). The frame is
        likewise zero-padded to a `frame_size_multiple` size bucket so
        variable camera resolutions stay within a bounded program count.

        nms: None | "oks" | "soft_oks" — pose-level OKS-NMS over the
        results (duplicate detector boxes yield duplicate poses otherwise;
        ops/oks_nms.py). Pose score = mean over keypoints of
        score·probability (the eval pipeline's instance score); box w·h is
        the OKS area. Adds "pose_scores" to the output; "soft_oks" returns
        decayed scores.

        boxes=None (standalone mode, needs `detector=`): the framework's
        own person detector supplies the boxes, which are returned under
        "boxes" (aspect-expanded, the geometry the crops actually used)."""
        if boxes is None:
            if self.detector is None:
                raise ValueError(
                    "predict_frame needs boxes, or construct the predictor "
                    "with detector= for standalone mode"
                )
            from probpose_pytorch_tpu.detect.pipeline import (
                expand_detections,
            )

            det, _ = self.detector.detect_frame(frame, detector_threshold)
            boxes = expand_detections(det, self.input_size)
            out = self.predict_frame(
                frame, boxes, buckets, nms, nms_threshold, nms_sigmas
            )
            if out:
                kept = out.get("keep")
                out["boxes"] = boxes if kept is None else boxes[kept]
            else:
                out = {"boxes": boxes}
            return out
        if nms is not None:
            raw = self.predict_frame(frame, boxes, buckets)
            if not raw:
                return raw
            from probpose_pytorch_tpu.ops.oks_nms import oks_nms, soft_oks_nms

            pose_scores = (
                raw["scores"] * raw["probabilities"][:, 0, :]
            ).mean(axis=1)
            boxes = np.asarray(boxes, np.float32)
            areas = boxes[:, 2] * boxes[:, 3]
            if nms == "oks":
                keep = oks_nms(
                    raw["keypoints"], pose_scores, areas,
                    threshold=nms_threshold, sigmas=nms_sigmas,
                )
                kept_scores = pose_scores[keep]
            elif nms == "soft_oks":
                keep, kept_scores = soft_oks_nms(
                    raw["keypoints"], pose_scores, areas,
                    threshold=nms_threshold, sigmas=nms_sigmas,
                )
            else:
                raise ValueError(f"unknown nms mode {nms!r}")
            out = {k: v[keep] for k, v in raw.items()}
            out["pose_scores"] = np.asarray(kept_scores, np.float32)
            # Input-box indices of the kept poses, so callers (e.g. the
            # video pipeline) can map outputs back to their detector boxes.
            out["keep"] = np.asarray(keep, np.int64)
            return out
        if buckets is None:
            buckets = tuned_bucket_ladder()
        if buckets is None:
            top = tuned_serving_batch()
            buckets = tuple(
                b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512) if b < top
            ) + (top,)
        n = len(boxes)
        if n == 0:
            return {}
        bucket = next((b for b in buckets if b >= n), None)
        if bucket is None:
            parts = [
                self.predict_frame(frame, boxes[i : i + buckets[-1]], buckets)
                for i in range(0, n, buckets[-1])
            ]
            return {
                k: np.concatenate([p[k] for p in parts]) for k in parts[0]
            }
        m = self.frame_size_multiple
        if m:
            Hs, Ws = frame.shape[:2]
            pad_h, pad_w = -Hs % m, -Ws % m
            if pad_h or pad_w:
                frame = np.pad(
                    frame, ((0, pad_h), (0, pad_w), (0, 0))
                )
        padded = np.concatenate(
            [boxes, np.tile(boxes[-1:], (bucket - n, 1))], axis=0
        ).astype(np.float32)
        if self.mesh is None:
            # indexed: the frame crosses the host->device link ONCE, not
            # once per bucket row
            out = self(
                frame[None], padded, np.zeros((bucket,), np.int32)
            )
        else:
            out = self(np.broadcast_to(frame, (bucket, *frame.shape)), padded)
        return {k: v[:n] for k, v in out.items()}


def load_predictor(
    checkpoint_dir: str | Path,
    config_path: str | Path | None = None,
    ema: bool = False,
    quantize: str | None = None,
    mesh: Any = None,
    flip_test: bool = False,
    scale_test: tuple[float, ...] = (),
    scale_test_scores: str = "unit",
    calibration: dict | None = None,
) -> TopDownPredictor:
    """Build a predictor from an Orbax checkpoint directory (+ config JSON,
    defaulting to <ckpt>/../config.json then flagship defaults)."""
    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    checkpoint_dir = Path(checkpoint_dir)
    if config_path is None:
        candidate = checkpoint_dir.parent / "config.json"
        config_path = candidate if candidate.exists() else None
    cfg = (
        TrainConfig.load(config_path) if config_path else TrainConfig()
    )
    from probpose_pytorch_tpu.train.loop import restore_state_with_layout

    trainer = Trainer.create(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(checkpoint_dir)
    # layout-aware: a checkpoint saved from a tensor-parallel 'fused_tp' run
    # (head-major qkv columns) converts automatically for this single-device
    # predictor, and vice versa.
    state = restore_state_with_layout(ckpt, trainer.state, cfg)
    params = state.ema_params if (ema and state.ema_params is not None) else state.params
    variables = {"params": params, "batch_stats": state.batch_stats}
    return TopDownPredictor(
        model=trainer.model,
        variables=variables,
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
        quantize=quantize,
        mesh=mesh,
        flip_test=flip_test,
        scale_test=scale_test,
        scale_test_scores=scale_test_scores,
        calibration=calibration,
    )


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="ProbPose-TPU inference")
    parser.add_argument("--checkpoint", type=Path, required=True,
                        help="Orbax checkpoint directory")
    parser.add_argument("--config", type=Path, default=None,
                        help="TrainConfig JSON (default: beside checkpoint)")
    parser.add_argument("--image", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--input-size", type=str, default=None,
                        help="H,W override")
    parser.add_argument("--normalize", action="store_true",
                        help="normalize heatmap PNGs to their max")
    parser.add_argument("--prob-threshold", type=float, default=0.9)
    parser.add_argument("--ema", action="store_true", help="use EMA params")
    parser.add_argument(
        "--int8",
        action="store_true",
        help="post-training int8-quantized backbone matmuls (opt-in; "
        "measured slower than bf16 at ViT-S/B on v5e — docs/PERF.md)",
    )
    parser.add_argument(
        "--int8-weight-only",
        action="store_true",
        help="weight-only int8 backbone matmuls (bf16 activations): the "
        "latency-mode variant for weight-bound geometries (wide models, "
        "tiny batches)",
    )
    parser.add_argument(
        "--flip-test",
        action="store_true",
        help="flip-test TTA: average predictions with the horizontally "
        "mirrored forward (COCO-17 left/right pairs)",
    )
    parser.add_argument(
        "--scale-test", type=str, default="",
        help="multi-scale TTA: comma-separated box scales (e.g. "
        "'0.9,1.0,1.1'); predictions decode per scale and average in "
        "frame space",
    )
    args = parser.parse_args(argv)

    import PIL.Image

    from probpose_pytorch_tpu.viz import draw_keypoints

    predictor = load_predictor(
        args.checkpoint,
        args.config,
        ema=args.ema,
        quantize=(
            "int8_wo" if args.int8_weight_only
            else "int8" if args.int8
            else None
        ),
        flip_test=args.flip_test,
        scale_test=tuple(
            float(s) for s in args.scale_test.split(",") if s.strip()
        ),
    )
    predictor.return_heatmaps = True  # one forward serves decode + PNG dump
    if args.input_size:
        h, w = (int(v) for v in args.input_size.split(","))
        predictor.input_size = (h, w)

    image = PIL.Image.open(args.image).convert("RGB")
    frame = np.asarray(image, np.uint8)[None]
    # Whole-image box (the reference CLI resizes the full image,
    # inference.py:74-75).
    box = np.array(
        [[0, 0, frame.shape[2], frame.shape[1]]], np.float32
    )
    out = predictor(frame, box)

    args.output.mkdir(parents=True, exist_ok=True)
    # Per-keypoint heatmap PNG dump (inference.py:92-105) from the same
    # forward that produced the keypoints.
    hm = out.pop("heatmaps")[0].astype(np.float32)
    from matplotlib import colormaps

    for i in range(hm.shape[0]):
        h = hm[i] / hm[i].max() if args.normalize and hm[i].max() > 0 else hm[i]
        arr = (colormaps["inferno"](h) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(args.output / f"heatmap_{i}.png")

    rendered = draw_keypoints(
        image,
        out["keypoints"][0],
        out["probabilities"][0, 0],
        prob_threshold=args.prob_threshold,
    )
    rendered.save(args.output / "output_image.png")
    (args.output / "predictions.json").write_text(
        json.dumps(
            {k: v.tolist() for k, v in out.items()}, indent=2
        )
    )
    print(f"wrote {args.output}/output_image.png, heatmap_*.png, predictions.json")


if __name__ == "__main__":
    main()
