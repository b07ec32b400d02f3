"""Detector serving + the standalone end-to-end pipeline
(frame -> person boxes -> top-down pose -> COCO AP).

Greenfield superset (the reference has no detector — SURVEY.md §2.4): this
closes the one external dependency the top-down pipeline had. The GT-box
eval path (eval/pipeline.evaluate_topdown) measures pose quality in
isolation; `evaluate_detector_topdown` here runs the REAL protocol — the
model finds its own people — and reports the same COCO keypoint summary,
so the detector's cost shows up as the AP gap between the two.

Device work (resize -> detector forward -> peak decode) is one jitted
program per frame-size bucket; score thresholding and the box handoff are
host-side where dynamic shapes are free.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from pathlib import Path
from typing import Any

import numpy as np

from probpose_pytorch_tpu.data.coco import expand_bbox, parse_coco_annotations
from probpose_pytorch_tpu.detect.codec import decode_boxes, decode_poses

__all__ = [
    "DetectorPredictor",
    "BottomUpPredictor",
    "box_iou_matrix",
    "detection_pr",
    "evaluate_detector_topdown",
    "evaluate_bottomup",
]


def _device_frames(frames: np.ndarray, mesh: Any) -> tuple[Any, int]:
    """Host frames -> device input (padded to the data axis on a mesh).

    Returns (device_or_host_frames, n_real_rows). Zero-pad frames are full
    batch members (decoded then dropped) — acceptable because serving
    batches are small and the pad fraction is < 1/dp."""
    n = len(frames)
    if mesh is None:
        return frames, n
    from probpose_pytorch_tpu.parallel.sharding import shard_batch

    dp = dict(mesh.shape).get("data", 1)
    if n % dp:
        frames = np.pad(frames, ((0, dp - n % dp), (0, 0), (0, 0), (0, 0)))
    return shard_batch(np.ascontiguousarray(frames), mesh), n


@dataclasses.dataclass
class DetectorPredictor:
    """Batched frames -> thresholded person boxes.

    The frame is resized to the detector's input size on device (the same
    fused `crop_resize` the pose path uses, full-frame box), the forward and
    the top-K peak decode run in the same jitted program, and decoded boxes
    are un-mapped to native frame pixels. One compiled program per frame
    shape; pair with frame-size bucketing upstream for camera streams.
    """

    model: Any
    variables: Any
    score_threshold: float = 0.3
    max_detections: int = 64
    # jax.sharding.Mesh for data-parallel serving: frames shard over the
    # "data" axis (batches pad up to a multiple of it), params replicate
    # via GSPMD. Same contract as TopDownPredictor(mesh=...).
    mesh: Any = None

    def __post_init__(self):
        import jax

        self._jax = jax
        self._jitted: dict[tuple, Any] = {}
        if self.mesh is not None:
            from probpose_pytorch_tpu.parallel.sharding import shard_params

            self.variables = shard_params(self.variables, self.mesh)

    def _fn(self):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        def run(variables, frames):
            B, Hf, Wf, _ = frames.shape
            Hd, Wd = self.model.img_size
            full = jnp.tile(
                jnp.array([[0.0, 0.0, Wf, Hf]], jnp.float32), (B, 1)
            )
            imgs = crop_resize(frames, full, (Hd, Wd), "bilinear_matmul")
            pred = self.model.apply(variables, imgs, train=False)
            boxes, scores = decode_boxes(
                pred["center"],
                pred["size"],
                pred["offset"],
                k=self.max_detections,
                stride=self.model.out_stride,
            )
            # Back to native frame pixels.
            sx, sy = Wf / Wd, Hf / Hd
            boxes = boxes * jnp.array([sx, sy, sx, sy], jnp.float32)
            return boxes, scores

        return run

    def __call__(self, frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """frames (B, H, W, 3) uint8 -> (boxes (B, K, 4), scores (B, K))
        in frame pixels, score-descending, UNthresholded."""
        frames, n = _device_frames(np.asarray(frames, np.uint8), self.mesh)
        key = frames.shape
        if key not in self._jitted:
            self._jitted[key] = self._jax.jit(self._fn())
        boxes, scores = self._jitted[key](self.variables, frames)
        return np.asarray(boxes)[:n], np.asarray(scores)[:n]

    def detect_frame(
        self, frame: np.ndarray, score_threshold: float | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """One frame -> (boxes (n, 4), scores (n,)) above the threshold."""
        thr = (
            self.score_threshold
            if score_threshold is None
            else score_threshold
        )
        boxes, scores = self(frame[None])
        keep = scores[0] >= thr
        return boxes[0][keep], scores[0][keep]


@dataclasses.dataclass
class BottomUpPredictor:
    """Single-stage multi-person pose: batched frames -> every person's
    pose in ONE forward (CenterNet objects-as-points decode — no detector
    -> crop -> top-down round trip).

    Same serving shape discipline as DetectorPredictor: on-device full-frame
    resize, forward, peak decode and joint gather in one jitted program per
    frame shape; score thresholding on host. With a plain regression model
    each joint inherits its person's center score; with joint-heatmap
    refinement heads (model kpt_heatmaps=True) the decode snaps joints to
    same-type heatmap peaks and `keypoint_scores` carries real per-joint
    confidences (detect/codec.decode_poses)."""

    model: Any
    variables: Any
    score_threshold: float = 0.3
    max_detections: int = 32
    # jax.sharding.Mesh for data-parallel serving (see DetectorPredictor).
    mesh: Any = None

    def __post_init__(self):
        import jax

        self._jax = jax
        self._jitted: dict[tuple, Any] = {}
        if self.mesh is not None:
            from probpose_pytorch_tpu.parallel.sharding import shard_params

            self.variables = shard_params(self.variables, self.mesh)

    def _fn(self):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        def run(variables, frames):
            B, Hf, Wf, _ = frames.shape
            Hd, Wd = self.model.img_size
            full = jnp.tile(
                jnp.array([[0.0, 0.0, Wf, Hf]], jnp.float32), (B, 1)
            )
            imgs = crop_resize(frames, full, (Hd, Wd), "bilinear_matmul")
            pred = self.model.apply(variables, imgs, train=False)
            boxes, scores, poses, kscores = decode_poses(
                pred["center"],
                pred["size"],
                pred["offset"],
                pred["kpts"],
                k=self.max_detections,
                stride=self.model.out_stride,
                kpt_heat=pred.get("kpt_heat"),
                kpt_offset=pred.get("kpt_offset"),
            )
            sx, sy = Wf / Wd, Hf / Hd
            boxes = boxes * jnp.array([sx, sy, sx, sy], jnp.float32)
            poses = poses * jnp.array([sx, sy], jnp.float32)
            return boxes, scores, poses, kscores

        return run

    def dispatch(self, frames: np.ndarray) -> dict:
        """Non-blocking enqueue: frames (B, H, W, 3) uint8 -> dict of
        in-flight device arrays (boxes (B, K, 4), scores (B, K), keypoints
        (B, K, Kj, 2), keypoint_scores (B, K, Kj)) — the serving front
        (serve.server.FrameBatcher) overlaps the next batch's assembly
        under this batch's compute and reads back on its completion
        thread."""
        frames, n = _device_frames(np.asarray(frames, np.uint8), self.mesh)
        key = frames.shape
        if key not in self._jitted:
            self._jitted[key] = self._jax.jit(self._fn())
        boxes, scores, poses, kscores = self._jitted[key](
            self.variables, frames
        )
        return dict(
            boxes=boxes[:n],
            scores=scores[:n],
            keypoints=poses[:n],
            keypoint_scores=kscores[:n],
        )

    def __call__(
        self, frames: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """frames (B, H, W, 3) uint8 -> (boxes (B, K, 4), scores (B, K),
        poses (B, K, Kj, 2), keypoint_scores (B, K, Kj)) in frame pixels,
        score-descending, UNthresholded."""
        out = self.dispatch(np.asarray(frames, np.uint8))
        return (
            np.asarray(out["boxes"]),
            np.asarray(out["scores"]),
            np.asarray(out["keypoints"]),
            np.asarray(out["keypoint_scores"]),
        )

    def predict_frame(
        self, frame: np.ndarray, score_threshold: float | None = None
    ) -> dict[str, np.ndarray]:
        """One frame -> dict(keypoints (n, Kj, 2), scores (n,),
        boxes (n, 4), keypoint_scores (n, Kj)) above the threshold,
        frame pixels."""
        thr = (
            self.score_threshold
            if score_threshold is None
            else score_threshold
        )
        boxes, scores, poses, kscores = self(frame[None])
        keep = scores[0] >= thr
        return dict(
            keypoints=poses[0][keep],
            scores=scores[0][keep],
            boxes=boxes[0][keep],
            keypoint_scores=kscores[0][keep],
        )


def expand_detections(
    det_boxes: np.ndarray,
    input_size: tuple[int, int],
    bbox_scale: float = 1.25,
) -> np.ndarray:
    """Detector boxes -> pose crop boxes: pad each to the pose input's
    aspect ratio and expand by `bbox_scale` about the center (the same
    `expand_bbox` conditioning pose training used). (n, 4) xywh in, out."""
    det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 4)
    if len(det_boxes) == 0:
        return np.zeros((0, 4), np.float32)
    # Degenerate (zero-size) detections would divide by zero in the aspect
    # conditioning; floor them at 1 px instead of crashing the pipeline.
    det_boxes = det_boxes.copy()
    det_boxes[:, 2:] = np.maximum(det_boxes[:, 2:], 1.0)
    H, W = input_size
    return np.stack(
        [expand_bbox(b, scale=bbox_scale, aspect=W / H) for b in det_boxes]
    ).astype(np.float32)


def box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between xywh box sets a (N, 4) and b (M, 4) -> (N, M)."""
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    ax0, ay0 = a[:, 0], a[:, 1]
    ax1, ay1 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx0, by0 = b[:, 0], b[:, 1]
    bx1, by1 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.maximum(
        np.minimum(ax1[:, None], bx1[None]) - np.maximum(ax0[:, None], bx0[None]),
        0.0,
    )
    iy = np.maximum(
        np.minimum(ay1[:, None], by1[None]) - np.maximum(ay0[:, None], by0[None]),
        0.0,
    )
    inter = ix * iy
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return inter / np.maximum(union, 1e-12)


def detection_pr(
    images: list[dict],
    iou_threshold: float = 0.5,
) -> dict[str, float]:
    """Single-class detection AP/recall at one IoU threshold.

    images: [{dt_boxes (D, 4), dt_scores (D,), gt_boxes (G, 4),
    ignore_boxes (I, 4)}]. Greedy score-descending matching, COCO-style:
    a detection matching an ignore region (IoU vs its area, crowd-like)
    is neither TP nor FP. AP is the area under the interpolated
    precision-recall curve (all-point interpolation).
    """
    rows = []  # (score, is_tp)
    n_gt = 0
    for im in images:
        dt = np.asarray(im["dt_boxes"], np.float64).reshape(-1, 4)
        sc = np.asarray(im["dt_scores"], np.float64).reshape(-1)
        gt = np.asarray(im["gt_boxes"], np.float64).reshape(-1, 4)
        ig = np.asarray(
            im.get("ignore_boxes", np.zeros((0, 4))), np.float64
        ).reshape(-1, 4)
        n_gt += len(gt)
        order = np.argsort(-sc, kind="stable")
        ious = box_iou_matrix(dt, gt) if len(dt) and len(gt) else None
        taken = np.zeros(len(gt), bool)
        for d in order:
            matched = False
            if ious is not None:
                free = ~taken
                if free.any():
                    cand = np.where(free, ious[d], -1.0)
                    g = int(np.argmax(cand))
                    if cand[g] >= iou_threshold:
                        taken[g] = True
                        rows.append((sc[d], 1))
                        matched = True
            if matched:
                continue
            # Ignore absorption: intersection over DETECTION area (the
            # crowd-style overlap — the region may be much larger than any
            # single person).
            absorbed = False
            if len(ig):
                box = np.asarray(im["dt_boxes"], np.float64)[d]
                ix = np.maximum(
                    np.minimum(box[0] + box[2], ig[:, 0] + ig[:, 2])
                    - np.maximum(box[0], ig[:, 0]),
                    0,
                )
                iy = np.maximum(
                    np.minimum(box[1] + box[3], ig[:, 1] + ig[:, 3])
                    - np.maximum(box[1], ig[:, 1]),
                    0,
                )
                frac = (ix * iy) / max(box[2] * box[3], 1e-12)
                absorbed = bool((frac >= iou_threshold).any())
            if not absorbed:
                rows.append((sc[d], 0))
    if not rows or n_gt == 0:
        return dict(ap=0.0, recall=0.0, n_gt=n_gt, n_dt=len(rows))
    rows.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in rows])
    fp = np.cumsum([1 - r[1] for r in rows])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    # All-point interpolation: precision envelope from the right.
    prec_env = np.maximum.accumulate(precision[::-1])[::-1]
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, prec_env):
        ap += (r - prev_r) * p
        prev_r = r
    return dict(
        ap=float(ap),
        recall=float(recall[-1]),
        n_gt=int(n_gt),
        n_dt=len(rows),
    )


def evaluate_detector_topdown(
    pose_predictor: Any,
    detector: DetectorPredictor,
    annotation_file: str | Path,
    image_root: str | Path,
    bbox_scale: float = 1.25,
    score_threshold: float | None = None,
    max_images: int | None = None,
    nms: str | None = None,
    sigmas: np.ndarray | None = None,
    verbose: bool = False,
) -> dict[str, float]:
    """End-to-end COCO keypoint AP with DETECTOR boxes (the real protocol;
    the GT-box path in eval/pipeline.py isolates pose quality instead).

    Per val image: detect people -> expand each box to the pose crop aspect
    (`expand_bbox`, the same conditioning training used) -> bucketed
    `predict_frame` -> instance score = det_score * mean(keypoint score *
    presence) -> streaming evaluator with the full ignore machinery.
    Also reports the detector's own box AP@0.5 under `det_ap50`.
    """
    import PIL.Image

    from probpose_pytorch_tpu.eval.coco_eval import COCOKeypointEvaluator

    records, ignores = parse_coco_annotations(
        annotation_file, image_root, include_ignore=True
    )
    gt_by_image: dict[int, list] = defaultdict(list)
    for rec in records:
        gt_by_image[int(rec["image_id"])].append(rec)
    ignores_by_image: dict[int, list] = defaultdict(list)
    for rec in ignores:
        ignores_by_image[int(rec["image_id"])].append(rec)

    import json

    raw = json.loads(Path(annotation_file).read_text())
    images = sorted(raw["images"], key=lambda im: im["id"])
    if max_images is not None:
        images = images[:max_images]

    from probpose_pytorch_tpu.data.coco import COCO_SIGMAS

    evaluator = COCOKeypointEvaluator(
        np.asarray(COCO_SIGMAS if sigmas is None else sigmas)
    )
    det_images = []
    K = None
    for n_done, im in enumerate(images):
        image_id = int(im["id"])
        gts = gt_by_image.get(image_id, [])
        igs = ignores_by_image.get(image_id, [])
        if not gts and not igs:
            continue
        frame = np.asarray(
            PIL.Image.open(Path(image_root) / im["file_name"]).convert(
                "RGB"
            ),
            np.uint8,
        )
        det_boxes, det_scores = detector.detect_frame(
            frame, score_threshold
        )
        det_images.append(
            dict(
                dt_boxes=det_boxes,
                dt_scores=det_scores,
                gt_boxes=np.asarray(
                    [g["bbox"] for g in gts], np.float64
                ).reshape(-1, 4),
                ignore_boxes=np.asarray(
                    [g["bbox"] for g in igs], np.float64
                ).reshape(-1, 4),
            )
        )
        if K is None and gts:
            K = gts[0]["keypoints"].shape[0]
        dts, scores = [], []
        if len(det_boxes):
            crops = expand_detections(
                det_boxes, pose_predictor.input_size, bbox_scale
            )
            out = pose_predictor.predict_frame(frame, crops, nms=nms)
            if nms is not None and "keep" in out:
                det_scores = det_scores[out["keep"]]
            kpts = out["keypoints"]  # (n, K, 2) frame space
            sc = out["scores"]
            pr = out["probabilities"][:, 0]
            for j in range(len(kpts)):
                dts.append(
                    np.concatenate(
                        [kpts[j], sc[j].reshape(-1, 1)], axis=1
                    )
                )
                scores.append(
                    float(det_scores[j]) * float(np.mean(sc[j] * pr[j]))
                )
        Kk = K if K is not None else len(
            igs[0]["keypoints"]
        ) if igs else 17
        gt = (
            np.stack([
                np.concatenate(
                    [g["keypoints"][:, :2], g["keypoints"][:, 2:3]], axis=1
                )
                for g in gts
            ])
            if gts
            else np.zeros((0, Kk, 3))
        )
        areas = [float(g["area"]) for g in gts]
        boxes = [np.asarray(g["bbox"], np.float64) for g in gts]
        ignore = list((gt[:, :, 2] > 0).sum(axis=1) == 0) if gts else []
        crowd = [False] * len(ignore)
        for ig in igs:
            kp = np.asarray(ig["keypoints"], np.float64)
            if kp.shape[0] != Kk:
                kp = np.zeros((Kk, 3), np.float64)
            gt = np.concatenate([gt, kp[None]], axis=0)
            areas.append(float(ig["area"]))
            boxes.append(np.asarray(ig["bbox"], np.float64))
            ignore.append(True)
            crowd.append(bool(ig["iscrowd"]))
        evaluator.add_image(
            np.stack(dts) if dts else np.zeros((0, gt.shape[1], 3)),
            np.asarray(scores),
            gt,
            np.asarray(areas),
            np.stack(boxes) if boxes else None,
            gt_ignore=np.asarray(ignore, bool),
            gt_crowd=np.asarray(crowd, bool),
        )
        if verbose and (n_done + 1) % 25 == 0:
            print(f"[detect-eval] {n_done + 1}/{len(images)} images",
                  flush=True)
    summary = evaluator.summarize()
    det = detection_pr(det_images)
    summary["det_ap50"] = det["ap"]
    summary["det_recall50"] = det["recall"]
    summary["det_per_image"] = (
        det["n_dt"] / max(len(det_images), 1)
    )
    return summary


def evaluate_bottomup(
    predictor: BottomUpPredictor,
    annotation_file: str | Path,
    image_root: str | Path,
    score_threshold: float | None = None,
    max_images: int | None = None,
    sigmas: np.ndarray | None = None,
    verbose: bool = False,
) -> dict[str, float]:
    """COCO keypoint AP for the single-stage pose family: one forward per
    frame yields every person's pose (no boxes in, none of the top-down
    machinery). GT assembly and the ignore protocol match
    evaluate_detector_topdown; each joint carries its person's center
    score, and the instance score is the center score. Also reports the
    center head's box AP@0.5 (`det_ap50`)."""
    import PIL.Image

    from probpose_pytorch_tpu.data.coco import COCO_SIGMAS
    from probpose_pytorch_tpu.eval.coco_eval import COCOKeypointEvaluator

    records, ignores = parse_coco_annotations(
        annotation_file, image_root, include_ignore=True
    )
    gt_by_image: dict[int, list] = defaultdict(list)
    for rec in records:
        gt_by_image[int(rec["image_id"])].append(rec)
    ignores_by_image: dict[int, list] = defaultdict(list)
    for rec in ignores:
        ignores_by_image[int(rec["image_id"])].append(rec)

    import json

    raw = json.loads(Path(annotation_file).read_text())
    images = sorted(raw["images"], key=lambda im: im["id"])
    if max_images is not None:
        images = images[:max_images]

    evaluator = COCOKeypointEvaluator(
        np.asarray(COCO_SIGMAS if sigmas is None else sigmas)
    )
    det_images = []
    K = None
    for n_done, im in enumerate(images):
        image_id = int(im["id"])
        gts = gt_by_image.get(image_id, [])
        igs = ignores_by_image.get(image_id, [])
        if not gts and not igs:
            continue
        frame = np.asarray(
            PIL.Image.open(Path(image_root) / im["file_name"]).convert(
                "RGB"
            ),
            np.uint8,
        )
        out = predictor.predict_frame(frame, score_threshold)
        det_images.append(
            dict(
                dt_boxes=out["boxes"],
                dt_scores=out["scores"],
                gt_boxes=np.asarray(
                    [g["bbox"] for g in gts], np.float64
                ).reshape(-1, 4),
                ignore_boxes=np.asarray(
                    [g["bbox"] for g in igs], np.float64
                ).reshape(-1, 4),
            )
        )
        if K is None and gts:
            K = gts[0]["keypoints"].shape[0]
        dts, scores = [], []
        js = out.get("keypoint_scores")
        for j in range(len(out["keypoints"])):
            s = float(out["scores"][j])
            if js is not None:
                # Per-joint confidences (heatmap-refined models emit real
                # ones; plain regression tiles the center score, making
                # s * mean a rank-preserving s^2): mirror the top-down
                # instance scoring det * mean(joint confidence).
                col = np.asarray(js[j], np.float64).reshape(-1, 1)
                inst = s * float(np.mean(js[j]))
            else:
                col = np.full((out["keypoints"].shape[1], 1), s)
                inst = s
            dts.append(
                np.concatenate([out["keypoints"][j], col], axis=1)
            )
            scores.append(inst)
        Kk = K if K is not None else len(
            igs[0]["keypoints"]
        ) if igs else 17
        gt = (
            np.stack([g["keypoints"] for g in gts]).astype(np.float64)
            if gts
            else np.zeros((0, Kk, 3))
        )
        areas = [float(g["area"]) for g in gts]
        boxes = [np.asarray(g["bbox"], np.float64) for g in gts]
        ignore = list((gt[:, :, 2] > 0).sum(axis=1) == 0) if gts else []
        crowd = [False] * len(ignore)
        for ig in igs:
            kp = np.asarray(ig["keypoints"], np.float64)
            if kp.shape[0] != Kk:
                kp = np.zeros((Kk, 3), np.float64)
            gt = np.concatenate([gt, kp[None]], axis=0)
            areas.append(float(ig["area"]))
            boxes.append(np.asarray(ig["bbox"], np.float64))
            ignore.append(True)
            crowd.append(bool(ig["iscrowd"]))
        evaluator.add_image(
            np.stack(dts) if dts else np.zeros((0, gt.shape[1], 3)),
            np.asarray(scores),
            gt,
            np.asarray(areas),
            np.stack(boxes) if boxes else None,
            gt_ignore=np.asarray(ignore, bool),
            gt_crowd=np.asarray(crowd, bool),
        )
        if verbose and (n_done + 1) % 25 == 0:
            print(f"[bottomup-eval] {n_done + 1}/{len(images)} images",
                  flush=True)
    summary = evaluator.summarize()
    det = detection_pr(det_images)
    summary["det_ap50"] = det["ap"]
    summary["det_recall50"] = det["recall"]
    return summary
