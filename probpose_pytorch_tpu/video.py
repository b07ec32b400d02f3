"""Video / frame-sequence pose pipeline: boxes -> poses -> tracks -> smooth.

End-to-end sequence tool stitching the serving stack together: per-frame
top-down prediction (`TopDownPredictor.predict_frame` — autotuned batch
buckets, optional pose OKS-NMS), OKS-greedy track association across frames
(`OksTracker`), and one-euro temporal smoothing per track
(`utils/smoothing.PoseSmoother`). The reference has no video pipeline at all
(SURVEY.md §2.4) — its inference.py handles one image; this is part of the
superset serving stack.

    python -m probpose_pytorch_tpu.video \
        --checkpoint runs/flagship/checkpoints --frames frames_dir_or.npy \
        [--boxes boxes.json] [--fps 30] [--nms soft_oks] [--no-smooth] \
        [--render] --out out_dir
    # or --bottomup run_dir/bundle_dir: single-stage multi-person pose,
    # one forward per frame, no boxes/detector (run_video_bottomup)

Frames: a directory of image files (sorted by name; any PIL format) or a
`.npy`/`.npz` stack of shape (T, H, W, 3) uint8. Boxes: a JSON list with one
entry per frame, each a list of [x, y, w, h] detector boxes (frame pixels);
omitted boxes default to one full-frame box per frame, matching the single
-image CLI. Output: `poses.jsonl` (one record per frame: track ids, raw and
smoothed keypoints, per-keypoint probabilities, pose scores) and, with
--render, `frame_%06d.png` overlays.

Host-side control plane (tracking, smoothing, IO) runs in NumPy; all chip
work stays inside the predictor's jitted per-bucket programs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from probpose_pytorch_tpu.ops.oks_nms import COCO_SIGMAS

__all__ = [
    "iter_frames",
    "load_boxes",
    "OksTracker",
    "run_video",
    "run_video_bottomup",
    "run_video_stream",
    "main",
]

_IMAGE_SUFFIXES = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def iter_frames(path: str | Path) -> Iterator[np.ndarray]:
    """Yield (H, W, 3) uint8 frames from a directory of images (sorted by
    filename) or a .npy/.npz stack of shape (T, H, W, 3)."""
    path = Path(path)
    if path.is_dir():
        files = sorted(
            p for p in path.iterdir()
            if p.suffix.lower() in _IMAGE_SUFFIXES
        )
        if not files:
            raise ValueError(f"no image files in {path}")
        import PIL.Image

        for f in files:
            yield np.asarray(PIL.Image.open(f).convert("RGB"), np.uint8)
        return
    if path.suffix == ".npy":
        stack = np.load(path)
    elif path.suffix == ".npz":
        with np.load(path) as z:
            stack = z[z.files[0]]
    else:
        raise ValueError(
            f"{path}: expected a frame directory or a .npy/.npz stack"
        )
    if stack.ndim != 4 or stack.shape[-1] != 3:
        raise ValueError(f"frame stack shape {stack.shape} != (T, H, W, 3)")
    for frame in stack:
        yield np.asarray(frame, np.uint8)


def load_boxes(path: str | Path) -> list[np.ndarray]:
    """Per-frame detector boxes from JSON: a list with one entry per frame,
    each a list of [x, y, w, h]. Empty per-frame lists are allowed."""
    raw = json.loads(Path(path).read_text())
    if not isinstance(raw, list):
        raise ValueError(f"{path}: expected a per-frame list of box lists")
    return [np.asarray(b, np.float32).reshape(-1, 4) for b in raw]


def _cross_oks(
    kpts_a: np.ndarray,
    areas_a: np.ndarray,
    kpts_b: np.ndarray,
    areas_b: np.ndarray,
    sigmas: np.ndarray,
) -> np.ndarray:
    """(M, N) OKS between two pose sets — the detection-vs-detection form
    (mean of the two instance areas), as in ops/oks_nms.pairwise_oks."""
    var = (2.0 * np.asarray(sigmas, np.float32)) ** 2
    d2 = np.sum(
        (kpts_a[:, None, :, :] - kpts_b[None, :, :, :]) ** 2, axis=-1
    )  # (M, N, K)
    mean_area = 0.5 * (
        np.asarray(areas_a, np.float32)[:, None]
        + np.asarray(areas_b, np.float32)[None, :]
    )
    e = d2 / var[None, None, :] / (mean_area[..., None] + np.spacing(1)) / 2.0
    return np.exp(-e).mean(axis=-1)


def _frame_boxes(boxes, i: int, frame: np.ndarray) -> np.ndarray:
    """Per-frame detector boxes for frame i (full-frame box when boxes is
    None); a short boxes list raises a clear error instead of an IndexError
    mid-run after poses.jsonl has been partially written."""
    if boxes is None:
        return np.array(
            [[0, 0, frame.shape[1], frame.shape[0]]], np.float32
        )
    if i >= len(boxes):
        raise ValueError(
            f"boxes list has {len(boxes)} entries but the sequence has at "
            f"least {i + 1} frames — one [[x,y,w,h], ...] entry per frame"
        )
    return np.asarray(boxes[i], np.float32).reshape(-1, 4)


def _empty_record(i: int, t: float, fb: np.ndarray) -> dict:
    """Record for a frame with no detector boxes (shared by both modes)."""
    return {
        "frame": i, "t": t,
        "track_ids": np.zeros((0,), np.int64),
        "keypoints": np.zeros((0, 0, 2), np.float32),
        "smoothed": np.zeros((0, 0, 2), np.float32),
        "probabilities": np.zeros((0, 0), np.float32),
        "scores": np.zeros((0, 0), np.float32),
        "pose_scores": np.zeros((0,), np.float32),
        "boxes": fb,
    }


class OksTracker:
    """Greedy OKS association of per-frame poses to persistent track ids.

    update(keypoints (N, K, 2), areas (N,)) -> (N,) int track ids. Each call
    advances one frame: current poses are matched to the previous poses of
    live tracks greedily by descending OKS (one-to-one, matches below
    `threshold` rejected); unmatched poses open new tracks; tracks unseen
    for more than `max_gap` frames are dropped. Detector/tracker ids, when
    available, are better — this covers the common top-down case where the
    detector is stateless.
    """

    def __init__(
        self,
        threshold: float = 0.3,
        max_gap: int = 30,
        sigmas: np.ndarray | None = None,
    ):
        self.threshold = float(threshold)
        self.max_gap = int(max_gap)
        # None -> resolved at first update: COCO sigmas for K=17, else a
        # uniform sigma at the COCO mean (non-COCO keypoint sets).
        self.sigmas = (
            None if sigmas is None else np.asarray(sigmas, np.float32)
        )
        self._next_id = 0
        self._frame = 0
        # tid -> (keypoints (K, 2), area, last-seen frame index)
        self._tracks: dict[int, tuple[np.ndarray, float, int]] = {}

    def update(self, keypoints: np.ndarray, areas: np.ndarray) -> np.ndarray:
        kpts = np.asarray(keypoints, np.float32)
        ar = np.asarray(areas, np.float32).reshape(-1)
        n = len(kpts)
        if self.sigmas is None and n:
            k = kpts.shape[1]
            self.sigmas = (
                np.asarray(COCO_SIGMAS, np.float32)
                if k == len(COCO_SIGMAS)
                else np.full((k,), float(np.mean(COCO_SIGMAS)), np.float32)
            )
        ids = np.full((n,), -1, np.int64)
        live = [
            (tid, k, a)
            for tid, (k, a, seen) in self._tracks.items()
            if self._frame - seen <= self.max_gap
        ]
        if live and n:
            prev_k = np.stack([k for _, k, _ in live])
            prev_a = np.asarray([a for _, _, a in live], np.float32)
            oks = _cross_oks(prev_k, prev_a, kpts, ar, self.sigmas)
            flat = np.argsort(-oks, axis=None)
            used_t = np.zeros(len(live), bool)
            used_p = np.zeros(n, bool)
            for f in flat:
                ti, pi = divmod(int(f), n)
                if used_t[ti] or used_p[pi]:
                    continue
                if oks[ti, pi] < self.threshold:
                    break  # sorted descending — nothing further matches
                ids[pi] = live[ti][0]
                used_t[ti] = used_p[pi] = True
        for i in range(n):
            if ids[i] < 0:
                ids[i] = self._next_id
                self._next_id += 1
            self._tracks[int(ids[i])] = (kpts[i], float(ar[i]), self._frame)
        stale = [
            tid
            for tid, (_, _, seen) in self._tracks.items()
            if self._frame - seen > self.max_gap
        ]
        for tid in stale:
            del self._tracks[tid]
        self._frame += 1
        return ids


def detector_boxes(
    detector,
    frame: np.ndarray,
    input_size: tuple[int, int],
    bbox_scale: float = 1.25,
    threshold: float | None = None,
) -> np.ndarray:
    """Person-detector boxes for one frame, expanded to the pose crop
    aspect (`expand_bbox`, the same conditioning pose training used) —
    ready for `predict_frame`."""
    from probpose_pytorch_tpu.detect.pipeline import expand_detections

    det, _ = detector.detect_frame(frame, threshold)
    return expand_detections(det, input_size, bbox_scale)


def run_video(
    predictor,
    frames,
    boxes: Sequence[np.ndarray] | None = None,
    fps: float = 30.0,
    nms: str | None = "soft_oks",
    nms_threshold: float = 0.9,
    smooth: bool = True,
    track_threshold: float = 0.3,
    smoother=None,
    tracker: OksTracker | None = None,
    detector=None,
    detector_threshold: float | None = None,
    bbox_scale: float = 1.25,
    fused: bool = False,
    max_people: int = 8,
) -> Iterator[dict]:
    """Run the full sequence pipeline; yields one record dict per frame.

    predictor: a TopDownPredictor. frames: iterable of (H, W, 3) uint8.
    boxes: per-frame (N_i, 4) xywh arrays (None -> one full-frame box per
    frame). detector: a detect.DetectorPredictor — boxes then come from the
    framework's own person detector per frame (standalone mode; mutually
    exclusive with `boxes`). fused=True (needs `detector`): detector ->
    crops -> pose runs as ONE jitted program per frame (detect/fused.py —
    no host box round-trip, every frame carries `max_people` static pose
    slots; best for constant-size frames, each new frame shape compiles a
    new program). Records carry numpy arrays: frame index, time,
    track_ids, keypoints (raw), smoothed (== raw when smooth=False),
    probabilities, scores, pose_scores, boxes.
    """
    if detector is not None and boxes is not None:
        raise ValueError("pass either boxes or a detector, not both")
    if fused and detector is None:
        raise ValueError("fused=True needs a detector")
    if tracker is None:
        tracker = OksTracker(threshold=track_threshold)
    if smooth and smoother is None:
        from probpose_pytorch_tpu.utils.smoothing import PoseSmoother

        smoother = PoseSmoother()
    fused_pred = None
    if fused:
        from probpose_pytorch_tpu.detect.fused import FusedTwoStagePredictor

        fused_pred = FusedTwoStagePredictor(
            detector=detector,
            pose=predictor,
            max_people=min(max_people, detector.max_detections),
            bbox_scale=bbox_scale,
            score_threshold=(
                detector.score_threshold
                if detector_threshold is None
                else detector_threshold
            ),
        )
    for i, frame in enumerate(frames):
        t = i / fps
        if fused_pred is not None:
            out = fused_pred.predict_frame(frame)
            fb = out.pop("boxes")
            out.pop("det_scores")
            if len(fb) == 0:
                yield _empty_record(i, t, fb)
                continue
            yield _postprocess_frame(
                out, fb, i, t, nms, nms_threshold, tracker, smoother
            )
            continue
        if detector is not None:
            fb = detector_boxes(
                detector, frame, predictor.input_size,
                bbox_scale, detector_threshold,
            )
        else:
            fb = _frame_boxes(boxes, i, frame)
        if len(fb) == 0:
            yield _empty_record(i, t, fb)
            continue
        out = predictor.predict_frame(frame, fb)
        yield _postprocess_frame(
            out, fb, i, t, nms, nms_threshold, tracker, smoother
        )


def _postprocess_frame(
    out: dict,
    fb: np.ndarray,
    i: int,
    t: float,
    nms: str | None,
    nms_threshold: float,
    tracker: OksTracker,
    smoother,
) -> dict:
    """Shared per-frame tail: optional pose OKS-NMS (same scoring as
    predict_frame's), track association, smoothing, record assembly."""
    kpts = out["keypoints"]
    probs = out["probabilities"][:, 0, :]
    pose_scores = (out["scores"] * probs).mean(axis=1)
    kept_boxes = fb
    if nms is not None and len(kpts):
        from probpose_pytorch_tpu.ops.oks_nms import oks_nms, soft_oks_nms

        areas = fb[:, 2] * fb[:, 3]
        if nms == "oks":
            keep = oks_nms(kpts, pose_scores, areas,
                           threshold=nms_threshold)
            kept_scores = pose_scores[keep]
        elif nms == "soft_oks":
            keep, kept_scores = soft_oks_nms(
                kpts, pose_scores, areas, threshold=nms_threshold
            )
        else:
            raise ValueError(f"unknown nms mode {nms!r}")
        out = {k: v[keep] for k, v in out.items()}
        kpts, probs = out["keypoints"], out["probabilities"][:, 0, :]
        pose_scores = np.asarray(kept_scores, np.float32)
        kept_boxes = fb[keep]
    areas = kept_boxes[:, 2] * kept_boxes[:, 3]
    ids = tracker.update(kpts, areas)
    smoothed = smoother.update(kpts, ids, t) if smoother is not None else kpts
    return {
        "frame": i,
        "t": t,
        "track_ids": ids,
        "keypoints": kpts,
        "smoothed": smoothed,
        "probabilities": probs,
        "scores": out["scores"],
        "pose_scores": np.asarray(pose_scores, np.float32),
        "boxes": kept_boxes,
    }


def run_video_fused_stream(
    fused,
    frames,
    fps: float = 30.0,
    nms: str | None = "soft_oks",
    nms_threshold: float = 0.9,
    smooth: bool = True,
    track_threshold: float = 0.3,
    batch: int = 4,
    frame_shape: tuple[int, int] | None = None,
    depth: int = 2,
    score_threshold: float | None = None,
) -> Iterator[dict]:
    """Standalone THROUGHPUT mode: batches of whole frames through the
    fused two-stage program (detect/fused.py — detector -> crops -> pose,
    one dispatch per `batch` frames), with up to `depth` batches in
    flight so the next batch's upload overlaps this batch's compute.
    The standalone analogue of `run_video_stream` (which needs
    precomputed boxes): frames in, tracked/smoothed pose records out,
    no boxes file and no per-frame host round-trip.

    frame_shape: (H, W) every frame zero-pads to (default: the first
    frame's shape) — one compiled program total. Results lag the input
    by up to `batch` frames plus the in-flight window; tracking and
    smoothing stay sequential on the reassembled frames."""
    from collections import deque

    tracker = OksTracker(threshold=track_threshold)
    smoother = None
    if smooth:
        from probpose_pytorch_tpu.utils.smoothing import PoseSmoother

        smoother = PoseSmoother()
    thr = (
        fused.score_threshold if score_threshold is None
        else score_threshold
    )
    state = {"shape": frame_shape}

    def pad_frame(frame: np.ndarray) -> np.ndarray:
        if state["shape"] is None:
            state["shape"] = tuple(frame.shape[:2])
        H, W = state["shape"]
        h, w = frame.shape[:2]
        if (h, w) == (H, W):
            return frame
        if h > H or w > W:
            raise ValueError(
                f"frame {(h, w)} exceeds the stream shape {(H, W)} — "
                "pass frame_shape= sized for the largest frame"
            )
        return np.pad(frame, ((0, H - h), (0, W - w), (0, 0)))

    def postprocess(out_host: dict, i: int, t: float) -> dict:
        keep = out_host["det_scores"] >= thr
        fb = out_host["boxes"][keep]
        if not keep.any():
            return _empty_record(i, t, fb)
        row = {
            k: v[keep]
            for k, v in out_host.items()
            if k not in ("boxes", "det_scores")
        }
        return _postprocess_frame(
            row, fb, i, t, nms, nms_threshold, tracker, smoother
        )

    in_flight: deque = deque()  # (device out dict, [frame indices])

    def drain_one():
        dev, idxs = in_flight.popleft()
        host = {k: np.asarray(v) for k, v in dev.items()}
        for j, i in enumerate(idxs):
            yield postprocess(
                {k: v[j] for k, v in host.items()}, i, i / fps
            )

    buf, idxs = [], []
    for i, frame in enumerate(frames):
        buf.append(pad_frame(np.asarray(frame, np.uint8)))
        idxs.append(i)
        if len(buf) == batch:
            in_flight.append(
                (fused.dispatch(np.stack(buf)), list(idxs))
            )
            buf, idxs = [], []
            if len(in_flight) > depth:
                yield from drain_one()
    if buf:  # short tail: zero-pad frames, drop pad rows
        n = len(buf)
        buf += [np.zeros_like(buf[0])] * (batch - n)
        in_flight.append(
            (fused.dispatch(np.stack(buf)), list(idxs))
        )
    while in_flight:
        yield from drain_one()


def run_video_bottomup(
    predictor,
    frames,
    fps: float = 30.0,
    nms: str | None = "soft_oks",
    nms_threshold: float = 0.9,
    smooth: bool = True,
    track_threshold: float = 0.3,
    score_threshold: float | None = None,
) -> Iterator[dict]:
    """Single-stage mode of `run_video`: every person's pose comes from ONE
    forward per frame (detect.BottomUpPredictor / serve.BottomUpBundle) —
    no boxes, no detector, cost per frame instead of per person. Records
    match `run_video`'s exactly; `scores` carries the predictor's
    per-joint confidences (real ones from joint-heatmap-refined models,
    the person's center score tiled per joint otherwise) and
    `probabilities` is all-ones (every joint renders)."""
    tracker = OksTracker(threshold=track_threshold)
    smoother = None
    if smooth:
        from probpose_pytorch_tpu.utils.smoothing import PoseSmoother

        smoother = PoseSmoother()
    for i, frame in enumerate(frames):
        t = i / fps
        out = predictor.predict_frame(
            np.asarray(frame, np.uint8), score_threshold
        )
        kpts = np.asarray(out["keypoints"], np.float32)
        sc = np.asarray(out["scores"], np.float32)
        fb = np.asarray(out["boxes"], np.float32).reshape(-1, 4)
        if len(kpts) == 0:
            yield _empty_record(i, t, fb)
            continue
        Kj = kpts.shape[1]
        js = out.get("keypoint_scores")
        joint_scores = (
            np.asarray(js, np.float32)
            if js is not None
            else np.tile(sc[:, None], (1, Kj))
        )
        yield _postprocess_frame(
            {
                "keypoints": kpts,
                "scores": joint_scores,
                "probabilities": np.ones((len(kpts), 1, Kj), np.float32),
            },
            fb, i, t, nms, nms_threshold, tracker, smoother,
        )


def run_video_stream(
    predictor,
    frames,
    boxes: Sequence[np.ndarray] | None = None,
    fps: float = 30.0,
    nms: str | None = "soft_oks",
    nms_threshold: float = 0.9,
    smooth: bool = True,
    track_threshold: float = 0.3,
    batch: int | None = None,
    frame_shape: tuple[int, int] | None = None,
    depth: int = 2,
) -> Iterator[dict]:
    """Throughput mode of `run_video`: crops from consecutive frames are
    flattened into fixed-size `batch` device dispatches driven through
    `predictor.predict_stream` (upload/compute overlap), so sequence
    processing rides the chip's throughput path instead of one
    latency-sized program per frame. One compiled program total
    (fixed batch, fixed frame shape).

    frame_shape: (H, W) every frame is zero-padded to (default: the first
    frame's shape rounded up to the predictor's `frame_size_multiple`);
    frames exceeding it raise. batch: crops per dispatch (default: the
    autotuned serving batch). Output records are identical in shape and
    semantics to `run_video`'s; NMS runs host-side per frame with the same
    scoring. Results lag the input by up to `batch` crops plus `depth`
    in-flight batches — tracking and smoothing stay sequential on the
    reassembled frames.

    Each unique frame crosses the host->device link ONCE per batch
    (indexed serving — frame_ids into a deduplicated frame array, padded
    to a power-of-two count so the program set stays bounded); measured
    6.7x over per-frame mode at 6 people/frame on the tunneled v5e link
    (docs/PERF.md "video stream"). Numerics: identical to per-frame mode
    in f32 (tested); under bf16 the different batch shape compiles a
    different XLA tiling, so results can differ at heatmap-noise level —
    sub-pixel on trained models (the indexed gather itself is bit-exact
    vs replicated frames at equal batch, verified on TPU).
    """
    from collections import deque

    if batch is None:
        from probpose_pytorch_tpu.inference import tuned_serving_batch

        batch = tuned_serving_batch()
    tracker = OksTracker(threshold=track_threshold)
    smoother = None
    if smooth:
        from probpose_pytorch_tpu.utils.smoothing import PoseSmoother

        smoother = PoseSmoother()

    meta: deque = deque()  # (frame_idx, t, n_boxes, fb) in input order
    state = {"shape": frame_shape}

    def pad_frame(frame: np.ndarray) -> np.ndarray:
        if state["shape"] is None:
            # ServingBundles have a fixed exported frame shape instead of a
            # size multiple — callers pass frame_shape= for those (the CLI
            # does); live predictors derive it from the first frame.
            m = getattr(predictor, "frame_size_multiple", None) or 1
            state["shape"] = (
                -(-frame.shape[0] // m) * m,
                -(-frame.shape[1] // m) * m,
            )
        Hf, Wf = state["shape"]
        H, W = frame.shape[:2]
        if H > Hf or W > Wf:
            raise ValueError(
                f"frame {(H, W)} exceeds the stream frame shape "
                f"{(Hf, Wf)} — pass frame_shape= explicitly"
            )
        if (H, W) == (Hf, Wf):
            return frame
        return np.pad(frame, ((0, Hf - H), (0, Wf - W), (0, 0)))

    def assemble(buf_frames, buf_b, buf_ids):
        """Pad crops to `batch` and unique frames to a power-of-two count
        (bounded program set: log2(batch) frame buckets x 1 crop bucket).
        Frames upload ONCE each (indexed serving, inference.py __call__
        frame_ids) — the transfer win that makes this the throughput mode."""
        pad = batch - len(buf_b)
        if pad:
            buf_b = buf_b + [buf_b[-1]] * pad
            buf_ids = buf_ids + [buf_ids[-1]] * pad
        f = len(buf_frames)
        fcap = 1 << (f - 1).bit_length() if f > 1 else 1
        fcap = min(fcap, batch)  # F never needs to exceed the crop count
        if fcap > f:
            blank = np.zeros_like(buf_frames[0])
            buf_frames = buf_frames + [blank] * (fcap - f)
        return (
            np.stack(buf_frames),
            np.stack(buf_b).astype(np.float32),
            np.asarray(buf_ids, np.int32),
        )

    def crop_batches():
        buf_frames: list = []
        buf_b: list = []
        buf_ids: list = []
        for i, frame in enumerate(frames):
            t = i / fps
            fb = _frame_boxes(boxes, i, frame)
            meta.append((i, t, len(fb), fb))
            if len(fb) == 0:
                continue
            padded = pad_frame(np.asarray(frame, np.uint8))
            remaining = list(fb)
            while remaining:
                space = batch - len(buf_b)
                take = remaining[:space]
                remaining = remaining[space:]
                buf_frames.append(padded)
                buf_ids.extend([len(buf_frames) - 1] * len(take))
                buf_b.extend(take)
                if len(buf_b) == batch:
                    yield assemble(buf_frames, buf_b, buf_ids)
                    buf_frames, buf_b, buf_ids = [], [], []
        if buf_b:
            yield assemble(buf_frames, buf_b, buf_ids)

    rows: dict[str, np.ndarray] = {}
    filled = 0

    def pop_frames():
        nonlocal filled, rows
        while meta and meta[0][2] <= filled:
            i, t, n, fb = meta.popleft()
            if n == 0:
                yield _empty_record(i, t, fb)
                continue
            out = {k: v[:n] for k, v in rows.items()}
            rows = {k: v[n:] for k, v in rows.items()}
            filled -= n
            yield _postprocess_frame(
                out, fb, i, t, nms, nms_threshold, tracker, smoother
            )

    for got in predictor.predict_stream(crop_batches(), depth=depth):
        pending = sum(m[2] for m in meta) - filled
        valid = min(batch, pending)  # tail batch carries padding rows
        for k, v in got.items():
            v = v[:valid]
            rows[k] = (
                np.concatenate([rows[k], v]) if k in rows else v.copy()
            )
        filled += valid
        yield from pop_frames()
    yield from pop_frames()


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="ProbPose-TPU video / frame-sequence inference"
    )
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", type=Path,
                     help="Orbax checkpoint directory (live predictor)")
    src.add_argument("--bundle", type=Path,
                     help="exported StableHLO bundle directory "
                     "(no model code needed)")
    src.add_argument("--bottomup", type=Path,
                     help="single-stage pose model (detect.train "
                     "--keypoints run dir or an exported bottom-up "
                     "bundle): every person's pose in one forward per "
                     "frame — no --boxes / --detector needed")
    parser.add_argument("--config", type=Path, default=None,
                        help="TrainConfig JSON (default: beside checkpoint)")
    parser.add_argument("--frames", type=Path, required=True,
                        help="frame directory or (T, H, W, 3) .npy/.npz")
    parser.add_argument("--detector", type=Path, default=None,
                        help="person-detector checkpoint directory "
                        "(detect.train CLI output): boxes then come from "
                        "the framework's own detector — standalone mode, "
                        "no --boxes file needed")
    parser.add_argument("--detector-threshold", type=float, default=None,
                        help="detection score threshold override")
    parser.add_argument("--fused", action="store_true",
                        help="with --detector: run detector -> crops -> "
                        "pose as ONE jitted program per frame (no host "
                        "box round-trip; --max-people static pose slots)")
    parser.add_argument("--max-people", type=int, default=8,
                        help="pose slots per frame in --fused mode")
    parser.add_argument("--boxes", type=Path, default=None,
                        help="per-frame [[x,y,w,h], ...] JSON "
                        "(default: full-frame box)")
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--fps", type=float, default=30.0)
    parser.add_argument("--nms", choices=("oks", "soft_oks", "none"),
                        default="soft_oks")
    parser.add_argument("--nms-threshold", type=float, default=0.9)
    parser.add_argument("--track-threshold", type=float, default=0.3)
    parser.add_argument("--no-smooth", action="store_true")
    parser.add_argument("--render", action="store_true",
                        help="write frame_%%06d.png overlays")
    parser.add_argument("--prob-threshold", type=float, default=0.9)
    parser.add_argument("--ema", action="store_true", help="use EMA params")
    parser.add_argument("--flip-test", action="store_true")
    parser.add_argument("--stream-batch", type=int, default=None,
                        help="throughput mode: flatten crops across frames "
                        "into batches of this size driven through "
                        "predict_stream (0 = autotuned batch); incompatible "
                        "with --render (results lag the frame read)")
    parser.add_argument("--stream-frame-shape", type=str, default=None,
                        metavar="H,W",
                        help="pad every frame to this shape in stream mode "
                        "(default: the first frame's shape rounded up to "
                        "the predictor's size multiple — set this when "
                        "later frames are LARGER than the first; bundles "
                        "use their exported shape)")
    args = parser.parse_args(argv)
    if args.stream_batch is not None and args.render:
        parser.error("--stream-batch is incompatible with --render")
    if args.bottomup is not None:
        for flag, bad in (("--boxes", args.boxes),
                          ("--detector", args.detector),
                          ("--stream-batch", args.stream_batch)):
            if bad is not None:
                parser.error(f"--bottomup is incompatible with {flag} "
                             "(the model finds people itself, per frame)")
        if args.ema or args.flip_test:
            parser.error("--ema/--flip-test are top-down options")

    stream_frame_shape = None
    stream_batch_default = None
    if args.bottomup:
        from probpose_pytorch_tpu.detect.train import load_bottomup

        # threshold applies at predict time (works for bundles too, whose
        # default is baked into the manifest at export)
        predictor = load_bottomup(args.bottomup)
    elif args.bundle:
        if args.ema or args.flip_test:
            parser.error(
                "--ema/--flip-test are baked in at bundle export time"
            )
        from probpose_pytorch_tpu.serve import ServingBundle

        predictor = ServingBundle.load(args.bundle)
        stream_frame_shape = predictor.frame_shape
        stream_batch_default = predictor.buckets[-1]
    else:
        from probpose_pytorch_tpu.inference import load_predictor

        predictor = load_predictor(
            args.checkpoint, args.config, ema=args.ema,
            flip_test=args.flip_test,
        )
    boxes = load_boxes(args.boxes) if args.boxes else None
    detector = None
    if args.detector is not None:
        if args.boxes is not None:
            parser.error("--detector and --boxes are mutually exclusive")
        if args.stream_batch is not None and not args.fused:
            parser.error(
                "--detector runs per-frame; in --stream-batch throughput "
                "mode add --fused (batched whole-frame fused dispatches) "
                "or pre-compute boxes to a JSON file"
            )
        from probpose_pytorch_tpu.detect.train import load_detector

        detector = load_detector(args.detector)
    if args.fused and detector is None:
        parser.error("--fused needs --detector")
    args.out.mkdir(parents=True, exist_ok=True)

    frames = iter_frames(args.frames)
    last: dict = {}
    if args.render:
        # run_video pulls each frame before yielding its record, so `last`
        # always holds the record's frame when the record arrives.
        def _remember(it):
            for f in it:
                last["frame"] = f
                yield f

        frames = _remember(frames)

    common = dict(
        boxes=boxes,
        fps=args.fps,
        nms=None if args.nms == "none" else args.nms,
        nms_threshold=args.nms_threshold,
        smooth=not args.no_smooth,
        track_threshold=args.track_threshold,
    )
    if args.bottomup:
        del common["boxes"]  # bottom-up takes whole frames
        records = run_video_bottomup(
            predictor, frames,
            score_threshold=args.detector_threshold,
            **common,
        )
    elif args.stream_batch is not None and args.fused:
        from probpose_pytorch_tpu.detect.fused import FusedTwoStagePredictor

        del common["boxes"]  # whole frames in, like bottom-up
        if args.stream_frame_shape is not None:
            stream_frame_shape = tuple(
                int(v) for v in args.stream_frame_shape.split(",")
            )
            if len(stream_frame_shape) != 2:
                parser.error("--stream-frame-shape expects H,W")
        fused_pred = FusedTwoStagePredictor(
            detector=detector,
            pose=predictor,
            max_people=min(args.max_people, detector.max_detections),
            score_threshold=(
                detector.score_threshold
                if args.detector_threshold is None
                else args.detector_threshold
            ),
        )
        records = run_video_fused_stream(
            fused_pred, frames,
            batch=args.stream_batch or 4,  # frames per dispatch here
            frame_shape=stream_frame_shape,
            **common,
        )
    elif args.stream_batch is not None:
        if args.stream_frame_shape is not None:
            if args.bundle:
                parser.error(
                    "--stream-frame-shape is fixed at bundle export time"
                )
            stream_frame_shape = tuple(
                int(v) for v in args.stream_frame_shape.split(",")
            )
            if len(stream_frame_shape) != 2:
                parser.error("--stream-frame-shape expects H,W")
        records = run_video_stream(
            predictor, frames,
            batch=args.stream_batch or stream_batch_default or None,
            frame_shape=stream_frame_shape,
            **common,
        )
    else:
        records = run_video(
            predictor, frames,
            detector=detector,
            detector_threshold=args.detector_threshold,
            fused=args.fused,
            max_people=args.max_people,
            **common,
        )

    n = 0
    with (args.out / "poses.jsonl").open("w") as sink:
        for rec in records:
            sink.write(json.dumps(
                {
                    k: v.tolist() if isinstance(v, np.ndarray) else v
                    for k, v in rec.items()
                }
            ) + "\n")
            if args.render:
                import PIL.Image

                from probpose_pytorch_tpu.viz import draw_keypoints

                img = PIL.Image.fromarray(last["frame"])
                for p in range(len(rec["smoothed"])):
                    draw_keypoints(
                        img,
                        rec["smoothed"][p],
                        rec["probabilities"][p],
                        prob_threshold=args.prob_threshold,
                    )
                img.save(args.out / f"frame_{rec['frame']:06d}.png")
            n += 1
    print(f"wrote {args.out}/poses.jsonl ({n} frames)")


if __name__ == "__main__":
    main()
