"""StableHLO serving bundles: export the predictor, reload without model code.

`export_predictor_bundle` serializes the `TopDownPredictor`'s whole fused
serving program — per-box crop+resize+normalize, backbone forward (incl. the
packed Pallas attention kernel when exporting on TPU), head, expected-value
decode, frame-space un-mapping — once per batch bucket via `jax.export`, and
writes a self-contained directory:

    bundle/
      manifest.json   # input size, buckets, frame shape, platforms, version
      params.npz      # the variables pytree, flattened with '/'-joined keys
      fn_b{B}.bin     # serialized jax.export.Exported per bucket

`ServingBundle.load` reconstructs a callable from that directory alone — no
flax model definitions, TrainConfig, or codec objects needed on the serving
host; the deployment dependency surface is jax + numpy. This is the
TPU-native replacement for the reference's pickle-the-module deployment
(reference inference.py:62-70) and mirrors the `predict_frame` bucket-padding
semantics (inference.py): variable box counts pad up a bucket ladder, frames
zero-pad to the exported frame shape (zero padding is exactly the
out-of-extent sampling the cropper already performs, ops/preprocess.py).

Buckets are static shapes by design: one compiled program per bucket matches
how the predictor already serves (XLA static-shape model), and keeps the
Pallas kernel's grid static.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Any, Sequence

import numpy as np

BUNDLE_VERSION = 2  # v2: bottom-up programs return 4-tuple (+keypoint_scores)


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    from collections.abc import Mapping

    out: dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            if "/" in k:
                raise ValueError(f"param key {k!r} contains '/'")
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        *parents, leaf = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = value
    return tree


def _pow2_ladder(top: int) -> list[int]:
    """Powers of two up to `top`, plus `top` itself — callers pad the
    unique-frame count to min(next_pow2(F), bucket), so a non-power-of-two
    bucket needs its own rung."""
    out, f = [], 1
    while f <= top:
        out.append(f)
        f *= 2
    if out[-1] != top:
        out.append(top)
    return out


def export_predictor_bundle(
    predictor: Any,
    out_dir: str | Path,
    buckets: Sequence[int],
    frame_shape: tuple[int, int],
    platforms: Sequence[str] | None = None,
    indexed: bool = True,
) -> Path:
    """Export `predictor` (a TopDownPredictor) as a serving bundle.

    buckets: ascending batch sizes; each becomes one exported program.
    frame_shape: (H, W) of the frames the bundle accepts (smaller frames
        zero-pad up at serve time).
    platforms: lowering platforms for `jax.export` (default: the current
        backend).
    indexed: also export frame-indexed programs (fn_b{B}_f{F}.bin for F a
        power of two <= B) — the serving host then uploads each unique
        frame once per dispatch instead of once per crop
        (inference.py:__call__ frame_ids); predict_frame and the
        micro-batching server use them automatically when present.
    """
    import jax

    if predictor.mesh is not None:
        raise ValueError(
            "bundle export is single-device; pass a mesh-free predictor "
            "(data-parallel serving replicates single-device bundles)"
        )
    buckets = tuple(sorted(int(b) for b in buckets))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"invalid buckets {buckets}")
    Hf, Wf = (int(v) for v in frame_shape)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    variables = predictor.variables
    var_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables,
    )
    fn = predictor._fn()
    kwargs = {"platforms": list(platforms)} if platforms else {}
    # Portable bundles (platforms beyond the current backend): Pallas
    # kernels only lower for TPU, so trace with the pure-XLA sparsemax
    # (identical math) and require a Pallas-free attention impl.
    import contextlib

    import jax as _jax

    portable = bool(platforms) and set(platforms) != {_jax.default_backend()}
    ctx: Any = contextlib.nullcontext()
    if portable:
        attn = getattr(predictor.model.backbone, "attn_impl", "einsum")
        if attn in ("fused", "fused_tp", "pallas"):
            raise ValueError(
                f"multi-platform export with attn_impl={attn!r}: the "
                "packed Pallas attention lowers for TPU only — export "
                "per-platform, or rebuild the predictor with "
                "attn_impl='einsum' for a portable bundle"
            )
        from probpose_pytorch_tpu.ops.sparsemax import force_xla_sparsemax

        ctx = force_xla_sparsemax()
    indexed_buckets: dict[str, list[int]] = {}
    with ctx:
        _export_programs(
            fn, var_abs, buckets, (Hf, Wf), kwargs, out_dir,
            indexed, indexed_buckets,
        )
    np.savez(out_dir / "params.npz", **_flatten(variables))
    manifest = {
        "version": BUNDLE_VERSION,
        "buckets": list(buckets),
        "frame_shape": [Hf, Wf],
        "input_size": list(predictor.input_size),
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "return_heatmaps": bool(predictor.return_heatmaps),
        # Informational: TTA baked into the exported programs (the program
        # IS the behavior; these let deploy tooling display it).
        "flip_test": bool(getattr(predictor, "flip_test", False)),
        "scale_test": list(getattr(predictor, "scale_test", ()) or ()),
        "calibration": {
            k: float(t)
            for k, t in (getattr(predictor, "calibration", None) or {}).items()
        },
        "indexed_buckets": indexed_buckets,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out_dir


def _export_programs(
    fn, var_abs, buckets, frame_hw, kwargs, out_dir, indexed,
    indexed_buckets,
) -> None:
    import jax

    Hf, Wf = frame_hw
    for b in buckets:
        exported = jax.export.export(jax.jit(fn), **kwargs)(
            var_abs,
            jax.ShapeDtypeStruct((b, Hf, Wf, 3), np.uint8),
            jax.ShapeDtypeStruct((b, 4), np.float32),
        )
        (out_dir / f"fn_b{b}.bin").write_bytes(exported.serialize())
        if indexed and b > 1:
            fs = _pow2_ladder(b)
            for f in fs:
                ex = jax.export.export(jax.jit(fn), **kwargs)(
                    var_abs,
                    jax.ShapeDtypeStruct((f, Hf, Wf, 3), np.uint8),
                    jax.ShapeDtypeStruct((b, 4), np.float32),
                    jax.ShapeDtypeStruct((b,), np.int32),
                )
                (out_dir / f"fn_b{b}_f{f}.bin").write_bytes(ex.serialize())
            indexed_buckets[str(b)] = fs


@dataclasses.dataclass
class ServingBundle:
    """A loaded serving bundle: frames + boxes -> keypoints, no model code.

    Programs deserialize lazily per bucket on first use.
    """

    directory: Path
    manifest: dict
    variables: dict
    # lazily-deserialized programs, keyed (bucket, unique-frame-count) —
    # a dataclass field (not load()-only state) so direct construction
    # works too
    _programs: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def load(cls, directory: str | Path) -> "ServingBundle":
        directory = Path(directory)
        manifest = json.loads((directory / "manifest.json").read_text())
        if manifest.get("kind", "pose") != "pose":
            raise ValueError(
                f"{directory} is a {manifest['kind']!r} bundle, not a pose "
                "bundle (detector bundles load with DetectorBundle)"
            )
        if manifest.get("version") != BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {manifest.get('version')} != "
                f"{BUNDLE_VERSION} (re-export with this release)"
            )
        with np.load(directory / "params.npz") as z:
            variables = _unflatten({k: z[k] for k in z.files})
        return cls(
            directory=directory, manifest=manifest, variables=variables
        )

    @property
    def buckets(self) -> tuple[int, ...]:
        return tuple(self.manifest["buckets"])

    @property
    def frame_shape(self) -> tuple[int, int]:
        return tuple(self.manifest["frame_shape"])

    @property
    def input_size(self) -> tuple[int, int]:
        """(H, W) crop size baked into the exported programs — same
        contract as TopDownPredictor.input_size (the eval pipeline reads
        it)."""
        return tuple(self.manifest["input_size"])

    @property
    def indexed_buckets(self) -> dict[int, tuple[int, ...]]:
        """{crop bucket: exported unique-frame counts} — empty for bundles
        exported with indexed=False or by older releases."""
        return {
            int(b): tuple(fs)
            for b, fs in self.manifest.get("indexed_buckets", {}).items()
        }

    def _program(self, bucket: int, f: int | None = None):
        key = (bucket, f)
        if key not in self._programs:
            import jax

            name = (
                f"fn_b{bucket}.bin" if f is None else f"fn_b{bucket}_f{f}.bin"
            )
            blob = (self.directory / name).read_bytes()
            self._programs[key] = jax.export.deserialize(bytearray(blob))
        return self._programs[key]

    def dispatch(
        self,
        frames: np.ndarray,
        boxes: np.ndarray,
        frame_ids: np.ndarray | None = None,
    ) -> dict:
        """Enqueue one batch; returns still-in-flight DEVICE arrays (JAX
        async dispatch) — the serving server's pipelined path. `__call__`
        is this plus the blocking host conversion."""
        b = len(boxes)
        if b not in self.buckets:
            raise ValueError(f"batch {b} is not an exported bucket {self.buckets}")
        frames = self._pad_frames(np.asarray(frames, np.uint8))
        if frame_ids is not None:
            fs = self.indexed_buckets.get(b, ())
            f = len(frames)
            if f not in fs:
                if f == b:
                    # no indexed program but one frame per crop anyway
                    # (e.g. bucket 1): a host-side gather is free here
                    return self._program(b).call(
                        self.variables,
                        frames[np.asarray(frame_ids, np.int64)],
                        np.asarray(boxes, np.float32),
                    )
                raise ValueError(
                    f"unique-frame count {f} not exported for bucket {b} "
                    f"(available: {fs})"
                )
            return self._program(b, f).call(
                self.variables,
                frames,
                np.asarray(boxes, np.float32),
                np.asarray(frame_ids, np.int32),
            )
        if len(frames) != b:
            raise ValueError(
                f"{len(frames)} frames != {b} boxes (pass frame_ids "
                "for indexed serving)"
            )
        return self._program(b).call(
            self.variables, frames, np.asarray(boxes, np.float32)
        )

    def __call__(
        self,
        frames: np.ndarray,
        boxes: np.ndarray,
        frame_ids: np.ndarray | None = None,
    ) -> dict:
        """frames: (B, H, W, 3) uint8 with (H, W) <= the exported frame
        shape (zero-padded up); boxes: (B, 4) xywh, B must be an exported
        bucket. Returns numpy arrays (frame-space keypoints etc.).

        frame_ids (B,) int switches to an indexed program (when the bundle
        exported them): frames then holds each unique frame once and its
        count must be one of `indexed_buckets[B]` (powers of two — pad
        with blank frames)."""
        out = self.dispatch(frames, boxes, frame_ids)
        return {k: np.asarray(v) for k, v in out.items()}

    def _pad_frames(self, frames: np.ndarray) -> np.ndarray:
        Hf, Wf = self.frame_shape
        B, H, W, C = frames.shape
        if (H, W) == (Hf, Wf):
            return frames
        if H > Hf or W > Wf:
            raise ValueError(
                f"frame {(H, W)} exceeds the exported shape {(Hf, Wf)}"
            )
        return np.pad(frames, ((0, 0), (0, Hf - H), (0, Wf - W), (0, 0)))

    def predict_stream(self, batches, depth: int = 2):
        """Stream serving over (frames, boxes[, frame_ids]) batches with
        uploads + dispatch on a worker thread (the bundle-side mirror of
        TopDownPredictor.predict_stream): batch i+1's transfer overlaps
        batch i's compute/readback. Yields output dicts in order. The
        3-tuple form uses the bundle's indexed programs (each unique frame
        uploads once)."""
        if depth < 1:
            raise ValueError("depth must be >= 1")
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            for item in batches:
                b = len(item[1])
                if b not in self.buckets:
                    raise ValueError(
                        f"batch {b} is not an exported bucket "
                        f"{self.buckets}"
                    )
                pending.append(pool.submit(self, *item))
                if len(pending) > depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def predict_frame(self, frame: np.ndarray, boxes: np.ndarray) -> dict:
        """Variable-count boxes on one frame: pads the box list to the next
        exported bucket (chunking past the largest) and strips the padding —
        the bundle-side mirror of TopDownPredictor.predict_frame."""
        n = len(boxes)
        if n == 0:
            return {}
        top = self.buckets[-1]
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:
            parts = [
                self.predict_frame(frame, boxes[i : i + top])
                for i in range(0, n, top)
            ]
            return {
                k: np.concatenate([p[k] for p in parts]) for k in parts[0]
            }
        boxes = np.asarray(boxes, np.float32)
        padded = np.concatenate(
            [boxes, np.tile(boxes[-1:], (bucket - n, 1))], axis=0
        )
        frame = np.asarray(frame, np.uint8)
        if 1 in self.indexed_buckets.get(bucket, ()):
            # one frame upload instead of `bucket` (indexed program)
            out = self(
                frame[None], padded, np.zeros((bucket,), np.int32)
            )
        else:
            out = self(
                np.broadcast_to(frame, (bucket, *frame.shape)), padded
            )
        return {k: v[:n] for k, v in out.items()}


def export_detector_bundle(
    detector: Any,
    out_dir: str | Path,
    frame_shapes: Sequence[tuple[int, int]],
    platforms: Sequence[str] | None = None,
) -> Path:
    """Export a `detect.DetectorPredictor` as a codeless bundle: one
    StableHLO program per accepted (H, W) frame shape (batch 1 — detection
    is per-frame), params, and a manifest. Smaller frames zero-pad up to
    the closest exported shape at serve time (zero padding is black
    content past the frame edge — it contains no people, and decoded box
    coordinates are unchanged since padding is bottom/right only).

    Together with `export_predictor_bundle` this makes the STANDALONE
    pipeline (frame -> detect -> pose) deployable with no model code: the
    serving host needs jax + numpy only. The detector is pure XLA convs
    (no Pallas), so multi-platform export needs no special casing."""
    import jax

    shapes = sorted({(int(h), int(w)) for h, w in frame_shapes})
    if not shapes:
        raise ValueError("need at least one frame shape")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    var_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        detector.variables,
    )
    fn = detector._fn()
    kwargs = {"platforms": list(platforms)} if platforms else {}
    for H, W in shapes:
        ex = jax.export.export(jax.jit(fn), **kwargs)(
            var_abs, jax.ShapeDtypeStruct((1, H, W, 3), np.uint8)
        )
        (out_dir / f"det_h{H}w{W}.bin").write_bytes(ex.serialize())
    np.savez(out_dir / "params.npz", **_flatten(detector.variables))
    manifest = {
        "version": BUNDLE_VERSION,
        "kind": "detector",
        "frame_shapes": [list(s) for s in shapes],
        "score_threshold": float(detector.score_threshold),
        "max_detections": int(detector.max_detections),
        "img_size": list(detector.model.img_size),
        "platforms": (
            list(platforms) if platforms else [jax.default_backend()]
        ),
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out_dir


@dataclasses.dataclass
class DetectorBundle:
    """A loaded detector bundle: frame -> (boxes, scores), no model code.
    Duck-types `detect.DetectorPredictor.detect_frame`, so it drops into
    every --detector surface (video, eval, HTTP server, predictor
    standalone mode)."""

    directory: Path
    manifest: dict
    variables: dict
    _programs: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def load(cls, directory: str | Path) -> "DetectorBundle":
        directory = Path(directory)
        manifest = json.loads((directory / "manifest.json").read_text())
        if manifest.get("kind") != "detector":
            raise ValueError(
                f"{directory} is not a detector bundle "
                f"(kind={manifest.get('kind')!r}; pose bundles load with "
                "ServingBundle)"
            )
        if manifest.get("version") != BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {manifest.get('version')} != "
                f"{BUNDLE_VERSION} (re-export with this release)"
            )
        with np.load(directory / "params.npz") as z:
            variables = _unflatten({k: z[k] for k in z.files})
        return cls(
            directory=directory, manifest=manifest, variables=variables
        )

    @property
    def frame_shapes(self) -> tuple[tuple[int, int], ...]:
        return tuple(tuple(s) for s in self.manifest["frame_shapes"])

    @property
    def score_threshold(self) -> float:
        return float(self.manifest["score_threshold"])

    def _program(self, shape: tuple[int, int]):
        if shape not in self._programs:
            import jax

            blob = (
                self.directory / f"det_h{shape[0]}w{shape[1]}.bin"
            ).read_bytes()
            self._programs[shape] = jax.export.deserialize(bytearray(blob))
        return self._programs[shape]

    def detect_frame(
        self, frame: np.ndarray, score_threshold: float | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """One (H, W, 3) uint8 frame -> (boxes (n, 4), scores (n,)) above
        the threshold, in frame pixels."""
        frame = np.asarray(frame, np.uint8)
        H, W = frame.shape[:2]
        fit = [
            s for s in self.frame_shapes if s[0] >= H and s[1] >= W
        ]
        if not fit:
            raise ValueError(
                f"frame {(H, W)} exceeds every exported shape "
                f"{self.frame_shapes}"
            )
        He, We = min(fit)
        if (H, W) != (He, We):
            frame = np.pad(frame, ((0, He - H), (0, We - W), (0, 0)))
        boxes, scores = self._program((He, We)).call(
            self.variables, frame[None]
        )
        boxes, scores = np.asarray(boxes[0]), np.asarray(scores[0])
        thr = (
            self.score_threshold
            if score_threshold is None
            else score_threshold
        )
        keep = scores >= thr
        return boxes[keep], scores[keep]


def export_bottomup_bundle(
    predictor: Any,
    out_dir: str | Path,
    frame_shapes: Sequence[tuple[int, int]],
    batches: Sequence[int] = (1,),
    platforms: Sequence[str] | None = None,
) -> Path:
    """Export a `detect.BottomUpPredictor` (single-stage multi-person
    pose) as a codeless bundle: one StableHLO program per (batch bucket,
    frame shape). Unlike the per-frame detector, bottom-up serving batches
    FRAMES (its whole point: frame rate independent of person count), so a
    batch ladder is first-class. Smaller frames zero-pad to the closest
    exported shape; short batches pad with zero frames and the outputs are
    trimmed (padding rows decode, but are dropped before return).

    Third family through the same deployment story as
    `export_predictor_bundle` (top-down) and `export_detector_bundle`:
    the serving host needs jax + numpy only."""
    import jax

    shapes = sorted({(int(h), int(w)) for h, w in frame_shapes})
    buckets = sorted({int(b) for b in batches})
    if not shapes or not buckets or buckets[0] < 1:
        raise ValueError("need at least one frame shape and batch >= 1")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    var_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        predictor.variables,
    )
    fn = predictor._fn()
    kwargs = {"platforms": list(platforms)} if platforms else {}
    for B in buckets:
        for H, W in shapes:
            ex = jax.export.export(jax.jit(fn), **kwargs)(
                var_abs, jax.ShapeDtypeStruct((B, H, W, 3), np.uint8)
            )
            (out_dir / f"bu_b{B}_h{H}w{W}.bin").write_bytes(ex.serialize())
    np.savez(out_dir / "params.npz", **_flatten(predictor.variables))
    manifest = {
        "version": BUNDLE_VERSION,
        "kind": "bottomup",
        "frame_shapes": [list(s) for s in shapes],
        "batches": buckets,
        "score_threshold": float(predictor.score_threshold),
        "max_detections": int(predictor.max_detections),
        "img_size": list(predictor.model.img_size),
        "num_keypoints": int(predictor.model.num_keypoints),
        "kpt_heatmaps": bool(
            getattr(predictor.model, "kpt_heatmaps", False)
        ),
        "platforms": (
            list(platforms) if platforms else [jax.default_backend()]
        ),
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out_dir


@dataclasses.dataclass
class BottomUpBundle:
    """A loaded single-stage pose bundle: frames -> every person's pose in
    one forward per frame, no model code. Duck-types
    `detect.BottomUpPredictor` (`__call__` and `predict_frame`), so
    `eval.run --bottomup`, the video pipeline, and the rehearsal scripts
    accept either."""

    directory: Path
    manifest: dict
    variables: dict
    _programs: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def load(cls, directory: str | Path) -> "BottomUpBundle":
        directory = Path(directory)
        manifest = json.loads((directory / "manifest.json").read_text())
        if manifest.get("kind") != "bottomup":
            raise ValueError(
                f"{directory} is not a bottom-up pose bundle "
                f"(kind={manifest.get('kind')!r})"
            )
        if manifest.get("version") != BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {manifest.get('version')} != "
                f"{BUNDLE_VERSION} (re-export with this release)"
            )
        with np.load(directory / "params.npz") as z:
            variables = _unflatten({k: z[k] for k in z.files})
        return cls(
            directory=directory, manifest=manifest, variables=variables
        )

    @property
    def frame_shapes(self) -> tuple[tuple[int, int], ...]:
        return tuple(tuple(s) for s in self.manifest["frame_shapes"])

    @property
    def batches(self) -> tuple[int, ...]:
        return tuple(self.manifest["batches"])

    @property
    def score_threshold(self) -> float:
        return float(self.manifest["score_threshold"])

    def _program(self, b: int, shape: tuple[int, int]):
        key = (b, shape)
        if key not in self._programs:
            import jax

            blob = (
                self.directory / f"bu_b{b}_h{shape[0]}w{shape[1]}.bin"
            ).read_bytes()
            self._programs[key] = jax.export.deserialize(bytearray(blob))
        return self._programs[key]

    def _fit_shape(self, H: int, W: int) -> tuple[int, int]:
        fit = [s for s in self.frame_shapes if s[0] >= H and s[1] >= W]
        if not fit:
            raise ValueError(
                f"frame {(H, W)} exceeds every exported shape "
                f"{self.frame_shapes}"
            )
        return min(fit)

    def dispatch(self, frames: np.ndarray) -> dict:
        """Non-blocking enqueue for the serving front: frames
        (B, H, W, 3) uint8, where B is an exported batch bucket and (H, W)
        an exported frame shape EXACTLY (the micro-batcher pads to both) ->
        dict of in-flight device arrays (boxes, scores, keypoints). The
        live predictor's `dispatch` counterpart."""
        frames = np.asarray(frames, np.uint8)
        B, H, W = frames.shape[:3]
        if B not in self.batches or (H, W) not in self.frame_shapes:
            raise ValueError(
                f"dispatch batch {B} / frame {(H, W)} not exported "
                f"(batches {self.batches}, shapes {self.frame_shapes})"
            )
        boxes, scores, poses, kscores = self._program(B, (H, W)).call(
            self.variables, frames
        )
        return dict(
            boxes=boxes,
            scores=scores,
            keypoints=poses,
            keypoint_scores=kscores,
        )

    def __call__(
        self, frames: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """frames (B, H, W, 3) uint8 -> (boxes (B, K, 4), scores (B, K),
        poses (B, K, Kj, 2), keypoint_scores (B, K, Kj)) in frame pixels,
        score-descending, UNthresholded — the live predictor's contract.
        B splits greedily over the exported batch buckets (largest bucket
        that fits, else the smallest bucket, zero-padded)."""
        frames = np.asarray(frames, np.uint8)
        B, H, W = frames.shape[:3]
        He, We = self._fit_shape(H, W)
        if (H, W) != (He, We):
            frames = np.pad(
                frames, ((0, 0), (0, He - H), (0, We - W), (0, 0))
            )
        buckets = self.batches
        outs: list[tuple] = []
        i = 0
        while i < B:
            left = B - i
            fits = [b for b in buckets if b <= left]
            b = max(fits) if fits else min(buckets)
            chunk = frames[i : i + min(b, left)]
            if len(chunk) < b:
                chunk = np.pad(
                    chunk, ((0, b - len(chunk)), (0, 0), (0, 0), (0, 0))
                )
            boxes, scores, poses, kscores = self._program(
                b, (He, We)
            ).call(self.variables, chunk)
            n = min(b, left)
            outs.append(
                (
                    np.asarray(boxes[:n]),
                    np.asarray(scores[:n]),
                    np.asarray(poses[:n]),
                    np.asarray(kscores[:n]),
                )
            )
            i += n
        return (
            np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
            np.concatenate([o[2] for o in outs]),
            np.concatenate([o[3] for o in outs]),
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
        boxes, scores, poses, kscores = self(
            np.asarray(frame, np.uint8)[None]
        )
        keep = scores[0] >= thr
        return dict(
            keypoints=poses[0][keep],
            scores=scores[0][keep],
            boxes=boxes[0][keep],
            keypoint_scores=kscores[0][keep],
        )


def export_fused_bundle(
    predictor,
    out_dir: str | Path,
    frame_shapes: Sequence[tuple[int, int]],
    batches: Sequence[int] = (1,),
    platforms: Sequence[str] | None = None,
) -> Path:
    """Export a `detect.FusedTwoStagePredictor` (detector -> crops -> pose
    in ONE program, detect/fused.py) as a codeless bundle: one StableHLO
    program per (batch, frame shape), BOTH stages' params in one npz
    (prefixed det/ and pose/). The serving host gets the fused path's
    single-dispatch latency with jax + numpy only — the deployment shape
    for per-frame standalone serving."""
    import jax

    shapes = sorted({(int(h), int(w)) for h, w in frame_shapes})
    buckets = sorted({int(b) for b in batches})
    if not shapes or not buckets or buckets[0] < 1:
        raise ValueError("need at least one frame shape and batch >= 1")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def _abs(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
            tree,
        )

    fn = predictor._fn()
    kwargs = {"platforms": list(platforms)} if platforms else {}
    det_abs = _abs(predictor.detector.variables)
    pose_abs = _abs(predictor.pose.variables)
    for B in buckets:
        for H, W in shapes:
            ex = jax.export.export(jax.jit(fn), **kwargs)(
                det_abs, pose_abs,
                jax.ShapeDtypeStruct((B, H, W, 3), np.uint8),
            )
            (out_dir / f"fused_b{B}_h{H}w{W}.bin").write_bytes(
                ex.serialize()
            )
    flat = _flatten(predictor.detector.variables, "det/")
    flat.update(_flatten(predictor.pose.variables, "pose/"))
    np.savez(out_dir / "params.npz", **flat)
    manifest = {
        "version": BUNDLE_VERSION,
        "kind": "fused",
        "frame_shapes": [list(s) for s in shapes],
        "batches": buckets,
        "score_threshold": float(predictor.score_threshold),
        "max_people": int(predictor.max_people),
        "bbox_scale": float(predictor.bbox_scale),
        "platforms": (
            list(platforms) if platforms else [jax.default_backend()]
        ),
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out_dir


@dataclasses.dataclass
class FusedBundle:
    """A loaded fused two-stage bundle: frames -> detector -> crops ->
    poses in one program per dispatch, no model code. Duck-types
    `detect.FusedTwoStagePredictor` (`__call__` and `predict_frame`)."""

    directory: Path
    manifest: dict
    det_variables: dict
    pose_variables: dict
    _programs: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def load(cls, directory: str | Path) -> "FusedBundle":
        directory = Path(directory)
        manifest = json.loads((directory / "manifest.json").read_text())
        if manifest.get("kind") != "fused":
            raise ValueError(
                f"{directory} is not a fused two-stage bundle "
                f"(kind={manifest.get('kind')!r})"
            )
        if manifest.get("version") != BUNDLE_VERSION:
            raise ValueError(
                f"bundle version {manifest.get('version')} != "
                f"{BUNDLE_VERSION} (re-export with this release)"
            )
        with np.load(directory / "params.npz") as z:
            det, pose = {}, {}
            for k in z.files:
                if k.startswith("det/"):
                    det[k[4:]] = z[k]
                elif k.startswith("pose/"):
                    pose[k[5:]] = z[k]
        return cls(
            directory=directory,
            manifest=manifest,
            det_variables=_unflatten(det),
            pose_variables=_unflatten(pose),
        )

    @property
    def frame_shapes(self) -> tuple[tuple[int, int], ...]:
        return tuple(tuple(s) for s in self.manifest["frame_shapes"])

    @property
    def batches(self) -> tuple[int, ...]:
        return tuple(self.manifest["batches"])

    @property
    def score_threshold(self) -> float:
        return float(self.manifest["score_threshold"])

    def _program(self, b: int, shape: tuple[int, int]):
        key = (b, shape)
        if key not in self._programs:
            import jax

            H, W = shape
            path = self.directory / f"fused_b{b}_h{H}w{W}.bin"
            self._programs[key] = jax.export.deserialize(path.read_bytes())
        return self._programs[key]

    def _fit_shape(self, H: int, W: int) -> tuple[int, int]:
        fit = [s for s in self.frame_shapes if s[0] >= H and s[1] >= W]
        if not fit:
            raise ValueError(
                f"frame {(H, W)} exceeds every exported shape "
                f"{self.frame_shapes}"
            )
        return min(fit)

    def dispatch(self, frames: np.ndarray) -> dict:
        """Non-blocking enqueue for the serving front: frames
        (B, H, W, 3) uint8 at an exported (batch, frame shape) EXACTLY
        (the micro-batcher pads to both) -> dict of in-flight device
        arrays. The live fused predictor's `dispatch` counterpart."""
        frames = np.ascontiguousarray(np.asarray(frames, np.uint8))
        B, H, W = frames.shape[:3]
        if B not in self.batches or (H, W) not in self.frame_shapes:
            raise ValueError(
                f"dispatch batch {B} / frame {(H, W)} not exported "
                f"(batches {self.batches}, shapes {self.frame_shapes})"
            )
        return self._program(B, (H, W)).call(
            self.det_variables, self.pose_variables, frames
        )

    def __call__(self, frames: np.ndarray) -> dict:
        """frames (B, H, W, 3) uint8 -> dict of (B, max_people, ...) pose
        fields + boxes + det_scores — the live fused predictor's
        contract. (B, H, W) must be an exported (batch, frame shape)."""
        frames = np.ascontiguousarray(np.asarray(frames, np.uint8))
        B, H, W, _ = frames.shape
        if B not in self.batches or (H, W) not in self.frame_shapes:
            raise ValueError(
                f"batch {B} / frame {(H, W)} not exported "
                f"(batches {self.batches}, shapes {self.frame_shapes})"
            )
        out = self._program(B, (H, W)).call(
            self.det_variables, self.pose_variables, frames
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def predict_frame(
        self, frame: np.ndarray, score_threshold: float | None = None
    ) -> dict[str, np.ndarray]:
        """One frame -> thresholded dict (the live predictor's
        predict_frame contract)."""
        thr = (
            self.score_threshold
            if score_threshold is None
            else score_threshold
        )
        out = self(np.asarray(frame, np.uint8)[None])
        keep = out["det_scores"][0] >= thr
        return {k: v[0][keep] for k, v in out.items()}


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="Export a checkpoint as a StableHLO serving bundle"
    )
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="Orbax checkpoint directory (pose model)")
    parser.add_argument("--detector-checkpoint", type=Path, default=None,
                        metavar="DIR",
                        help="export a PERSON-DETECTOR bundle instead "
                        "(detect.train output dir); use --frame-size "
                        "(repeatable via ';') for the accepted shapes")
    parser.add_argument("--bottomup-checkpoint", type=Path, default=None,
                        metavar="DIR",
                        help="export a SINGLE-STAGE POSE bundle instead "
                        "(detect.train --keypoints output dir); "
                        "--frame-size for accepted shapes (';'-separated), "
                        "--buckets for the frame-batch ladder (default 1)")
    parser.add_argument("--detector-threshold", type=float, default=0.3,
                        help="default score threshold baked into the "
                        "detector / bottom-up / fused bundle manifest")
    parser.add_argument("--fused-detector", type=Path, default=None,
                        metavar="DIR",
                        help="with --checkpoint: export a FUSED TWO-STAGE "
                        "bundle (this detector -> crops -> the pose "
                        "checkpoint, ONE program per dispatch); "
                        "--frame-size for accepted shapes (';'-separated), "
                        "--buckets for frame batches (default 1), "
                        "--max-people for the static pose slots")
    parser.add_argument("--max-people", type=int, default=8,
                        help="pose slots per frame in the fused bundle")
    parser.add_argument("--config", type=Path, default=None,
                        help="TrainConfig JSON (default: beside checkpoint)")
    parser.add_argument("--out", type=Path, required=True,
                        help="bundle output directory")
    parser.add_argument("--buckets", type=str, default=None,
                        help="comma-separated batch buckets (default: the "
                        "autotuned ladder for this hardware)")
    parser.add_argument("--frame-size", type=str, required=True,
                        help="H,W frame shape the bundle accepts")
    parser.add_argument("--ema", action="store_true", help="use EMA params")
    parser.add_argument("--no-indexed", action="store_true",
                        help="skip the frame-indexed programs (smaller "
                        "bundle; serving then uploads frames per crop)")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering targets (e.g. "
                        "'cpu,tpu' for a portable bundle; needs a "
                        "Pallas-free attn_impl — einsum)")
    args = parser.parse_args(argv)
    n_modes = sum(
        x is not None
        for x in (args.checkpoint, args.detector_checkpoint,
                  args.bottomup_checkpoint)
    )
    if n_modes != 1:
        parser.error("pass exactly one of --checkpoint / "
                     "--detector-checkpoint / --bottomup-checkpoint")

    platforms = (
        tuple(args.platforms.split(",")) if args.platforms else None
    )
    if args.bottomup_checkpoint is not None:
        from probpose_pytorch_tpu.detect.train import load_bottomup

        bu_dir = args.bottomup_checkpoint
        if (bu_dir / "checkpoints").exists():
            bu_dir = bu_dir / "checkpoints"
        predictor = load_bottomup(
            bu_dir, score_threshold=args.detector_threshold
        )
        shapes = [
            tuple(int(v) for v in part.split(","))
            for part in args.frame_size.split(";")
        ]
        batches = (
            tuple(int(b) for b in args.buckets.split(","))
            if args.buckets
            else (1,)
        )
        export_bottomup_bundle(
            predictor, args.out, shapes, batches=batches,
            platforms=platforms,
        )
        print(f"wrote bottom-up bundle {args.out} "
              f"(frames {shapes}, batches {batches})")
        return
    if args.detector_checkpoint is not None:
        from probpose_pytorch_tpu.detect.train import load_detector

        det_dir = args.detector_checkpoint
        if (det_dir / "checkpoints").exists():
            det_dir = det_dir / "checkpoints"
        detector = load_detector(
            det_dir, score_threshold=args.detector_threshold
        )
        shapes = [
            tuple(int(v) for v in part.split(","))
            for part in args.frame_size.split(";")
        ]
        export_detector_bundle(
            detector, args.out, shapes, platforms=platforms
        )
        print(f"wrote detector bundle {args.out} (frames {shapes})")
        return

    from probpose_pytorch_tpu.inference import (
        load_predictor,
        tuned_bucket_ladder,
        tuned_serving_batch,
    )

    if args.fused_detector is not None:
        from probpose_pytorch_tpu.detect.fused import FusedTwoStagePredictor
        from probpose_pytorch_tpu.detect.train import load_detector

        det_dir = args.fused_detector
        if (det_dir / "checkpoints").exists():
            det_dir = det_dir / "checkpoints"
        detector = load_detector(
            det_dir,
            score_threshold=args.detector_threshold,
            max_detections=max(args.max_people, 8),
        )
        pose = load_predictor(args.checkpoint, args.config, ema=args.ema)
        fused = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=args.max_people,
            score_threshold=args.detector_threshold,
        )
        shapes = [
            tuple(int(v) for v in part.split(","))
            for part in args.frame_size.split(";")
        ]
        batches = (
            tuple(int(b) for b in args.buckets.split(","))
            if args.buckets
            else (1,)
        )
        export_fused_bundle(
            fused, args.out, shapes, batches=batches, platforms=platforms
        )
        print(f"wrote fused two-stage bundle {args.out} "
              f"(frames {shapes}, batches {batches}, "
              f"max_people {args.max_people})")
        return

    if args.buckets:
        buckets = tuple(int(b) for b in args.buckets.split(","))
    else:
        buckets = tuned_bucket_ladder() or (tuned_serving_batch(),)
    frame_shape = tuple(int(v) for v in args.frame_size.split(","))
    predictor = load_predictor(args.checkpoint, args.config, ema=args.ema)
    export_predictor_bundle(
        predictor, args.out, buckets, frame_shape,
        platforms=platforms,
        indexed=not args.no_indexed,
    )
    print(f"wrote bundle {args.out} (buckets {buckets}, frame {frame_shape})")


if __name__ == "__main__":
    main()
