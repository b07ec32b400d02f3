"""YOLO-pose annotation parsing and dataset.

Rebuild of /root/reference/probpose/dataset.py (YOLO txt label parsing at
dataset.py:20-68, crop preprocessing at 71-90). Differences by design:

* The parser is pure host-side indexing; image decoding happens lazily in the
  pipeline, and crop/resize can run either on host (PIL, reference-equivalent
  LANCZOS) or fused on device (ops/preprocess.py) — target encoding always
  happens on device inside the train step, not in workers (the reference
  encodes in __getitem__, dataset.py:128, which was its data-path bottleneck).
* COCO visibility promotion quirk kept: v==1 is promoted to 2
  (dataset.py:45-47), so `keypoints_visible` is v==2 and
  `keypoints_visibility` is min(v, 1) (dataset.py:124-126).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["parse_yolo_annotations", "YOLOPoseDataset"]

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def _image_size(path: Path) -> tuple[int, int]:
    """(width, height) from the image header only (no full decode)."""
    import PIL.Image

    with PIL.Image.open(path) as im:
        return im.size


def parse_yolo_annotations(
    split_folder: Path | str,
    target_single_class: int | None = None,
) -> list[dict[str, Any]]:
    """Parse a YOLO-pose split (images/ + labels/ with
    `cls xc yc w h (x y v)*` rows, normalized) into absolute-pixel records:
    {image_path, category_id, bbox xywh, keypoints (K, 3)}."""
    split_folder = Path(split_folder)
    records: list[dict[str, Any]] = []
    image_dir = split_folder / "images"
    label_dir = split_folder / "labels"
    for image_path in sorted(image_dir.iterdir()):
        if image_path.suffix.lower() not in _IMG_EXTS:
            continue
        label_path = label_dir / image_path.with_suffix(".txt").name
        if not label_path.exists():
            continue
        width, height = _image_size(image_path)
        for line in label_path.read_text().splitlines():
            parts = line.split()
            if not parts:
                continue
            cls = int(parts[0])
            if target_single_class is not None and cls != target_single_class:
                continue
            xc, yc, bw, bh = (float(v) for v in parts[1:5])
            kps = []
            for j in range(5, len(parts), 3):
                v = int(float(parts[j + 2]))
                if v == 1:  # promote "labeled but occluded" to visible
                    v = 2
                kps.append(
                    (float(parts[j]) * width, float(parts[j + 1]) * height, v)
                )
            records.append(
                dict(
                    image_path=str(image_path),
                    category_id=0,
                    bbox=np.array(
                        [
                            (xc - bw / 2) * width,
                            (yc - bh / 2) * height,
                            bw * width,
                            bh * height,
                        ],
                        np.float32,
                    ),
                    keypoints=np.asarray(kps, np.float32),
                )
            )
    return records


@dataclass
class YOLOPoseDataset:
    """Host-side dataset yielding crop samples ready for the on-device step.

    Each sample: image (H, W, 3) uint8 crop, keypoints (K, 2) in crop space,
    keypoints_visible / keypoints_visibility (K,).
    """

    root: Path | str
    split: str
    input_size: tuple[int, int]  # (H, W)
    target_single_class: int | None = None
    resample: str = "lanczos"  # "native" = C++ data plane, device convention

    def __post_init__(self):
        self.records = parse_yolo_annotations(
            Path(self.root) / self.split, self.target_single_class
        )

    def __len__(self) -> int:
        return len(self.records)

    def _labels(self, rec) -> dict[str, np.ndarray]:
        H, W = self.input_size
        x0, y0, bw, bh = rec["bbox"]
        kps = rec["keypoints"].copy()
        xy = kps[:, :2]
        xy[:, 0] = (xy[:, 0] - x0) / bw * W
        xy[:, 1] = (xy[:, 1] - y0) / bh * H
        v = kps[:, 2]
        return dict(
            keypoints=xy.astype(np.float32),
            keypoints_visible=(v == 2).astype(np.float32),
            keypoints_visibility=np.minimum(v, 1).astype(np.float32),
        )

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        import PIL.Image

        rec = self.records[idx]
        H, W = self.input_size
        if self.resample == "native":
            return {k: v[0] for k, v in self.get_batch([idx]).items()}
        x0, y0, bw, bh = rec["bbox"]
        with PIL.Image.open(rec["image_path"]) as im:
            im = im.convert("RGB")
            crop = im.crop((x0, y0, x0 + bw, y0 + bh)).resize(
                (W, H),
                PIL.Image.LANCZOS
                if self.resample == "lanczos"
                else PIL.Image.BILINEAR,
            )
        return dict(image=np.asarray(crop, np.uint8), **self._labels(rec))

    def get_batch(self, indices) -> dict[str, np.ndarray]:
        """Batched read. With resample="native", JPEG records decode + crop
        + bilinear-resize in one threaded C++ call (native/dataplane.cpp)
        using the same sampling convention as the on-device preprocess
        (ops/preprocess.py "bilinear_gather") — the native-equivalent of the
        reference's Python DataLoader worker loop (dataset.py:71-90,117-121).
        Non-JPEG records decode via PIL then crop through the same native
        resampler, so pixels are convention-identical across formats.
        """
        indices = [int(i) for i in indices]
        if self.resample != "native":
            import concurrent.futures as cf

            from probpose_pytorch_tpu.data.pipeline import _collate

            with cf.ThreadPoolExecutor(max_workers=8) as pool:
                return _collate(list(pool.map(self.__getitem__, indices)))

        from probpose_pytorch_tpu import native

        if not native.native_available():
            raise RuntimeError(
                "resample='native' requires the C++ data plane "
                "(`make native`); build failed or PROBPOSE_NO_NATIVE is set"
            )
        import PIL.Image

        H, W = self.input_size
        recs = [self.records[i] for i in indices]
        out = np.empty((len(recs), H, W, 3), np.uint8)
        jpeg_pos, bufs, jboxes = [], [], []
        for j, rec in enumerate(recs):
            path = Path(rec["image_path"])
            if path.suffix.lower() in (".jpg", ".jpeg"):
                jpeg_pos.append(j)
                bufs.append(path.read_bytes())
                jboxes.append(rec["bbox"])
            else:
                with PIL.Image.open(path) as im:
                    frame = np.asarray(im.convert("RGB"), np.uint8)
                out[j] = native.crop_resize_batch(
                    frame[None],
                    np.asarray([rec["bbox"]], np.float32),
                    (H, W),
                )[0]
        if jpeg_pos:
            crops, _failed = native.decode_crop_resize_batch(
                bufs, np.asarray(jboxes, np.float32), (H, W)
            )
            out[jpeg_pos] = crops
        labels = [self._labels(rec) for rec in recs]
        return dict(
            image=out,
            **{
                k: np.stack([lb[k] for lb in labels])
                for k in ("keypoints", "keypoints_visible",
                          "keypoints_visibility")
            },
        )
