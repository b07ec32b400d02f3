"""COCO keypoint dataset loading (greenfield: the reference has no COCO
loader — SURVEY.md §2.4 lists COCO eval as an explicit absence; BASELINE
configs #4-#5 require train2017/val2017 streaming).

Pure-json parsing (no pycocotools dependency): produces the same record
schema as the YOLO parser, so the rest of the pipeline is format-agnostic.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

__all__ = [
    "parse_coco_annotations",
    "COCOPoseDataset",
    "COCO_SIGMAS",
    "COCO_KEYPOINT_NAMES",
]

# The 17 COCO person keypoints, protocol order.
COCO_KEYPOINT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)

# The 17 COCO keypoint sigmas (person category), as published with the
# COCO keypoint evaluation protocol.
COCO_SIGMAS = np.array(
    [
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    ],
    np.float32,
)


def parse_coco_annotations(
    annotation_file: str | Path,
    image_root: str | Path,
    min_keypoints: int = 1,
    include_ignore: bool = False,
) -> Any:
    """Parse a COCO person-keypoints JSON into crop records:
    {image_path, category_id, bbox xywh, keypoints (K, 3), image_id, ann_id,
    area}.

    `iscrowd` and sub-`min_keypoints` annotations are not pose targets, but
    the COCO protocol uses them as ignore-regions that absorb detections
    during evaluation. With include_ignore=True, returns
    (records, ignore_records); ignore records carry
    {image_id, bbox, area, iscrowd, keypoints} for
    COCOKeypointEvaluator's gt_ignore/gt_crowd/box-fallback machinery.
    """
    raw = json.loads(Path(annotation_file).read_text())
    images = {im["id"]: im for im in raw["images"]}
    records, ignores = [], []
    for ann in raw["annotations"]:
        kps_flat = ann.get("keypoints")
        if ann.get("iscrowd", 0) or ann.get("num_keypoints", 0) < min_keypoints:
            ignores.append(
                dict(
                    image_id=ann["image_id"],
                    bbox=np.asarray(ann["bbox"], np.float32),
                    area=float(
                        ann.get("area", ann["bbox"][2] * ann["bbox"][3])
                    ),
                    iscrowd=bool(ann.get("iscrowd", 0)),
                    keypoints=(
                        np.asarray(kps_flat, np.float32).reshape(-1, 3)
                        if kps_flat is not None
                        else np.zeros((len(COCO_SIGMAS), 3), np.float32)
                    ),
                )
            )
            continue
        im = images[ann["image_id"]]
        kps = np.asarray(kps_flat, np.float32).reshape(-1, 3)
        records.append(
            dict(
                image_path=str(Path(image_root) / im["file_name"]),
                category_id=ann["category_id"],
                bbox=np.asarray(ann["bbox"], np.float32),
                keypoints=kps,
                image_id=ann["image_id"],
                ann_id=ann["id"],
                area=float(ann.get("area", ann["bbox"][2] * ann["bbox"][3])),
            )
        )
    if include_ignore:
        return records, ignores
    return records


def expand_bbox(bbox: np.ndarray, scale: float = 1.25,
                aspect: float | None = 192 / 256) -> np.ndarray:
    """Standard top-down box conditioning: pad to the crop aspect ratio and
    expand by `scale` around the center."""
    x, y, w, h = bbox
    cx, cy = x + w / 2, y + h / 2
    if aspect is not None:
        if w / h > aspect:
            h = w / aspect
        else:
            w = h * aspect
    w, h = w * scale, h * scale
    return np.asarray([cx - w / 2, cy - h / 2, w, h], np.float32)


@dataclass
class COCOPoseDataset:
    """Host-side COCO top-down crop dataset, same sample schema as
    YOLOPoseDataset (image crop + crop-space keypoints + visibility splits)."""

    annotation_file: str | Path
    image_root: str | Path
    input_size: tuple[int, int]  # (H, W)
    bbox_scale: float = 1.25
    min_keypoints: int = 1
    resample: str = "bilinear"

    def __post_init__(self):
        self.records, ignores = parse_coco_annotations(
            self.annotation_file,
            self.image_root,
            self.min_keypoints,
            include_ignore=True,
        )
        # Ignore-regions (crowds, sub-min-keypoint instances) grouped by
        # image: not crop samples, but the eval pipeline threads them to the
        # evaluator so detections they absorb are not false positives.
        self.ignores_by_image: dict[int, list[dict]] = {}
        for rec in ignores:
            self.ignores_by_image.setdefault(int(rec["image_id"]), []).append(
                rec
            )

    def __len__(self) -> int:
        return len(self.records)

    def _labels(self, rec, box) -> dict[str, np.ndarray]:
        H, W = self.input_size
        x0, y0, bw, bh = box
        kps = rec["keypoints"].copy()
        xy = kps[:, :2]
        xy[:, 0] = (xy[:, 0] - x0) / bw * W
        xy[:, 1] = (xy[:, 1] - y0) / bh * H
        v = kps[:, 2]
        return dict(
            keypoints=xy.astype(np.float32),
            keypoints_visible=(v >= 1).astype(np.float32),
            keypoints_visibility=(v == 2).astype(np.float32),
            bbox=np.asarray(box, np.float32),
            image_id=np.int64(rec["image_id"]),
            area=np.float32(rec["area"]),
            # Original annotation (frame space, raw v): evaluation must score
            # against this, not a crop-space reconstruction — keypoints the
            # crop clipped and the 0/1/2 visibility levels survive here.
            keypoints_frame=rec["keypoints"].astype(np.float32),
            bbox_frame=np.asarray(rec["bbox"], np.float32),
        )

    def get_batch(self, indices) -> dict[str, np.ndarray]:
        """Batched read; `resample="native"` routes JPEG decode + crop +
        resize through the C++ data plane exactly like
        YOLOPoseDataset.get_batch (same sampling convention as the device
        preprocess)."""
        indices = [int(i) for i in indices]
        if self.resample != "native":
            import concurrent.futures as cf

            from probpose_pytorch_tpu.data.pipeline import _collate

            with cf.ThreadPoolExecutor(max_workers=8) as pool:
                return _collate(list(pool.map(self.__getitem__, indices)))

        from pathlib import Path

        import PIL.Image

        from probpose_pytorch_tpu import native

        if not native.native_available():
            raise RuntimeError(
                "resample='native' requires the C++ data plane "
                "(`make native`); build failed or PROBPOSE_NO_NATIVE is set"
            )
        H, W = self.input_size
        recs = [self.records[i] for i in indices]
        boxes = [
            expand_bbox(rec["bbox"], self.bbox_scale, W / H) for rec in recs
        ]
        out = np.empty((len(recs), H, W, 3), np.uint8)
        jpeg_pos, bufs, jboxes = [], [], []
        for j, (rec, box) in enumerate(zip(recs, boxes)):
            path = Path(rec["image_path"])
            if path.suffix.lower() in (".jpg", ".jpeg"):
                jpeg_pos.append(j)
                bufs.append(path.read_bytes())
                jboxes.append(box)
            else:
                with PIL.Image.open(path) as im:
                    frame = np.asarray(im.convert("RGB"), np.uint8)
                out[j] = native.crop_resize_batch(
                    frame[None], np.asarray([box], np.float32), (H, W)
                )[0]
        if jpeg_pos:
            crops, _failed = native.decode_crop_resize_batch(
                bufs, np.asarray(jboxes, np.float32), (H, W)
            )
            out[jpeg_pos] = crops
        labels = [
            self._labels(rec, box) for rec, box in zip(recs, boxes)
        ]
        return dict(
            image=out,
            **{
                k: np.stack([lb[k] for lb in labels])
                for k in labels[0]
            },
        )

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        import PIL.Image

        rec = self.records[idx]
        H, W = self.input_size
        if self.resample == "native":
            return {k: v[0] for k, v in self.get_batch([idx]).items()}
        box = expand_bbox(rec["bbox"], self.bbox_scale, W / H)
        x0, y0, bw, bh = box
        with PIL.Image.open(rec["image_path"]) as im:
            im = im.convert("RGB")
            crop = im.crop((x0, y0, x0 + bw, y0 + bh)).resize(
                (W, H),
                PIL.Image.LANCZOS
                if self.resample == "lanczos"
                else PIL.Image.BILINEAR,
            )
        return dict(
            image=np.asarray(crop, np.uint8),
            **self._labels(rec, box),
        )
