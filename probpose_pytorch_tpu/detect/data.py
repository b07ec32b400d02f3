"""Frame-level detection dataset: COCO-format annotations grouped per image.

The pose datasets are crop-level (one record per person instance); the
detector trains on whole frames with EVERY person box — including the
crowd / zero-keypoint ignore records, which become negative-loss-free
regions (detect/loss.py) exactly as they are detection-absorbing regions in
the keypoint evaluator (eval/coco_eval.py).

Host side stays thin: decode the JPEG and pad the per-image box lists to
fixed (M, Mi); the resize to detector input size happens ON DEVICE inside
the jitted train step (ops/preprocess.crop_resize with the full-frame box),
so frames of one native size batch without any host resampling. Mixed-size
corpora should be bucketed by native size by the caller (real COCO) — the
synthetic rehearsal set is single-size by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from probpose_pytorch_tpu.data.coco import parse_coco_annotations

__all__ = ["FrameDetectionDataset"]


@dataclass
class FrameDetectionDataset:
    """One item per image: {frame (H, W, 3) uint8, boxes (M, 4) xywh,
    box_mask (M,), ignore_boxes (Mi, 4), ignore_mask (Mi,)} in native frame
    pixels."""

    annotation_file: str | Path
    image_root: str | Path
    max_boxes: int = 16
    max_ignore: int = 8
    # >0: items also carry padded `keypoints` (M, K, 3) frame-space rows
    # aligned with `boxes` — the single-stage pose family's targets.
    num_keypoints: int = 0
    image_ids: list = field(default=None, repr=False)  # type: ignore[assignment]

    def __post_init__(self):
        records, ignores = parse_coco_annotations(
            self.annotation_file, self.image_root, include_ignore=True
        )
        by_image: dict[int, dict] = {}
        for rec in records:
            e = by_image.setdefault(
                int(rec["image_id"]),
                dict(path=rec["image_path"], boxes=[], kpts=[], ignores=[]),
            )
            e["boxes"].append(np.asarray(rec["bbox"], np.float32))
            e["kpts"].append(np.asarray(rec["keypoints"], np.float32))
        # Ignore records carry no image path (they may land on images with
        # no positive instance); recover paths from the annotation file's
        # image table.
        import json

        raw = json.loads(Path(self.annotation_file).read_text())
        paths = {
            int(im["id"]): str(Path(self.image_root) / im["file_name"])
            for im in raw["images"]
        }
        for rec in ignores:
            iid = int(rec["image_id"])
            e = by_image.setdefault(
                iid, dict(path=paths[iid], boxes=[], kpts=[], ignores=[])
            )
            e["ignores"].append(np.asarray(rec["bbox"], np.float32))
        if self.image_ids is None:
            self.image_ids = sorted(by_image)
        self._by_image = by_image

    def __len__(self) -> int:
        return len(self.image_ids)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        import PIL.Image

        e = self._by_image[self.image_ids[idx]]
        frame = np.asarray(
            PIL.Image.open(e["path"]).convert("RGB"), np.uint8
        )

        def pad(rows: list, m: int) -> tuple[np.ndarray, np.ndarray]:
            out = np.zeros((m, 4), np.float32)
            msk = np.zeros((m,), np.float32)
            n = min(len(rows), m)
            if n:
                out[:n] = np.stack(rows[:n])
                msk[:n] = 1.0
            return out, msk

        boxes, box_mask = pad(e["boxes"], self.max_boxes)
        ign, ign_mask = pad(e["ignores"], self.max_ignore)
        item = dict(
            frame=frame,
            boxes=boxes,
            box_mask=box_mask,
            ignore_boxes=ign,
            ignore_mask=ign_mask,
            image_id=np.int64(self.image_ids[idx]),
        )
        if self.num_keypoints > 0:
            K = self.num_keypoints
            kp = np.zeros((self.max_boxes, K, 3), np.float32)
            for j, rows in enumerate(e["kpts"][: self.max_boxes]):
                if rows.shape[0] != K:
                    raise ValueError(
                        f"annotation has {rows.shape[0]} keypoints, "
                        f"dataset configured for {K}"
                    )
                kp[j] = rows
            item["keypoints"] = kp
        return item
