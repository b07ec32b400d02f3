"""Multi-dataset training: concatenation with per-dataset re-weighting.

Production pose models train on unions of corpora (e.g. COCO + an in-house
set); the reference trains exactly one directory (reference train.py:44-51).
`MixedPoseDataset` concatenates any datasets with this repo's sample dict
contract (image/keypoints/keypoints_visible/keypoints_visibility) and
re-weights by integer `repeats` — dataset i's samples appear repeats[i]
times per epoch, so `batch_iterator`'s uniform shuffle draws them
proportionally. Keypoint counts must match across members (batches stack).

Config: `dataset_format: "mixed"` +
    "mixed_datasets": [
        {"root": "./data/coco", "format": "coco", "repeat": 1},
        {"root": "./data/field", "format": "yolo", "repeat": 4}
    ]
Validation uses the FIRST member's val split (the benchmark set); training
mixes all members.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

__all__ = ["MixedPoseDataset", "build_mixed_datasets"]


class MixedPoseDataset:
    def __init__(
        self,
        datasets: Sequence[Any],
        repeats: Sequence[int] | None = None,
    ):
        if not datasets:
            raise ValueError("no datasets to mix")
        if repeats is None:
            repeats = [1] * len(datasets)
        repeats = [int(r) for r in repeats]
        if len(repeats) != len(datasets):
            raise ValueError(
                f"{len(repeats)} repeats != {len(datasets)} datasets"
            )
        if any(r < 1 for r in repeats):
            raise ValueError(f"repeats must be >= 1, got {repeats}")
        ks = [np.asarray(ds[0]["keypoints"]).shape[0] for ds in datasets]
        if len(set(ks)) > 1:
            raise ValueError(
                f"keypoint counts differ across mixed datasets: {ks}"
            )
        self.datasets = list(datasets)
        self.repeats = repeats
        # index map: (dataset index, local index), repeated per weight
        self._index: list[tuple[int, int]] = []
        for di, (ds, r) in enumerate(zip(datasets, repeats)):
            for _ in range(r):
                self._index.extend((di, i) for i in range(len(ds)))

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        di, li = self._index[idx]
        return self.datasets[di][li]


def build_mixed_datasets(cfg, split_train: bool = True):
    """Construct the (train, val) pair for `dataset_format: "mixed"`.

    Each `cfg.mixed_datasets` entry is {"root", "format" ("coco"|"yolo"),
    "repeat" (optional)}. Train = weighted concatenation of every member's
    train split; val = the first member's val split."""
    from pathlib import Path

    if not cfg.mixed_datasets:
        raise ValueError(
            'dataset_format "mixed" needs a non-empty mixed_datasets list'
        )
    members = []
    vals = []
    repeats = []
    for entry in cfg.mixed_datasets:
        root = Path(entry["root"])
        fmt = entry.get("format", "coco")
        repeats.append(int(entry.get("repeat", 1)))
        kw = (
            dict(resample=cfg.resample)
            if getattr(cfg, "resample", "")
            else {}
        )
        if fmt == "coco":
            from probpose_pytorch_tpu.data.coco import COCOPoseDataset

            members.append(COCOPoseDataset(
                root / "annotations/person_keypoints_train2017.json",
                root / "train2017",
                cfg.model.img_size,
                **kw,
            ))
            vals.append(lambda root=root: COCOPoseDataset(
                root / "annotations/person_keypoints_val2017.json",
                root / "val2017",
                cfg.model.img_size,
            ))
        elif fmt == "yolo":
            from probpose_pytorch_tpu.data import YOLOPoseDataset

            members.append(
                YOLOPoseDataset(
                    str(root), "train", cfg.model.img_size, **kw
                )
            )
            vals.append(lambda root=root: YOLOPoseDataset(
                str(root), "valid", cfg.model.img_size
            ))
        else:
            raise ValueError(
                f"mixed_datasets format {fmt!r} (expected 'coco' or 'yolo')"
            )
    train = MixedPoseDataset(members, repeats)
    val = vals[0]()
    return train, val
