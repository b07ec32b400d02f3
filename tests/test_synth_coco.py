"""Generator for the on-disk COCO-format rehearsal dataset
(data/synth_coco.py): layout, schema, determinism, loader integration."""

import json

import numpy as np

from probpose_pytorch_tpu.data.coco import COCOPoseDataset
from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth


def _gen(tmp_path, **kw):
    return generate_coco_synth(
        tmp_path / "coco",
        n_train_images=6,
        n_val_images=3,
        frame_hw=(96, 96),
        p_crowd=0.5,
        p_unlabeled=0.3,
        seed=0,
        **kw,
    )


def test_layout_and_schema(tmp_path):
    root = _gen(tmp_path)
    ann = json.loads(
        (root / "annotations/person_keypoints_train2017.json").read_text()
    )
    assert len(ann["images"]) == 6
    assert (root / "train2017" / ann["images"][0]["file_name"]).exists()
    assert (root / "val2017").exists()
    kinds = {"live": 0, "crowd": 0, "zero_kpt": 0}
    for a in ann["annotations"]:
        assert len(a["keypoints"]) == 51
        assert a["category_id"] == 1 and a["area"] > 0
        if a["iscrowd"]:
            kinds["crowd"] += 1
            assert a["num_keypoints"] == 0
        elif a["num_keypoints"] == 0:
            kinds["zero_kpt"] += 1
        else:
            kinds["live"] += 1
            kp = np.asarray(a["keypoints"]).reshape(17, 3)
            labeled = kp[:, 2] > 0
            assert labeled.sum() == a["num_keypoints"]
            # unlabeled keypoints are fully zeroed
            assert np.all(kp[~labeled] == 0)
    # with p_crowd=0.5 / p_unlabeled=0.3 over 6 images, all three kinds occur
    assert all(v > 0 for v in kinds.values()), kinds


def test_deterministic_and_idempotent(tmp_path):
    root = _gen(tmp_path)
    first = json.loads(
        (root / "annotations/person_keypoints_train2017.json").read_text()
    )
    # second call with same seed is a no-op (files exist)
    root2 = _gen(tmp_path)
    second = json.loads(
        (root2 / "annotations/person_keypoints_train2017.json").read_text()
    )
    assert first == second
    # overwrite regenerates identically (determinism per (seed, index))
    root3 = _gen(tmp_path, overwrite=True)
    third = json.loads(
        (root3 / "annotations/person_keypoints_train2017.json").read_text()
    )
    assert first == third


def test_loader_integration(tmp_path):
    root = _gen(tmp_path)
    ds = COCOPoseDataset(
        root / "annotations/person_keypoints_train2017.json",
        root / "train2017",
        (64, 48),
    )
    assert len(ds) > 0
    s = ds[0]
    assert s["image"].shape == (64, 48, 3)
    assert s["keypoints"].shape == (17, 2)
    # crowd / zero-kpt annotations surface as ignore records, not samples
    total_ann = len(
        json.loads(
            (root / "annotations/person_keypoints_train2017.json").read_text()
        )["annotations"]
    )
    n_ignores = sum(len(v) for v in ds.ignores_by_image.values())
    assert len(ds) + n_ignores == total_ann
    assert n_ignores > 0
