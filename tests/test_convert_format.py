"""YOLO <-> COCO dataset-format converter: round-trip fidelity.

A converted dataset must load identically through the other format's
parser (coordinates to float precision, RAW visibilities preserved — the
v==1->2 promotion is a load-time training quirk, not a file property).
"""

import json

import numpy as np
import PIL.Image
import pytest

from probpose_pytorch_tpu.data.convert_format import (
    coco_to_yolo,
    main as convert_main,
    yolo_to_coco,
)


def _write_image(path, w, h, seed=0):
    arr = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    PIL.Image.fromarray(arr).save(path)


@pytest.fixture
def yolo_root(tmp_path):
    """Two images, K=4 keypoints, all three raw visibility flags, one
    two-instance image."""
    split = tmp_path / "val"
    (split / "images").mkdir(parents=True)
    (split / "labels").mkdir()
    _write_image(split / "images" / "a.jpg", 160, 120, seed=0)
    _write_image(split / "images" / "b.jpg", 200, 100, seed=1)
    (split / "labels" / "a.txt").write_text(
        "0 0.5 0.5 0.8 0.8 0.3 0.3 0 0.5 0.5 1 0.6 0.4 2 0.4 0.6 2\n"
        "0 0.25 0.25 0.3 0.3 0.2 0.2 2 0.3 0.3 2 0.25 0.2 1 0.2 0.3 0\n"
    )
    (split / "labels" / "b.txt").write_text(
        "0 0.4 0.6 0.5 0.6 0.3 0.5 2 0.45 0.6 2 0.5 0.7 2 0.35 0.55 1\n"
    )
    return tmp_path


class TestYolo2Coco:
    def test_schema_and_counts(self, yolo_root, tmp_path):
        out = tmp_path / "ann.json"
        coco = yolo_to_coco(yolo_root, "val", out)
        assert len(coco["images"]) == 2
        assert len(coco["annotations"]) == 3
        assert json.loads(out.read_text()) == coco
        for ann in coco["annotations"]:
            assert ann["iscrowd"] == 0
            assert len(ann["keypoints"]) == 12
            # num_keypoints counts v>0 labels
            vs = ann["keypoints"][2::3]
            assert ann["num_keypoints"] == sum(1 for v in vs if v > 0)

    def test_raw_visibilities_preserved(self, yolo_root, tmp_path):
        coco = yolo_to_coco(yolo_root, "val", tmp_path / "ann.json")
        a0 = coco["annotations"][0]
        assert a0["keypoints"][2::3] == [0, 1, 2, 2]  # no 1->2 promotion

    def test_parses_like_the_yolo_loader(self, yolo_root, tmp_path):
        """Converted annotations parse to the same frame-space records the
        YOLO parser produces (coordinates exact; the YOLO parser's v 1->2
        promotion is a load-time quirk, so COCO records carry raw v and
        promote to the same values)."""
        from probpose_pytorch_tpu.data.coco import parse_coco_annotations
        from probpose_pytorch_tpu.data.yolo import parse_yolo_annotations

        out = tmp_path / "ann.json"
        yolo_to_coco(yolo_root, "val", out)
        coco_recs = parse_coco_annotations(
            out, yolo_root / "val" / "images", min_keypoints=1
        )
        yolo_recs = parse_yolo_annotations(yolo_root / "val")
        assert len(coco_recs) == len(yolo_recs) == 3
        for a, b in zip(coco_recs, yolo_recs):
            assert a["image_path"] == b["image_path"]
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=0.05)
            np.testing.assert_allclose(
                a["keypoints"][:, :2], b["keypoints"][:, :2], atol=0.05
            )
            raw_v = a["keypoints"][:, 2]
            promoted = np.where(raw_v == 1, 2, raw_v)
            np.testing.assert_array_equal(promoted, b["keypoints"][:, 2])


class TestCoco2Yolo:
    def test_roundtrip_labels(self, yolo_root, tmp_path):
        """yolo -> coco -> yolo reproduces the normalized label rows to
        float precision, and crowd-free conversion drops nothing."""
        ann = tmp_path / "ann.json"
        yolo_to_coco(yolo_root, "val", ann)
        counts = coco_to_yolo(
            ann, yolo_root / "val" / "images", tmp_path / "back", "val"
        )
        assert counts == dict(images=2, annotations=3, dropped_ignores=0)
        for name in ("a.txt", "b.txt"):
            src_rows = (
                (yolo_root / "val" / "labels" / name)
                .read_text().strip().splitlines()
            )
            dst_rows = (
                (tmp_path / "back" / "val" / "labels" / name)
                .read_text().strip().splitlines()
            )
            assert len(src_rows) == len(dst_rows)
            for s, d in zip(src_rows, dst_rows):
                sv = np.array([float(v) for v in s.split()])
                dv = np.array([float(v) for v in d.split()])
                np.testing.assert_allclose(dv, sv, atol=1e-4)

    def test_ignores_dropped_with_count(self, yolo_root, tmp_path):
        ann_path = tmp_path / "ann.json"
        coco = yolo_to_coco(yolo_root, "val", ann_path)
        coco["annotations"].append(dict(
            id=99, image_id=coco["images"][0]["id"], category_id=1,
            bbox=[0, 0, 10, 10], area=100, iscrowd=1,
            keypoints=[0] * 12, num_keypoints=0,
        ))
        ann_path.write_text(json.dumps(coco))
        counts = coco_to_yolo(
            ann_path, yolo_root / "val" / "images", tmp_path / "back2", "val"
        )
        assert counts["dropped_ignores"] == 1
        assert counts["annotations"] == 3


def test_cli(yolo_root, tmp_path, capsys):
    convert_main([
        "yolo2coco", "--root", str(yolo_root), "--split", "val",
        "--out", str(tmp_path / "cli.json"),
    ])
    assert "2 images, 3 annotations" in capsys.readouterr().out
    convert_main([
        "coco2yolo", "--annotations", str(tmp_path / "cli.json"),
        "--images", str(yolo_root / "val" / "images"),
        "--out", str(tmp_path / "cliback"), "--split", "val",
    ])
    assert "2 images, 3 annotations" in capsys.readouterr().out
    assert (tmp_path / "cliback" / "val" / "labels" / "a.txt").exists()
