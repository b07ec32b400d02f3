"""Pin the per-format visibility conventions and the deterministic
balanced-accuracy estimator (VERDICT r1 items #8 and #9).

The YOLO and COCO loaders intentionally map the raw COCO visibility flag v
differently (see probpose_pytorch_tpu/data/__init__.py for the table and the
why). These tests exist so a future "unification" fails loudly.
"""

import json

import numpy as np
import pytest

from probpose_pytorch_tpu.data.coco import COCOPoseDataset
from probpose_pytorch_tpu.data.yolo import YOLOPoseDataset, parse_yolo_annotations


def _write_image(path, w, h):
    import PIL.Image

    arr = np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)
    PIL.Image.fromarray(arr).save(path)


@pytest.fixture
def raw_v():
    # one keypoint per raw flag value: 0 = unlabeled, 1 = labeled+occluded,
    # 2 = labeled+visible (plus a second v==2 to keep K=4 even)
    return np.array([0, 1, 2, 2])


@pytest.fixture
def yolo_root(tmp_path, raw_v):
    split = tmp_path / "train"
    (split / "images").mkdir(parents=True)
    (split / "labels").mkdir()
    _write_image(split / "images" / "a.jpg", 160, 120)
    kps = [(0.3, 0.3), (0.5, 0.5), (0.6, 0.4), (0.4, 0.6)]
    row = "0 0.5 0.5 0.8 0.8 " + " ".join(
        f"{x} {y} {v}" for (x, y), v in zip(kps, raw_v)
    )
    (split / "labels" / "a.txt").write_text(row + "\n")
    return tmp_path


@pytest.fixture
def coco_pair(tmp_path, raw_v):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    _write_image(img_dir / "000000.jpg", 160, 120)
    kps = np.array([[40, 40], [80, 60], [100, 50], [60, 70]], np.float32)
    flat = np.concatenate([kps, raw_v[:, None]], 1).reshape(-1).tolist()
    ann = dict(
        images=[dict(id=0, file_name="000000.jpg", width=160, height=120)],
        annotations=[
            dict(
                id=1,
                image_id=0,
                category_id=1,
                keypoints=flat,
                num_keypoints=int((raw_v > 0).sum()),
                bbox=[30.0, 30.0, 90.0, 60.0],
                area=5400.0,
                iscrowd=0,
            )
        ],
    )
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return ann_file, img_dir


class TestVisibilityConventions:
    def test_yolo_promotes_v1_and_visibility_means_labeled(self, yolo_root, raw_v):
        # parser promotion quirk (reference dataset.py:45-47)
        recs = parse_yolo_annotations(yolo_root / "train")
        np.testing.assert_array_equal(recs[0]["keypoints"][:, 2], [0, 2, 2, 2])
        ds = YOLOPoseDataset(yolo_root, "train", (64, 48))
        s = ds[0]
        # post-promotion: visible == labeled == visibility (dataset.py:124-126)
        np.testing.assert_array_equal(s["keypoints_visible"], [0, 1, 1, 1])
        np.testing.assert_array_equal(s["keypoints_visibility"], [0, 1, 1, 1])

    def test_coco_keeps_occlusion(self, coco_pair, raw_v):
        ann_file, img_dir = coco_pair
        ds = COCOPoseDataset(ann_file, img_dir, (64, 48))
        s = ds[0]
        # visible = labeled (v >= 1); visibility = unoccluded (v == 2)
        np.testing.assert_array_equal(s["keypoints_visible"], raw_v >= 1)
        np.testing.assert_array_equal(s["keypoints_visibility"], raw_v == 2)


class TestBalancedAccuracyDeviation:
    """Bound the deterministic balanced accuracy against the reference's
    randomized subsampled estimator (reference loss.py:653-697): the
    deterministic value must sit within 2 sigma of the sampled distribution,
    upgrading PARITY.md's "mirrors effective behavior" to "bounded"."""

    def test_deterministic_within_two_sigma_of_sampled(self):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.eval.metrics_host import (
            balanced_binary_accuracy_sampled,
        )
        from probpose_pytorch_tpu.losses import balanced_binary_accuracy

        rng = np.random.default_rng(7)
        n_pos, n_neg = 240, 760  # deliberately unbalanced classes
        gt = np.concatenate([np.ones(n_pos), np.zeros(n_neg)]).astype(np.float32)
        # noisy-but-informative scores
        dt = np.clip(
            0.55 * gt + 0.25 + rng.normal(0, 0.18, gt.shape), 0, 1
        ).astype(np.float32)
        mask = np.ones_like(gt, bool)

        det_acc, det_thr = balanced_binary_accuracy(
            jnp.asarray(dt), jnp.asarray(gt), jnp.asarray(mask)
        )
        det_acc = float(det_acc)

        samples = np.array(
            [
                balanced_binary_accuracy_sampled(
                    dt, gt, mask, rng=np.random.default_rng(seed)
                )[0]
                for seed in range(60)
            ]
        )
        mu, sigma = samples.mean(), samples.std()
        assert sigma < 0.05  # the estimator is tight at this n
        assert abs(det_acc - mu) <= 2.0 * sigma + 1e-6, (
            f"deterministic {det_acc:.4f} vs sampled {mu:.4f}±{sigma:.4f}"
        )
        assert 0.1 <= float(det_thr) <= 0.95

    def test_agree_exactly_when_already_balanced(self):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.eval.metrics_host import (
            balanced_binary_accuracy_sampled,
        )
        from probpose_pytorch_tpu.losses import balanced_binary_accuracy

        rng = np.random.default_rng(3)
        gt = np.tile([0.0, 1.0], 200).astype(np.float32)
        dt = np.clip(0.6 * gt + 0.2 + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
            np.float32
        )
        mask = np.ones_like(gt, bool)
        det_acc, _ = balanced_binary_accuracy(
            jnp.asarray(dt), jnp.asarray(gt), jnp.asarray(mask)
        )
        # balanced input -> the subsample is the whole set, no randomness
        samp_acc, _ = balanced_binary_accuracy_sampled(dt, gt, mask)
        assert float(det_acc) == pytest.approx(samp_acc, abs=1e-6)
