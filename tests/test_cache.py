"""Packed memmap cache tests."""

import numpy as np

from probpose_pytorch_tpu.data import (
    CachedCropDataset,
    SyntheticPoseDataset,
    build_crop_cache,
)


def test_cache_roundtrip(tmp_path):
    ds = SyntheticPoseDataset(6, (32, 24), 5, seed=3)
    cache = build_crop_cache(ds, tmp_path / "cache", num_workers=2)
    cds = CachedCropDataset(cache)
    assert len(cds) == 6
    for i in (0, 3, 5):
        a, b = ds[i], cds[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
        np.testing.assert_array_equal(
            a["keypoints_visible"], b["keypoints_visible"]
        )


def test_cache_is_idempotent(tmp_path):
    ds = SyntheticPoseDataset(3, (16, 16), 2)
    p1 = build_crop_cache(ds, tmp_path / "c")
    p2 = build_crop_cache(ds, tmp_path / "c")  # no rebuild
    assert p1 == p2
