"""C++ data plane (native/dataplane.cpp): JPEG decode + crop-resize parity.

The native pre-stage replaces the reference's Python DataLoader worker loop
(reference dataset.py:71-90,117-121). Its bilinear sampling convention must
equal the on-device preprocess (ops/preprocess.py "bilinear_gather") so
host-ingested and device-made crops are interchangeable.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from probpose_pytorch_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason="native data plane not built (no g++/libjpeg on this host)",
)


def _rand_frame(rng, h=80, w=100):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestCropResize:
    def test_matches_device_bilinear_gather(self):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        rng = np.random.default_rng(0)
        frames = np.stack([_rand_frame(rng) for _ in range(4)])
        # Boxes partially out of frame to exercise the zero-padding border.
        boxes = np.asarray(
            [
                [10, 5, 60, 70],
                [-8, -4, 50, 60],
                [70, 50, 60, 60],  # hangs off the bottom-right
                [12.3, 7.7, 41.9, 55.1],  # fractional
            ],
            np.float32,
        )
        got = native.crop_resize_batch(frames, boxes, (64, 48))
        want = crop_resize(
            jnp.asarray(frames, jnp.float32),
            jnp.asarray(boxes),
            (64, 48),
            "bilinear_gather",
        )
        want_u8 = np.clip(np.round(np.asarray(want)), 0, 255).astype(np.uint8)
        # identical sampling convention -> only uint8 rounding can differ
        assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 1

    def test_single_thread_equals_threaded(self):
        rng = np.random.default_rng(1)
        frames = np.stack([_rand_frame(rng) for _ in range(8)])
        boxes = np.tile(np.asarray([[5, 5, 80, 60]], np.float32), (8, 1))
        a = native.crop_resize_batch(frames, boxes, (32, 24), n_threads=1)
        b = native.crop_resize_batch(frames, boxes, (32, 24), n_threads=8)
        np.testing.assert_array_equal(a, b)


def _jpeg_bytes(arr: np.ndarray, quality=95) -> bytes:
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


class TestJpeg:
    def test_decode_crop_equals_pil_decode_plus_native_crop(self):
        import PIL.Image

        rng = np.random.default_rng(2)
        frame = _rand_frame(rng, 64, 96)
        data = _jpeg_bytes(frame)
        boxes = np.asarray([[8, 4, 70, 50]], np.float32)
        got, failed = native.decode_crop_resize_batch([data], boxes, (40, 56))
        assert failed == 0
        with PIL.Image.open(io.BytesIO(data)) as im:
            decoded = np.asarray(im.convert("RGB"), np.uint8)
        want = native.crop_resize_batch(decoded[None], boxes, (40, 56))
        # PIL and the native plane both decode via libjpeg; allow ±2 for
        # IDCT implementation variation between builds.
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2

    def test_jpeg_size(self):
        rng = np.random.default_rng(3)
        data = _jpeg_bytes(_rand_frame(rng, 33, 57))
        assert native.jpeg_size(data) == (33, 57)

    def test_truncated_jpeg_does_not_poison_batch(self):
        # libjpeg recovers truncated streams (grey-fills missing scanlines,
        # "Premature end of JPEG file" warning) rather than erroring — either
        # outcome is fine; the requirement is no crash and the good slot is
        # decoded correctly.
        rng = np.random.default_rng(4)
        frame = _rand_frame(rng)
        good = _jpeg_bytes(frame)
        bad = good[: len(good) // 3]  # truncated stream
        boxes = np.asarray([[0, 0, 50, 50], [0, 0, 50, 50]], np.float32)
        crops, failed = native.decode_crop_resize_batch(
            [bad, good], boxes, (16, 16)
        )
        assert 0 <= failed <= 1
        want, _ = native.decode_crop_resize_batch([good], boxes[:1], (16, 16))
        np.testing.assert_array_equal(crops[1], want[0])

    def test_garbage_buffer_fails_cleanly(self):
        crops, failed = native.decode_crop_resize_batch(
            [b"not a jpeg at all"],
            np.asarray([[0, 0, 10, 10]], np.float32),
            (8, 8),
        )
        assert failed == 1
        assert crops.max() == 0


class TestYoloNativeIngestion:
    @pytest.fixture
    def yolo_jpeg_root(self, tmp_path):
        import PIL.Image

        rng = np.random.default_rng(5)
        (tmp_path / "train" / "images").mkdir(parents=True)
        (tmp_path / "train" / "labels").mkdir(parents=True)
        for i in range(4):
            ext = "jpg" if i % 2 == 0 else "png"  # mixed formats
            PIL.Image.fromarray(_rand_frame(rng)).save(
                tmp_path / "train" / "images" / f"{i}.{ext}"
            )
            parts = ["0", "0.5", "0.5", "0.6", "0.7"]
            for _ in range(5):
                parts += [
                    f"{rng.uniform(0.2, 0.8):.4f}",
                    f"{rng.uniform(0.2, 0.8):.4f}",
                    "2",
                ]
            (tmp_path / "train" / "labels" / f"{i}.txt").write_text(
                " ".join(parts) + "\n"
            )
        return tmp_path

    def test_get_batch_native_mixed_formats(self, yolo_jpeg_root):
        from probpose_pytorch_tpu.data import YOLOPoseDataset

        ds = YOLOPoseDataset(
            yolo_jpeg_root, "train", (64, 48), resample="native"
        )
        b = ds.get_batch(range(4))
        assert b["image"].shape == (4, 64, 48, 3)
        assert b["keypoints"].shape == (4, 5, 2)
        # JPEG (native decode) and PNG (PIL decode + native crop) slots both
        # produce non-trivial crops; __getitem__ routes through the same path
        s1 = ds[1]
        np.testing.assert_array_equal(s1["image"], b["image"][1])
        assert b["image"].std() > 10

    def test_native_matches_device_preprocess_for_png(self, yolo_jpeg_root):
        """PNG decodes losslessly, so a native-ingested crop must equal the
        on-device crop of the same frame to rounding."""
        import jax.numpy as jnp
        import PIL.Image

        from probpose_pytorch_tpu.data import YOLOPoseDataset
        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        ds = YOLOPoseDataset(
            yolo_jpeg_root, "train", (64, 48), resample="native"
        )
        rec = ds.records[1]  # the .png record
        assert str(rec["image_path"]).endswith(".png")
        with PIL.Image.open(rec["image_path"]) as im:
            frame = np.asarray(im.convert("RGB"), np.float32)
        want = crop_resize(
            jnp.asarray(frame)[None],
            jnp.asarray(np.asarray([rec["bbox"]], np.float32)),
            (64, 48),
            "bilinear_gather",
        )
        want_u8 = np.clip(np.round(np.asarray(want[0])), 0, 255).astype(
            np.uint8
        )
        got = ds[1]["image"]
        assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 1

    def test_cache_ingestion_uses_get_batch(self, yolo_jpeg_root, tmp_path):
        from probpose_pytorch_tpu.data import (
            CachedCropDataset,
            YOLOPoseDataset,
            build_crop_cache,
        )

        ds = YOLOPoseDataset(
            yolo_jpeg_root, "train", (64, 48), resample="native"
        )
        cache = build_crop_cache(ds, tmp_path / "cache")
        cds = CachedCropDataset(cache)
        assert len(cds) == 4
        np.testing.assert_array_equal(cds[2]["image"], ds[2]["image"])
        np.testing.assert_allclose(
            cds[2]["keypoints"], ds[2]["keypoints"], rtol=1e-6
        )


class TestCOCONativePlane:
    @pytest.fixture
    def coco_jpeg_root(self, tmp_path):
        import json

        import PIL.Image

        rng = np.random.default_rng(9)
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        images, annotations = [], []
        for i in range(4):
            ext = "jpg" if i % 2 == 0 else "png"  # mixed formats
            arr = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
            PIL.Image.fromarray(arr).save(img_dir / f"{i}.{ext}")
            images.append(
                dict(id=i, file_name=f"{i}.{ext}", width=160, height=120)
            )
            kps = rng.uniform([30, 30], [120, 100], (17, 2))
            flat = np.concatenate(
                [kps, np.full((17, 1), 2.0)], 1
            ).reshape(-1).tolist()
            annotations.append(
                dict(id=100 + i, image_id=i, category_id=1, keypoints=flat,
                     num_keypoints=17, bbox=[25.0, 25.0, 100.0, 80.0],
                     area=8000.0, iscrowd=0)
            )
        ann = tmp_path / "ann.json"
        ann.write_text(
            json.dumps(dict(images=images, annotations=annotations))
        )
        return ann, img_dir

    def test_coco_get_batch_native(self, coco_jpeg_root):
        """COCO loader through the C++ plane: mixed JPEG/PNG, expanded
        boxes, full sample schema, __getitem__ routed through the same
        path."""
        from probpose_pytorch_tpu.data.coco import COCOPoseDataset

        if not native.native_available():
            pytest.skip("native plane unavailable")
        ann, img_dir = coco_jpeg_root
        ds = COCOPoseDataset(ann, img_dir, (64, 48), resample="native")
        b = ds.get_batch(range(4))
        assert b["image"].shape == (4, 64, 48, 3)
        assert b["keypoints"].shape == (4, 17, 2)
        assert set(b) >= {"bbox", "image_id", "area", "keypoints_frame",
                          "bbox_frame"}
        s1 = ds[1]
        np.testing.assert_array_equal(s1["image"], b["image"][1])
        assert b["image"].std() > 10
        # labels are identical to the PIL path's (only pixels differ by
        # resampler); pixel convention equals the device preprocess for the
        # losslessly decoded PNG slots
        pil = COCOPoseDataset(ann, img_dir, (64, 48))
        for k in ("keypoints", "bbox", "image_id", "area"):
            np.testing.assert_allclose(
                b[k], pil.get_batch(range(4))[k], rtol=1e-6, err_msg=k
            )

    def test_coco_native_matches_device_preprocess_png(self, coco_jpeg_root):
        import PIL.Image

        from probpose_pytorch_tpu.data.coco import (
            COCOPoseDataset,
            expand_bbox,
        )
        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        if not native.native_available():
            pytest.skip("native plane unavailable")
        ann, img_dir = coco_jpeg_root
        ds = COCOPoseDataset(ann, img_dir, (64, 48), resample="native")
        i = 1  # PNG slot
        rec = ds.records[i]
        with PIL.Image.open(rec["image_path"]) as im:
            frame = np.asarray(im.convert("RGB"), np.uint8)
        box = expand_bbox(rec["bbox"], ds.bbox_scale, 48 / 64)
        device = np.asarray(
            crop_resize(
                frame[None].astype(np.float32) / 255.0,
                np.asarray([box], np.float32),
                (64, 48),
                "bilinear_gather",
            )
        )[0]
        got = ds[i]["image"].astype(np.float32) / 255.0
        assert np.abs(got - device).max() <= (1.5 / 255.0)
