"""Fused preprocessing tests: PIL-equivalence and coordinate round trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.ops.preprocess import (
    crop_resize,
    transform_keypoints,
    untransform_keypoints,
)


def _rand_image(h=96, w=80, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


class TestCropResize:
    def test_identity_crop(self):
        img = _rand_image(32, 24)
        out = crop_resize(
            jnp.asarray(img[None]),
            jnp.asarray([[0.0, 0.0, 24.0, 32.0]]),
            (32, 24),
            "linear",
        )
        np.testing.assert_allclose(
            np.asarray(out)[0], img.astype(np.float32) / 255.0, atol=1e-5
        )

    @pytest.mark.parametrize("method", ["linear", "bilinear_gather"])
    def test_matches_pil_bilinear_downscale(self, method):
        import PIL.Image

        img = _rand_image(96, 80, seed=1)
        box = (8.0, 12.0, 48.0, 64.0)
        out = crop_resize(
            jnp.asarray(img[None]),
            jnp.asarray([list(box)]),
            (32, 24),
            method,
        )
        ref = (
            np.asarray(
                PIL.Image.fromarray(img)
                .crop((box[0], box[1], box[0] + box[2], box[1] + box[3]))
                .resize((24, 32), PIL.Image.BILINEAR)
            ).astype(np.float32)
            / 255.0
        )
        # PIL BILINEAR antialiases on downscale; the gather path doesn't, so
        # compare only the antialiasing path tightly.
        tol = 0.02 if method == "linear" else 0.2
        assert np.abs(np.asarray(out)[0] - ref).mean() < tol

    def test_lanczos_close_to_pil_lanczos(self):
        import PIL.Image

        img = _rand_image(128, 128, seed=2)
        box = (16.0, 16.0, 96.0, 96.0)
        out = crop_resize(
            jnp.asarray(img[None]),
            jnp.asarray([list(box)]),
            (48, 48),
            "lanczos3",
        )
        ref = (
            np.asarray(
                PIL.Image.fromarray(img)
                .crop((16, 16, 112, 112))
                .resize((48, 48), PIL.Image.LANCZOS)
            ).astype(np.float32)
            / 255.0
        )
        assert np.abs(np.asarray(out)[0] - ref).mean() < 5e-3

    def test_out_of_bounds_is_black(self):
        img = np.full((20, 20, 3), 255, np.uint8)
        out = np.asarray(
            crop_resize(
                jnp.asarray(img[None]),
                jnp.asarray([[-10.0, -10.0, 20.0, 20.0]]),
                (10, 10),
                "linear",
            )
        )[0]
        assert out[:4, :4].max() == 0.0  # outside the image -> black
        assert out[-3:, -3:].min() > 0.9  # quadrant overlapping image -> white

    def test_batched_boxes_differ(self):
        img = np.zeros((40, 40, 3), np.uint8)
        img[:20] = 255
        imgs = jnp.asarray(np.stack([img, img]))
        boxes = jnp.asarray([[0.0, 0.0, 40.0, 20.0], [0.0, 20.0, 40.0, 20.0]])
        out = np.asarray(crop_resize(imgs, boxes, (8, 8), "linear"))
        # Interior rows (the wide antialias kernel bleeds at the 50% boundary).
        assert out[0][:6].min() > 0.9
        assert out[1][2:].max() < 0.1


class TestKeypointTransforms:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        kpts = jnp.asarray(rng.uniform(0, 200, (3, 7, 2)).astype(np.float32))
        boxes = jnp.asarray(
            rng.uniform([0, 0, 50, 50], [100, 100, 150, 150], (3, 4)).astype(
                np.float32
            )
        )
        crop = transform_keypoints(kpts, boxes, (256, 192))
        back = untransform_keypoints(crop, boxes, (256, 192))
        np.testing.assert_allclose(np.asarray(back), np.asarray(kpts), rtol=1e-4, atol=1e-3)

    def test_matches_reference_formula(self):
        kpts = jnp.asarray([[[60.0, 80.0]]])
        boxes = jnp.asarray([[50.0, 50.0, 100.0, 200.0]])
        out = np.asarray(transform_keypoints(kpts, boxes, (256, 192)))
        np.testing.assert_allclose(
            out[0, 0], [(60 - 50) / 100 * 192, (80 - 50) / 200 * 256]
        )


class TestBilinearMatmul:
    def test_matches_gather_path(self):
        rng = np.random.default_rng(5)
        imgs = rng.integers(0, 256, (3, 60, 50, 3), dtype=np.uint8)
        boxes = rng.uniform([0, 0, 20, 20], [20, 20, 30, 40], (3, 4)).astype(
            np.float32
        )
        a = np.asarray(
            crop_resize(jnp.asarray(imgs), jnp.asarray(boxes), (32, 24),
                        "bilinear_matmul")
        )
        b = np.asarray(
            crop_resize(jnp.asarray(imgs), jnp.asarray(boxes), (32, 24),
                        "bilinear_gather")
        )
        # bf16 matmul inputs: ~3e-3 relative quantization
        assert np.abs(a - b).max() < 0.01

    def test_out_of_bounds_black(self):
        img = np.full((20, 20, 3), 255, np.uint8)
        out = np.asarray(
            crop_resize(
                jnp.asarray(img[None]),
                jnp.asarray([[-10.0, -10.0, 20.0, 20.0]]),
                (10, 10),
                "bilinear_matmul",
            )
        )[0]
        assert out[:4, :4].max() == 0.0
        assert out[-3:, -3:].min() > 0.9
