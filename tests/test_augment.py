"""On-device augmentation tests: flip correctness, box jitter, color jitter,
train-step integration, NaN-guard optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.ops.augment import (
    AugmentConfig,
    augment_boxes,
    color_jitter,
    flip_crops_and_keypoints,
)


class TestFlip:
    def test_always_flip_mirrors_image_and_keypoints(self):
        cfg = AugmentConfig(flip_prob=1.0, flip_pairs=((0, 1),))
        rng = np.random.default_rng(0)
        crops = jnp.asarray(rng.random((2, 8, 10, 3), np.float32))
        kpts = jnp.asarray([[[2.0, 3.0], [7.0, 1.0], [4.0, 4.0]]] * 2)
        vis = jnp.asarray([[1.0, 0.0, 1.0]] * 2)
        visb = jnp.asarray([[0.0, 1.0, 1.0]] * 2)
        c2, k2, v2, vb2 = flip_crops_and_keypoints(
            jax.random.PRNGKey(0), crops, kpts, vis, visb, cfg
        )
        np.testing.assert_allclose(np.asarray(c2), np.asarray(crops)[:, :, ::-1])
        # x -> W-1-x, pair (0,1) swapped
        np.testing.assert_allclose(
            np.asarray(k2)[0], [[9 - 7, 1.0], [9 - 2, 3.0], [9 - 4, 4.0]]
        )
        np.testing.assert_allclose(np.asarray(v2)[0], [0.0, 1.0, 1.0])
        np.testing.assert_allclose(np.asarray(vb2)[0], [1.0, 0.0, 1.0])

    def test_never_flip_is_identity(self):
        cfg = AugmentConfig(flip_prob=0.0)
        crops = jnp.ones((1, 4, 4, 3))
        kpts = jnp.asarray([[[1.0, 2.0]] * 17])
        vis = jnp.ones((1, 17))
        c2, k2, *_ = flip_crops_and_keypoints(
            jax.random.PRNGKey(0), crops, kpts, vis, vis, cfg
        )
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(kpts))


class TestBoxAndColor:
    def test_box_jitter_bounded(self):
        cfg = AugmentConfig(scale_jitter=0.2, shift_jitter=0.1)
        boxes = jnp.asarray([[10.0, 20.0, 100.0, 200.0]] * 64)
        out = np.asarray(augment_boxes(jax.random.PRNGKey(1), boxes, cfg))
        assert (out[:, 2] >= 80).all() and (out[:, 2] <= 120).all()
        assert (out[:, 3] >= 160).all() and (out[:, 3] <= 240).all()
        centers = out[:, 0] + out[:, 2] / 2
        assert np.abs(centers - 60).max() <= 10 + 1e-4
        assert out.std(axis=0)[2] > 0  # actually random

    def test_color_jitter_stays_in_range(self):
        cfg = AugmentConfig(brightness=0.3, contrast=0.3)
        crops = jnp.asarray(
            np.random.default_rng(0).random((8, 6, 6, 3), np.float32)
        )
        out = np.asarray(color_jitter(jax.random.PRNGKey(2), crops, cfg))
        assert out.min() >= 0 and out.max() <= 1
        assert not np.allclose(out, np.asarray(crops))


class TestTrainIntegration:
    def test_augmented_step_runs_and_is_deterministic_per_step(self, tmp_path):
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer
        from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator

        ViTConfig.PRESETS.setdefault(
            "vit-tiny-aug", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-aug",
                compute_dtype="float32", deconv_out_channels=(16, 16),
                deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            augment=AugmentConfig(flip_prob=0.5, brightness=0.2, contrast=0.2,
                                  flip_pairs=((0, 1), (2, 3))),
            train_batch_size=4,
            out_dir=str(tmp_path),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=10)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5)
        batch = {k: jnp.asarray(v) for k, v in
                 next(iter(batch_iterator(ds, 4, num_workers=1))).items()}
        s1, m1 = trainer.train_step(trainer.state, batch)
        assert np.isfinite(float(m1["loss"]))

        # Same step index + same batch -> identical loss (fold_in
        # determinism). Rebuild only the initial state (same seed) and reuse
        # the already-compiled step instead of compiling a second trainer.
        from probpose_pytorch_tpu.train.state import create_train_state

        H, W = cfg.model.img_size
        state_b = create_train_state(
            trainer.model,
            jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, H, W, 3), jnp.float32),
            trainer.tx,
        )
        _, m2 = trainer.train_step(state_b, batch)
        assert float(m1["loss"]) == float(m2["loss"])

    def test_config_roundtrip_with_augment(self, tmp_path):
        from probpose_pytorch_tpu.train import TrainConfig

        cfg = TrainConfig(augment=AugmentConfig(flip_prob=0.3))
        p = tmp_path / "c.json"
        cfg.save(p)
        cfg2 = TrainConfig.load(p)
        assert cfg2.augment.flip_prob == 0.3
        assert cfg2.augment.flip_pairs == AugmentConfig().flip_pairs
        assert cfg2 == cfg


class TestNaNGuard:
    def test_nonfinite_updates_skipped(self):
        import optax

        from probpose_pytorch_tpu.train.config import OptimConfig
        from probpose_pytorch_tpu.train.state import make_optimizer

        tx = make_optimizer(
            OptimConfig(max_nonfinite_skips=3), total_steps=100
        )
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
        updates, state = tx.update(bad, state, params)
        np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)
        good = {"w": jnp.ones(3)}
        updates, state = tx.update(good, state, params)
        assert float(jnp.abs(updates["w"]).sum()) > 0


class TestRotation:
    def test_zero_rotation_identity(self):
        from probpose_pytorch_tpu.ops.augment import rotate_crops

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)), jnp.float32)
        kpts = jnp.asarray(rng.uniform(0, 8, (2, 5, 2)), jnp.float32)
        out, okp = rotate_crops(imgs, kpts, jnp.zeros((2,)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(okp), np.asarray(kpts),
                                   atol=1e-5)

    def test_90deg_square_matches_rot90(self):
        """theta=+90 deg on a square crop equals np.rot90 (up to the exact
        lattice mapping), and a keypoint follows the same mapping."""
        from probpose_pytorch_tpu.ops.augment import rotate_crops

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 9, 9, 1)).astype(np.float32)
        kpts = np.array([[[6.0, 2.0]]], np.float32)
        theta = jnp.asarray([np.pi / 2])
        out, okp = rotate_crops(jnp.asarray(img), jnp.asarray(kpts), theta)
        # dst(x,y) samples src at R(-90)(d-c)+c = (dy-cy+cx, -(dx-cx)+cy):
        # equivalent to rotating the IMAGE counter-clockwise in (x right,
        # y down) pixel coordinates == np.rot90(..., k=-1) on the array.
        expect = np.rot90(img[0, :, :, 0], k=-1)
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :, 0], expect, atol=1e-4
        )
        # keypoint (6,2) about center (4,4): R(90)([2,-2]) = [2, 2] -> (6,6)
        np.testing.assert_allclose(
            np.asarray(okp)[0, 0], [6.0, 6.0], atol=1e-4
        )

    def test_keypoints_track_content(self):
        """A bright dot at a keypoint stays under the rotated keypoint."""
        from probpose_pytorch_tpu.ops.augment import rotate_crops

        img = np.zeros((1, 33, 33, 1), np.float32)
        img[0, 8, 22, 0] = 1.0
        kpts = np.array([[[22.0, 8.0]]], np.float32)
        theta = jnp.asarray([0.3])
        out, okp = rotate_crops(jnp.asarray(img), jnp.asarray(kpts), theta)
        o = np.asarray(out)[0, :, :, 0]
        iy, ix = np.unravel_index(np.argmax(o), o.shape)
        kx, ky = np.asarray(okp)[0, 0]
        assert abs(ix - kx) <= 1.0 and abs(iy - ky) <= 1.0, (
            (ix, iy), (kx, ky)
        )

    def test_random_rotation_in_train_step(self, tmp_path):
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        ViTConfig.PRESETS.setdefault(
            "vit-tiny-e2e",
            dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5,
                backbone="vit-tiny-e2e", compute_dtype="float32",
                deconv_out_channels=(16, 16), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
            augment=AugmentConfig(
                flip_prob=0.0, scale_jitter=0.0, shift_jitter=0.0,
                brightness=0.0, contrast=0.0, rotation_deg=30.0,
            ),
            epochs=1, train_batch_size=4,
            out_dir=str(tmp_path / "run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=0)
        batch = next(iter(batch_iterator(ds, 4, shuffle=False,
                                         num_workers=1)))
        state, m = trainer.train_step(trainer.state, batch)
        assert np.isfinite(float(m["loss"]))


class TestHalfBody:
    """half_body_boxes — the HRNet/MMPose RandomHalfBody recipe on device."""

    def _kpts(self):
        # 17 keypoints on a grid: upper (0-10) in y [0, 50], lower (11-16)
        # in y [100, 160]; all in x [10, 90].
        k = np.zeros((17, 2), np.float32)
        for i in range(11):
            k[i] = [10 + 8 * i, 5 * i]
        for j, i in enumerate(range(11, 17)):
            k[i] = [20 + 12 * j, 100 + 10 * j]
        return k

    def test_forced_apply_gives_padded_half_bbox(self):
        from probpose_pytorch_tpu.ops.augment import half_body_boxes

        k = self._kpts()
        boxes = jnp.asarray([[0.0, 0.0, 200.0, 200.0]])
        labeled = jnp.ones((1, 17))
        # Empty "upper" set: the coin's upper pick falls through (HRNet
        # fallback), so every sample selects the lower half == all
        # keypoints -> deterministic expectation.
        cfg = AugmentConfig(
            half_body_prob=1.0, half_body_min_total=8,
            half_body_min_half=2, half_body_padding=1.5,
            upper_body_ids=(),
        )
        out = np.asarray(
            half_body_boxes(
                jax.random.PRNGKey(0), boxes, jnp.asarray(k)[None], labeled,
                cfg, aspect=None,
            )
        )[0]
        xmin, ymin = k.min(axis=0)
        xmax, ymax = k.max(axis=0)
        w, h = (xmax - xmin) * 1.5, (ymax - ymin) * 1.5
        np.testing.assert_allclose(
            out,
            [
                (xmin + xmax) / 2 - w / 2,
                (ymin + ymax) / 2 - h / 2,
                w,
                h,
            ],
            rtol=1e-6,
        )

    def test_upper_or_lower_bbox(self):
        """With the real COCO split, every applied box must be the padded
        bbox of either the upper or the lower half."""
        from probpose_pytorch_tpu.ops.augment import half_body_boxes

        k = self._kpts()
        B = 64
        boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 200.0, 200.0]]), (B, 1))
        kpts = jnp.tile(jnp.asarray(k)[None], (B, 1, 1))
        labeled = jnp.ones((B, 17))
        cfg = AugmentConfig(half_body_prob=1.0)
        out = np.asarray(
            half_body_boxes(
                jax.random.PRNGKey(1), boxes, kpts, labeled, cfg, aspect=None
            )
        )

        def padded(idx):
            s = k[list(idx)]
            xmin, ymin = s.min(axis=0)
            xmax, ymax = s.max(axis=0)
            w, h = (xmax - xmin) * 1.5, (ymax - ymin) * 1.5
            return np.asarray(
                [(xmin + xmax) / 2 - w / 2, (ymin + ymax) / 2 - h / 2, w, h]
            )

        up, lo = padded(range(11)), padded(range(11, 17))
        match_up = np.isclose(out, up[None], rtol=1e-5).all(axis=1)
        match_lo = np.isclose(out, lo[None], rtol=1e-5).all(axis=1)
        assert (match_up | match_lo).all()
        assert match_up.any() and match_lo.any()  # the coin actually flips

    def test_insufficient_keypoints_keeps_box(self):
        from probpose_pytorch_tpu.ops.augment import half_body_boxes

        k = self._kpts()
        boxes = jnp.asarray([[1.0, 2.0, 50.0, 60.0]] * 2)
        kpts = jnp.tile(jnp.asarray(k)[None], (2, 1, 1))
        # sample 0: only 5 labeled (< min_total) -> unchanged;
        # sample 1: all labeled -> may change.
        labeled = np.zeros((2, 17), np.float32)
        labeled[0, :5] = 1
        labeled[1, :] = 1
        cfg = AugmentConfig(half_body_prob=1.0)
        out = np.asarray(
            half_body_boxes(
                jax.random.PRNGKey(2), boxes, kpts, jnp.asarray(labeled),
                cfg, aspect=None,
            )
        )
        np.testing.assert_allclose(out[0], [1.0, 2.0, 50.0, 60.0])
        assert not np.allclose(out[1], [1.0, 2.0, 50.0, 60.0])

    def test_aspect_conditioning_matches_expand_bbox(self):
        from probpose_pytorch_tpu.data.coco import expand_bbox
        from probpose_pytorch_tpu.ops.augment import half_body_boxes

        k = self._kpts()
        boxes = jnp.asarray([[0.0, 0.0, 200.0, 200.0]])
        labeled = jnp.ones((1, 17))
        cfg = AugmentConfig(
            half_body_prob=1.0, half_body_padding=1.5,
            upper_body_ids=(),
        )
        aspect = 192 / 256
        out = np.asarray(
            half_body_boxes(
                jax.random.PRNGKey(0), boxes, jnp.asarray(k)[None], labeled,
                cfg, aspect=aspect,
            )
        )[0]
        xmin, ymin = k.min(axis=0)
        xmax, ymax = k.max(axis=0)
        raw = np.asarray([xmin, ymin, xmax - xmin, ymax - ymin])
        np.testing.assert_allclose(
            out, expand_bbox(raw, scale=1.5, aspect=aspect), rtol=1e-5
        )

    def test_zero_prob_identity_and_jit(self):
        from probpose_pytorch_tpu.ops.augment import half_body_boxes

        k = self._kpts()
        boxes = jnp.asarray([[3.0, 4.0, 90.0, 170.0]])
        cfg = AugmentConfig(half_body_prob=0.0)
        fn = jax.jit(
            lambda key, b, kp, lab: half_body_boxes(
                key, b, kp, lab, cfg, aspect=0.75
            )
        )
        out = np.asarray(
            fn(jax.random.PRNGKey(0), boxes, jnp.asarray(k)[None],
               jnp.ones((1, 17)))
        )
        np.testing.assert_allclose(out[0], [3.0, 4.0, 90.0, 170.0])

    def test_half_body_in_frame_mode_train_step(self, tmp_path):
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        ViTConfig.PRESETS.setdefault(
            "vit-tiny-e2e",
            dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17,
                backbone="vit-tiny-e2e", compute_dtype="float32",
                deconv_out_channels=(16, 16), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
            augment=AugmentConfig(
                flip_prob=0.0, scale_jitter=0.0, shift_jitter=0.0,
                brightness=0.0, contrast=0.0,
                half_body_prob=1.0, half_body_min_total=3,
            ),
            epochs=1, train_batch_size=4,
            out_dir=str(tmp_path / "run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 17, seed=0)
        batch = next(iter(batch_iterator(ds, 4, shuffle=False,
                                         num_workers=1)))
        H, W = cfg.model.img_size
        frame_batch = dict(
            frame=jnp.asarray(batch["image"]),
            box=jnp.tile(jnp.asarray([[0.0, 0.0, W, H]]), (4, 1)),
            keypoints=jnp.asarray(batch["keypoints"]),
            keypoints_visible=jnp.asarray(batch["keypoints_visible"]),
            keypoints_visibility=jnp.asarray(batch["keypoints_visibility"]),
        )
        state, m = trainer.train_step(trainer.state, frame_batch)
        assert np.isfinite(float(m["loss"]))

    def test_config_roundtrip_with_half_body(self, tmp_path):
        from probpose_pytorch_tpu.train import TrainConfig

        cfg = TrainConfig(
            augment=AugmentConfig(half_body_prob=0.3, upper_body_ids=(0, 1, 2))
        )
        p = tmp_path / "c.json"
        cfg.save(p)
        cfg2 = TrainConfig.load(p)
        assert cfg2.augment.half_body_prob == 0.3
        assert cfg2.augment.upper_body_ids == (0, 1, 2)
        assert cfg2 == cfg
