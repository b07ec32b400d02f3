"""Pose OKS-NMS and one-euro temporal smoothing."""

import numpy as np
import pytest

from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.ops.oks_nms import oks_nms, pairwise_oks, soft_oks_nms
from probpose_pytorch_tpu.utils.smoothing import OneEuroFilter, PoseSmoother

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


def _poses(rng, n=4, k=17, spread=100.0):
    return rng.uniform(0, spread, (n, k, 2)).astype(np.float32)


class TestPairwiseOKS:
    def test_self_similarity_is_one(self):
        rng = np.random.default_rng(0)
        kpts = _poses(rng)
        areas = np.full(4, 50.0 * 80.0, np.float32)
        oks = pairwise_oks(kpts, areas)
        np.testing.assert_allclose(np.diag(oks), 1.0, atol=1e-6)

    def test_distant_poses_score_low(self):
        kpts = np.zeros((2, 17, 2), np.float32)
        kpts[1] += 1e4
        oks = pairwise_oks(kpts, np.full(2, 100.0))
        assert oks[0, 1] < 1e-6

    def test_visibility_mask_weights_reference_pose(self):
        rng = np.random.default_rng(1)
        kpts = _poses(rng, n=2)
        kpts[1] = kpts[0]
        kpts[1, 0] += 500  # one keypoint far off
        areas = np.full(2, 100.0)
        vis = np.ones((2, 17))
        full = pairwise_oks(kpts, areas, visible=vis)
        vis_masked = vis.copy()
        vis_masked[0, 0] = 0  # mask the disagreeing keypoint in pose 0
        masked = pairwise_oks(kpts, areas, visible=vis_masked)
        assert masked[0, 1] > full[0, 1]
        np.testing.assert_allclose(masked[0, 1], 1.0, atol=1e-6)

    def test_sigma_length_validated(self):
        # explicit sigmas must match K
        with pytest.raises(ValueError, match="sigmas"):
            pairwise_oks(np.zeros((1, 5, 2)), np.ones(1), sigmas=np.ones(17))
        # default sigmas adapt to non-COCO keypoint counts (uniform at the
        # COCO mean): identical poses → OKS 1
        oks = pairwise_oks(np.zeros((2, 5, 2)), np.ones(2))
        np.testing.assert_allclose(oks, 1.0)


class TestOKSNMS:
    def test_duplicate_suppressed_keeps_higher_score(self):
        rng = np.random.default_rng(2)
        a = _poses(rng, n=1)[0]
        kpts = np.stack([a, a + 0.01, a + 300])  # dup pair + distinct pose
        scores = np.array([0.8, 0.9, 0.5], np.float32)
        keep = oks_nms(kpts, scores, np.full(3, 100.0 * 100.0))
        assert list(keep) == [1, 2]  # higher-scored duplicate wins

    def test_no_overlap_keeps_all(self):
        kpts = np.stack(
            [np.zeros((17, 2)), np.full((17, 2), 1e3), np.full((17, 2), 2e3)]
        ).astype(np.float32)
        keep = oks_nms(kpts, np.array([0.3, 0.9, 0.6]), np.full(3, 100.0))
        assert sorted(keep) == [0, 1, 2]
        assert list(keep) == [1, 2, 0]  # descending score

    def test_empty_input(self):
        assert len(oks_nms(np.zeros((0, 17, 2)), np.zeros(0))) == 0

    def test_soft_nms_decays_duplicates(self):
        rng = np.random.default_rng(3)
        a = _poses(rng, n=1)[0]
        kpts = np.stack([a, a + 0.01])
        scores = np.array([0.9, 0.8], np.float32)
        keep, rescored = soft_oks_nms(kpts, scores, np.full(2, 1e4))
        assert list(keep) == [0, 1]
        assert rescored[0] == pytest.approx(0.9)
        assert rescored[1] < 0.8 * np.exp(-0.9)  # decayed by ~exp(-oks^2/thr)

    def test_soft_nms_max_poses(self):
        kpts = np.stack([np.full((17, 2), 100.0 * i) for i in range(5)])
        keep, _ = soft_oks_nms(
            kpts.astype(np.float32), np.linspace(1, 0.5, 5), max_poses=3
        )
        assert len(keep) == 3


class TestPredictorNMS:
    def test_predict_frame_nms_removes_duplicate_boxes(self, tmp_path):
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48),
                num_keypoints=5,
                backbone="vit-tiny-e2e",
                compute_dtype="float32",
                deconv_out_channels=(16, 16),
                deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            out_dir=str(tmp_path / "run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        predictor = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )
        rng = np.random.default_rng(4)
        frame = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
        # identical duplicate boxes -> identical poses -> one survives;
        # the far box survives alongside.
        boxes = np.array(
            [[10, 10, 50, 60], [10, 10, 50, 60], [70, 20, 50, 60]],
            np.float32,
        )
        sigmas = np.full(5, 0.05, np.float32)

        raw = predictor.predict_frame(frame, boxes, buckets=(4,))
        assert len(raw["keypoints"]) == 3

        out = predictor.predict_frame(
            frame, boxes, buckets=(4,), nms="oks", nms_sigmas=sigmas
        )
        assert len(out["keypoints"]) == 2
        assert "pose_scores" in out and len(out["pose_scores"]) == 2
        # the surviving duplicate and the distinct box are both represented
        kept_x = out["keypoints"][..., 0]
        assert kept_x.min() < 70 and kept_x.max() > 60

        soft = predictor.predict_frame(
            frame, boxes, buckets=(4,), nms="soft_oks", nms_sigmas=sigmas
        )
        assert len(soft["keypoints"]) == 3  # soft keeps, but decays
        assert soft["pose_scores"][-1] < out["pose_scores"].min()

        with pytest.raises(ValueError, match="unknown nms"):
            predictor.predict_frame(
                frame, boxes, buckets=(4,), nms="bogus", nms_sigmas=sigmas
            )


class TestOneEuro:
    def test_first_sample_passthrough(self):
        f = OneEuroFilter()
        x = np.array([1.0, 2.0], np.float32)
        np.testing.assert_allclose(f(x, 0.0), x)

    def test_static_jitter_suppressed(self):
        rng = np.random.default_rng(0)
        f = OneEuroFilter(min_cutoff=1.0, beta=0.007)
        base = np.full(10, 50.0)
        raw, smooth = [], []
        for i in range(200):
            noisy = base + rng.normal(0, 0.5, 10)
            raw.append(noisy)
            smooth.append(f(noisy, i / 30.0))
        raw_var = np.var(np.asarray(raw)[50:], axis=0).mean()
        smooth_var = np.var(np.asarray(smooth)[50:], axis=0).mean()
        assert smooth_var < raw_var * 0.25

    def test_fast_motion_tracked(self):
        f = OneEuroFilter(min_cutoff=1.0, beta=0.2)
        lag = 0.0
        for i in range(120):
            t = i / 30.0
            x = np.array([300.0 * t])  # 300 px/s sweep
            y = f(x, t)
            lag = abs(float(x[0] - y[0]))
        assert lag < 15.0  # adaptive cutoff keeps lag under ~1.5 frames

    def test_non_monotonic_time_ignored(self):
        f = OneEuroFilter()
        f(np.array([1.0]), 1.0)
        y = f(np.array([100.0]), 0.5)  # stale timestamp
        np.testing.assert_allclose(y, [1.0])


class TestPoseSmoother:
    def test_tracks_are_independent_and_stale_dropped(self):
        sm = PoseSmoother(max_gap=0.5)
        k = np.zeros((2, 3, 2), np.float32)
        k[1] += 100
        out = sm.update(k, ["a", "b"], t=0.0)
        np.testing.assert_allclose(out, k)
        assert set(sm._filters) == {"a", "b"}
        # only "a" continues; after the gap "b" is dropped
        sm.update(k[:1], ["a"], t=1.0)
        assert set(sm._filters) == {"a"}
        # a re-appearing id starts fresh (passthrough again)
        out = sm.update(k[1:], ["b"], t=1.1)
        np.testing.assert_allclose(out[0], k[1])
