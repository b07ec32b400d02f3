"""Single-stage (bottom-up) multi-person pose family: keypoint target
encoding, pose decode roundtrip, the kpt loss term, a learning smoke, the
oracle AP=1 plumbing proof, and the train/eval CLI path."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.detect import (
    BottomUpPredictor,
    decode_poses,
    detection_loss,
    encode_boxes,
    evaluate_bottomup,
)


def _xywh(cx, cy, w, h):
    return [cx - w / 2, cy - h / 2, w, h]


class TestKeypointCodec:
    def test_encode_keypoint_targets(self):
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])  # cell (8, 5)
        kpts = jnp.asarray(
            [[[[30.0, 18.0, 2.0], [40.0, 26.0, 1.0], [0.0, 0.0, 0.0]]]]
        )  # (1, 1, 3, 3)
        t = jax.jit(
            lambda b, m, k: encode_boxes(
                b, m, (16, 16), stride=4, keypoints=k
            )
        )(boxes, jnp.ones((1, 1)), kpts)
        assert t["kpts"].shape == (1, 1, 3, 2)
        # joint/stride - integer center cell (8, 5)
        np.testing.assert_allclose(
            np.asarray(t["kpts"][0, 0]),
            [[30 / 4 - 8, 18 / 4 - 5], [40 / 4 - 8, 26 / 4 - 5],
             [0 / 4 - 8, 0 / 4 - 5]],
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(t["kpt_mask"][0, 0]), [True, True, False]
        )

    def test_kpt_mask_respects_instance_validity(self):
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])
        kpts = jnp.full((1, 1, 2, 3), 2.0)
        t = encode_boxes(
            boxes, jnp.zeros((1, 1)), (16, 16), stride=4, keypoints=kpts
        )
        assert not np.asarray(t["kpt_mask"]).any()

    def test_decode_poses_roundtrip(self):
        H = W = 32
        stride = 4
        rng = np.random.default_rng(0)
        gt_boxes = np.stack(
            [_xywh(30.0, 40.0, 24.0, 48.0), _xywh(90.0, 70.0, 36.0, 60.0)]
        )[None]
        Kj = 5
        gt_kpts = np.zeros((1, 2, Kj, 3), np.float32)
        for m in range(2):
            cx = gt_boxes[0, m, 0] + gt_boxes[0, m, 2] / 2
            cy = gt_boxes[0, m, 1] + gt_boxes[0, m, 3] / 2
            gt_kpts[0, m, :, 0] = cx + rng.uniform(-10, 10, Kj)
            gt_kpts[0, m, :, 1] = cy + rng.uniform(-10, 10, Kj)
            gt_kpts[0, m, :, 2] = 2.0
        t = encode_boxes(
            jnp.asarray(gt_boxes), jnp.ones((1, 2)), (H, W), stride,
            keypoints=jnp.asarray(gt_kpts),
        )
        heat = np.asarray(t["heat"])
        logits = np.log(np.clip(heat, 1e-6, 1 - 1e-6)) - np.log1p(
            -np.clip(heat, 1e-6, 1 - 1e-6)
        )
        size = rng.normal(0, 0.1, (1, H, W, 2)).astype(np.float32)
        off = np.zeros((1, H, W, 2), np.float32)
        kmap = np.zeros((1, H, W, 2 * Kj), np.float32)
        for m in range(2):
            i = int(t["ind"][0, m])
            size[0, i // W, i % W] = np.asarray(t["size"][0, m])
            off[0, i // W, i % W] = np.asarray(t["offset"][0, m])
            kmap[0, i // W, i % W] = np.asarray(t["kpts"][0, m]).reshape(-1)
        boxes, scores, poses, kscores = jax.jit(
            lambda c, s, o, kk: decode_poses(
                c, s, o, kk, k=4, stride=stride
            )
        )(
            jnp.asarray(logits[..., None]),
            jnp.asarray(size),
            jnp.asarray(off),
            jnp.asarray(kmap),
        )
        boxes = np.asarray(boxes[0])
        scores = np.asarray(scores[0])
        poses = np.asarray(poses[0])
        assert (scores[:2] > 0.9).all() and (scores[2:] < 0.5).all()
        order = np.argsort(boxes[:2, 0])
        want_order = np.argsort(gt_boxes[0, :, 0])
        np.testing.assert_allclose(
            boxes[:2][order], gt_boxes[0][want_order], atol=1e-3
        )
        np.testing.assert_allclose(
            poses[:2][order], gt_kpts[0, want_order, :, :2], atol=1e-3
        )


class TestKptLoss:
    def _setup(self):
        H = W = 16
        stride = 4
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])
        kpts = jnp.asarray(
            [[[[30.0, 18.0, 2.0], [40.0, 26.0, 2.0], [5.0, 5.0, 0.0]]]]
        )
        t = encode_boxes(
            boxes, jnp.ones((1, 1)), (H, W), stride, keypoints=kpts
        )
        heat = np.asarray(t["heat"])
        logits = np.log(np.clip(heat, 1e-4, 1 - 1e-4)) - np.log1p(
            -np.clip(heat, 1e-4, 1 - 1e-4)
        )
        pred = dict(
            center=jnp.asarray(logits[..., None]),
            size=jnp.zeros((1, H, W, 2)),
            offset=jnp.zeros((1, H, W, 2)),
        )
        kmap = np.zeros((1, H, W, 6), np.float32)
        i = int(t["ind"][0, 0])
        kmap[0, i // W, i % W] = np.asarray(t["kpts"][0, 0]).reshape(-1)
        return t, pred, kmap, (i // W, i % W)

    def test_perfect_kpts_zero_term(self):
        t, pred, kmap, _ = self._setup()
        pred["kpts"] = jnp.asarray(kmap)
        total, terms = detection_loss(pred, t)
        assert float(terms["kpts"]) == pytest.approx(0.0, abs=1e-6)

    def test_unlabeled_joint_does_not_contribute(self):
        t, pred, kmap, (cy, cx) = self._setup()
        # Perturb ONLY the unlabeled (v=0) joint's regression: loss stays 0.
        kmap2 = kmap.copy()
        kmap2[0, cy, cx, 4:6] += 100.0
        pred["kpts"] = jnp.asarray(kmap2)
        _, terms = detection_loss(pred, t)
        assert float(terms["kpts"]) == pytest.approx(0.0, abs=1e-6)
        # Perturbing a labeled joint does register.
        kmap3 = kmap.copy()
        kmap3[0, cy, cx, 0:2] += 1.0
        pred["kpts"] = jnp.asarray(kmap3)
        _, terms3 = detection_loss(pred, t)
        assert float(terms3["kpts"]) > 0.1

    def test_gradients_finite(self):
        t, pred, kmap, _ = self._setup()

        def loss_of(km):
            p = dict(pred, kpts=km)
            total, _ = detection_loss(p, t)
            return total

        g = jax.grad(loss_of)(jnp.asarray(kmap) + 0.3)
        assert np.isfinite(np.asarray(g)).all()


class TestLearning:
    def test_bottomup_overfits_one_batch(self):
        from probpose_pytorch_tpu.detect.train import DetectorTrainer

        rng = np.random.default_rng(0)
        B, hw, Kj = 4, (96, 96), 4
        joint_off = np.asarray(
            [[-8.0, -8.0], [8.0, -8.0], [-8.0, 8.0], [8.0, 8.0]]
        )
        frames, boxes, masks, kpts = [], [], [], []
        first_centers = None
        for b in range(B):
            n = int(rng.integers(1, 3))
            centers = [
                (float(rng.uniform(25, 71)), float(rng.uniform(25, 71)))
                for _ in range(n)
            ]
            if first_centers is None:
                first_centers = centers
            H, W = hw
            frame = rng.uniform(0, 30, (H, W, 3)).astype(np.float32)
            ys, xs = np.mgrid[0:H, 0:W]
            for cx, cy in centers:
                g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 6.0**2))
                frame += g[..., None] * np.asarray([200.0, 160.0, 40.0])
            frames.append(np.clip(frame, 0, 255).astype(np.uint8))
            bs = np.zeros((4, 4), np.float32)
            ms = np.zeros((4,), np.float32)
            kp = np.zeros((4, Kj, 3), np.float32)
            for i, (cx, cy) in enumerate(centers):
                bs[i] = _xywh(cx, cy, 24.0, 24.0)
                ms[i] = 1.0
                kp[i, :, 0] = cx + joint_off[:, 0]
                kp[i, :, 1] = cy + joint_off[:, 1]
                kp[i, :, 2] = 2.0
            boxes.append(bs)
            masks.append(ms)
            kpts.append(kp)
        batch = dict(
            frame=np.stack(frames),
            boxes=np.stack(boxes),
            box_mask=np.stack(masks),
            ignore_boxes=np.zeros((B, 2, 4), np.float32),
            ignore_mask=np.zeros((B, 2), np.float32),
            keypoints=np.stack(kpts),
        )
        trainer = DetectorTrainer.create(
            img_size=hw, preset="conv-t", lr=2e-3, total_steps=60,
            num_keypoints=Kj,
        )
        first = None
        for _ in range(60):
            terms = trainer.train_step(batch)
            if first is None:
                first = float(terms["total"])
        assert float(terms["total"]) < first / 2
        assert float(terms["kpts"]) < 1.0  # cells; started ~2 (8px/stride4)

        pred = BottomUpPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.25,
        )
        out = pred.predict_frame(batch["frame"][0])
        assert len(out["keypoints"]) >= 1
        # every true person has a predicted pose whose joints land within
        # ~1.5 cells of the deterministic GT joints
        want = np.stack(
            [
                np.asarray(c)[None] + joint_off
                for c in first_centers
            ]
        )  # (n, Kj, 2)
        d = np.linalg.norm(
            out["keypoints"][None] - want[:, None], axis=-1
        ).max(axis=-1).min(axis=1)
        assert (d < 8.0).all(), d


class TestJointHeatmapRefinement:
    """kpt_heatmaps=True: per-joint splat targets, the snap decode, the
    extra loss terms, and per-joint confidences end to end."""

    def test_encode_joint_heatmap_targets(self):
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])
        kpts = jnp.asarray(
            [[[[30.0, 18.0, 2.0], [41.0, 27.0, 1.0], [5.0, 5.0, 0.0]]]]
        )  # (1, 1, 3, 3): two labeled joints, one unlabeled
        t = jax.jit(
            lambda b, m, k: encode_boxes(
                b, m, (16, 16), stride=4, keypoints=k, kpt_heatmaps=True
            )
        )(boxes, jnp.ones((1, 1)), kpts)
        kh = np.asarray(t["kpt_heat"])  # (1, 16, 16, 3)
        assert kh.shape == (1, 16, 16, 3)
        # labeled joints splat exactly 1.0 at their integer cells
        assert kh[0, 4, 7, 0] == pytest.approx(1.0)  # (30, 18) -> (7, 4)
        assert kh[0, 6, 10, 1] == pytest.approx(1.0)  # (41, 27) -> (10, 6)
        # the unlabeled joint's channel is empty
        assert kh[0, :, :, 2].max() == 0.0
        np.testing.assert_array_equal(
            np.asarray(t["kpt_cell_mask"][0, 0]), [True, True, False]
        )
        # (the unlabeled joint's index is an unmasked dummy: cell (1, 1))
        np.testing.assert_array_equal(
            np.asarray(t["kpt_ind"][0, 0]),
            [4 * 16 + 7, 6 * 16 + 10, 1 * 16 + 1],
        )
        np.testing.assert_allclose(
            np.asarray(t["kpt_off"][0, 0, :2]),
            [[30 / 4 - 7, 18 / 4 - 4], [41 / 4 - 10, 27 / 4 - 6]],
            atol=1e-6,
        )

    def test_kpt_heat_ignores_invalid_instances(self):
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])
        kpts = jnp.full((1, 1, 2, 3), 2.0).at[..., :2].set(30.0)
        t = encode_boxes(
            boxes, jnp.zeros((1, 1)), (16, 16), stride=4,
            keypoints=kpts, kpt_heatmaps=True,
        )
        assert np.asarray(t["kpt_heat"]).max() == 0.0
        assert not np.asarray(t["kpt_cell_mask"]).any()

    def _snap_setup(self):
        """One person at center cell (8, 8); regression proposes joint 0
        two cells off the true location; the joint heatmap peaks at the
        true cell with a sub-cell offset."""
        H = W = 32
        stride = 4
        Kj = 2
        c_logits = np.full((1, H, W, 1), -10.0, np.float32)
        c_logits[0, 8, 8, 0] = 10.0  # person center at cell (8, 8)
        size = np.zeros((1, H, W, 2), np.float32)
        size[0, 8, 8] = [10.0, 10.0]  # 40x40 px box about (32, 32)
        off = np.zeros((1, H, W, 2), np.float32)
        kmap = np.zeros((1, H, W, 2 * Kj), np.float32)
        # joint 0 regressed to center + (2, 0) cells = (40, 32) px;
        # true joint at (32, 24) px = cell (8, 6) + offset (0.25, 0.3)
        kmap[0, 8, 8, 0:2] = [2.0, 0.0]
        kmap[0, 8, 8, 2:4] = [0.0, -1.0]  # joint 1: no heatmap support
        kheat = np.full((1, H, W, Kj), -10.0, np.float32)
        kheat[0, 6, 8, 0] = 8.0  # strong peak, same-type channel
        koff = np.zeros((1, H, W, 2), np.float32)
        koff[0, 6, 8] = [0.25, 0.3]
        return (
            stride,
            jnp.asarray(c_logits),
            jnp.asarray(size),
            jnp.asarray(off),
            jnp.asarray(kmap),
            jnp.asarray(kheat),
            jnp.asarray(koff),
        )

    def test_decode_snaps_to_same_type_peak(self):
        stride, cl, sz, off, km, kh, ko = self._snap_setup()
        boxes, scores, poses, ks = jax.jit(
            lambda c, s, o, m, h, jo: decode_poses(
                c, s, o, m, k=4, stride=stride, kpt_heat=h,
                kpt_offset=jo, snap_threshold=0.1,
            )
        )(cl, sz, off, km, kh, ko)
        poses = np.asarray(poses[0])
        ks = np.asarray(ks[0])
        # joint 0 snapped to the peak cell + sub-cell offset, in px
        np.testing.assert_allclose(
            poses[0, 0], [(8 + 0.25) * 4, (6 + 0.3) * 4], atol=1e-4
        )
        # its confidence is the peak's sigmoid probability
        assert ks[0, 0] == pytest.approx(1 / (1 + np.exp(-8.0)), abs=1e-5)
        # joint 1 has no admissible peak in its channel: regression kept,
        # confidence read from its heatmap at the regressed cell (~0)
        np.testing.assert_allclose(poses[0, 1], [32.0, 28.0], atol=1e-4)
        assert ks[0, 1] < 0.01

    def test_decode_snap_respects_person_box(self):
        """A peak outside the person's box must not steal the joint."""
        stride, cl, sz, off, km, kh, ko = self._snap_setup()
        kh = np.array(kh)
        kh[0, 6, 8, 0] = -10.0
        kh[0, 30, 30, 0] = 9.0  # strong peak far outside the 40px box
        _, _, poses, ks = decode_poses(
            cl, sz, off, km, k=4, stride=stride,
            kpt_heat=jnp.asarray(kh), kpt_offset=ko, snap_threshold=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(poses[0, 0, 0]), [40.0, 32.0], atol=1e-4
        )

    def test_without_heatmaps_scores_tile_center(self):
        stride, cl, sz, off, km, *_ = self._snap_setup()
        _, scores, _, ks = decode_poses(cl, sz, off, km, k=4, stride=stride)
        np.testing.assert_allclose(
            np.asarray(ks), np.tile(np.asarray(scores)[..., None], (1, 1, 2))
        )

    def test_loss_terms_masked_correctly(self):
        boxes = jnp.asarray([[_xywh(33.0, 21.0, 16.0, 24.0)]])
        kpts = jnp.asarray(
            [[[[30.0, 18.0, 2.0], [40.0, 26.0, 2.0], [5.0, 5.0, 0.0]]]]
        )
        t = encode_boxes(
            boxes, jnp.ones((1, 1)), (16, 16), stride=4,
            keypoints=kpts, kpt_heatmaps=True,
        )
        H = W = 16
        heat = np.asarray(t["heat"])
        logits = np.log(np.clip(heat, 1e-4, 1 - 1e-4)) - np.log1p(
            -np.clip(heat, 1e-4, 1 - 1e-4)
        )
        kh = np.asarray(t["kpt_heat"])
        klog = np.log(np.clip(kh, 1e-4, 1 - 1e-4)) - np.log1p(
            -np.clip(kh, 1e-4, 1 - 1e-4)
        )
        koff = np.zeros((1, H, W, 2), np.float32)
        for j in range(2):
            i = int(t["kpt_ind"][0, 0, j])
            koff[0, i // W, i % W] = np.asarray(t["kpt_off"][0, 0, j])
        kmap = np.zeros((1, H, W, 6), np.float32)
        i = int(t["ind"][0, 0])
        kmap[0, i // W, i % W] = np.asarray(t["kpts"][0, 0]).reshape(-1)
        pred = dict(
            center=jnp.asarray(logits[..., None]),
            size=jnp.zeros((1, H, W, 2)),
            offset=jnp.zeros((1, H, W, 2)),
            kpts=jnp.asarray(kmap),
            kpt_heat=jnp.asarray(klog),
            kpt_offset=jnp.asarray(koff),
        )
        total, terms = detection_loss(pred, t)
        assert {"kpt_heat", "kpt_offset"} <= set(terms)
        assert float(terms["kpt_offset"]) == pytest.approx(0.0, abs=1e-6)
        base = float(terms["kpt_offset"])
        # perturbing a cell no labeled joint occupies leaves the gathered
        # offset loss untouched (only kpt_ind cells are supervised)
        koff3 = koff.copy()
        koff3[0, 15, 15] += 0.5
        _, t3 = detection_loss(dict(pred, kpt_offset=jnp.asarray(koff3)), t)
        assert float(t3["kpt_offset"]) == pytest.approx(base, abs=1e-6)
        # perturbing a LABELED joint's cell registers
        koff4 = koff.copy()
        i1 = int(t["kpt_ind"][0, 0, 0])
        koff4[0, i1 // W, i1 % W] += 0.5
        _, t4 = detection_loss(dict(pred, kpt_offset=jnp.asarray(koff4)), t)
        assert float(t4["kpt_offset"]) > 0.1
        # gradients finite through every new term
        def loss_of(kl, ko):
            p = dict(pred, kpt_heat=kl, kpt_offset=ko)
            tt, _ = detection_loss(p, t)
            return tt

        g1, g2 = jax.grad(loss_of, argnums=(0, 1))(
            jnp.asarray(klog), jnp.asarray(koff)
        )
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()

    def test_refined_learning_smoke(self):
        """The refined family overfits the same synthetic batch and emits
        meaningful per-joint confidences."""
        from probpose_pytorch_tpu.detect.train import DetectorTrainer

        rng = np.random.default_rng(3)
        B, hw, Kj = 2, (96, 96), 4
        joint_off = np.asarray(
            [[-8.0, -8.0], [8.0, -8.0], [-8.0, 8.0], [8.0, 8.0]]
        )
        frames, boxes, masks, kpts = [], [], [], []
        centers0 = None
        for b in range(B):
            cx, cy = float(rng.uniform(30, 66)), float(rng.uniform(30, 66))
            if centers0 is None:
                centers0 = (cx, cy)
            H, W = hw
            frame = rng.uniform(0, 30, (H, W, 3)).astype(np.float32)
            ys, xs = np.mgrid[0:H, 0:W]
            g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 6.0**2))
            frame += g[..., None] * np.asarray([200.0, 160.0, 40.0])
            frames.append(np.clip(frame, 0, 255).astype(np.uint8))
            bs = np.zeros((2, 4), np.float32)
            ms = np.zeros((2,), np.float32)
            kp = np.zeros((2, Kj, 3), np.float32)
            bs[0] = _xywh(cx, cy, 24.0, 24.0)
            ms[0] = 1.0
            kp[0, :, 0] = cx + joint_off[:, 0]
            kp[0, :, 1] = cy + joint_off[:, 1]
            kp[0, :, 2] = 2.0
            boxes.append(bs)
            masks.append(ms)
            kpts.append(kp)
        batch = dict(
            frame=np.stack(frames),
            boxes=np.stack(boxes),
            box_mask=np.stack(masks),
            ignore_boxes=np.zeros((B, 2, 4), np.float32),
            ignore_mask=np.zeros((B, 2), np.float32),
            keypoints=np.stack(kpts),
        )
        trainer = DetectorTrainer.create(
            img_size=hw, preset="conv-t", lr=2e-3, total_steps=80,
            num_keypoints=Kj, kpt_heatmaps=True,
        )
        assert trainer.model.kpt_heatmaps
        first = None
        for _ in range(80):
            terms = trainer.train_step(batch)
            if first is None:
                first = float(terms["total"])
        assert {"kpt_heat", "kpt_offset"} <= set(terms)
        assert float(terms["total"]) < first / 2

        pred = BottomUpPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.25,
        )
        out = pred.predict_frame(batch["frame"][0])
        assert len(out["keypoints"]) >= 1
        assert out["keypoint_scores"].shape == (len(out["keypoints"]), Kj)
        want = np.asarray(centers0)[None] + joint_off  # (Kj, 2)
        d = np.linalg.norm(
            out["keypoints"] - want[None], axis=-1
        ).max(axis=-1).min()
        assert d < 8.0, d


class TestOraclePlumbing:
    def test_evaluate_bottomup_oracle_ap1(self, tmp_path):
        from probpose_pytorch_tpu.data.coco import parse_coco_annotations
        from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth

        root = generate_coco_synth(
            tmp_path / "coco",
            n_train_images=2,
            n_val_images=4,
            frame_hw=(96, 96),
            p_crowd=0.4,
            p_unlabeled=0.3,
            seed=1,
        )
        ann = root / "annotations/person_keypoints_val2017.json"

        recs, igs = parse_coco_annotations(
            ann, root / "val2017", include_ignore=True
        )
        pos: dict[int, list] = {}
        visited = set()
        for r in recs:
            pos.setdefault(int(r["image_id"]), []).append(r)
            visited.add(int(r["image_id"]))
        visited.update(int(r["image_id"]) for r in igs)
        queue = [pos.get(i, []) for i in sorted(visited)]

        class OracleBottomUp:
            def __init__(self):
                self.i = 0

            def predict_frame(self, frame, thr=None):
                rs = queue[self.i]
                self.i += 1
                if not rs:
                    Kj = 17
                    return dict(
                        keypoints=np.zeros((0, Kj, 2), np.float32),
                        scores=np.zeros((0,), np.float32),
                        boxes=np.zeros((0, 4), np.float32),
                    )
                return dict(
                    keypoints=np.stack(
                        [r["keypoints"][:, :2] for r in rs]
                    ).astype(np.float32),
                    scores=np.ones(len(rs), np.float32),
                    boxes=np.stack([r["bbox"] for r in rs]).astype(
                        np.float32
                    ),
                )

        summary = evaluate_bottomup(
            OracleBottomUp(), ann, root / "val2017"
        )
        assert summary["AP"] == pytest.approx(1.0)
        assert summary["AR"] == pytest.approx(1.0)
        assert summary["det_ap50"] == pytest.approx(1.0)


def test_bottomup_cli_train_and_eval(tmp_path, capsys):
    """detect.train --keypoints K then eval.run --bottomup: the full CLI
    path (train -> checkpoint -> load_bottomup -> AP JSON line)."""
    from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
    from probpose_pytorch_tpu.detect.train import main as detect_main
    from probpose_pytorch_tpu.eval.run import main as eval_main

    root = generate_coco_synth(
        tmp_path / "coco",
        n_train_images=4,
        n_val_images=2,
        frame_hw=(96, 96),
        seed=2,
    )
    out = tmp_path / "bu_run"
    detect_main([
        "--data-root", str(root),
        "--out", str(out),
        "--steps", "2",
        "--batch-size", "2",
        "--img-size", "96",
        "--keypoints", "17",
        "--num-workers", "1",
    ])
    assert json.loads((out / "detector.json").read_text())[
        "num_keypoints"
    ] == 17
    capsys.readouterr()
    eval_main([
        "--bottomup", str(out),
        "--annotations",
        str(root / "annotations/person_keypoints_val2017.json"),
        "--images", str(root / "val2017"),
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rec) >= {"AP", "AR", "det_ap50"}
    assert -1.0 <= rec["AP"] <= 1.0


class TestMeshServing:
    def test_bottomup_mesh_matches_single_device(self):
        """Data-parallel bottom-up serving == single-device, including the
        joint-heatmap snap decode (kpt_heatmaps model) and a ragged batch
        that pads up to the data axis."""
        from probpose_pytorch_tpu.detect.model import PersonDetector
        from probpose_pytorch_tpu.parallel import make_mesh

        model = PersonDetector(
            img_size=(64, 64), preset="conv-t", num_keypoints=4,
            kpt_heatmaps=True,
        )
        vars_ = model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)), train=False
        )
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, (6, 80, 96, 3), dtype=np.uint8)
        single = BottomUpPredictor(
            model=model, variables=vars_, max_detections=4
        )
        meshed = BottomUpPredictor(
            model=model, variables=vars_, max_detections=4,
            mesh=make_mesh(8),
        )
        b0, s0, p0, k0 = single(frames)
        b1, s1, p1, k1 = meshed(frames)
        assert p1.shape == (6, 4, 4, 2) and k1.shape == (6, 4, 4)
        np.testing.assert_allclose(s1, s0, atol=1e-5)
        # Box/pose pixels tolerate f32 reassociation between the mesh and
        # single-device compiles (observed <=0.005 px); still sub-pixel.
        np.testing.assert_allclose(b1, b0, atol=2e-2)
        np.testing.assert_allclose(p1, p0, atol=2e-2)
        np.testing.assert_allclose(k1, k0, atol=1e-5)
