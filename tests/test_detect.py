"""Person detector (detect/): codec roundtrip, loss semantics, model shapes,
detection PR metric, learning smoke, and the standalone frame->boxes->pose
pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.detect import (
    DetectorPredictor,
    FrameDetectionDataset,
    PersonDetector,
    decode_boxes,
    detection_loss,
    detection_pr,
    encode_boxes,
    evaluate_detector_topdown,
    gaussian_radius,
)


def _xywh(cx, cy, w, h):
    return [cx - w / 2, cy - h / 2, w, h]


class TestCodec:
    def test_gaussian_radius_monotone_positive(self):
        r_small = float(gaussian_radius(jnp.asarray(8.0), jnp.asarray(8.0)))
        r_big = float(gaussian_radius(jnp.asarray(40.0), jnp.asarray(40.0)))
        assert 0 < r_small < r_big

    def test_gaussian_radius_iou_guarantee(self):
        # A box whose corners shift by the radius still overlaps the
        # original at IoU >= min_iou (the radius derivation's contract).
        from probpose_pytorch_tpu.detect.pipeline import box_iou_matrix

        h, w = 24.0, 16.0
        r = float(gaussian_radius(jnp.asarray(h), jnp.asarray(w), 0.7))
        gt = np.asarray([_xywh(50, 50, w, h)])
        shifted = np.asarray([_xywh(50 + r, 50 + r, w, h)])
        assert box_iou_matrix(shifted, gt)[0, 0] >= 0.7 - 0.02

    def test_encode_targets(self):
        boxes = jnp.asarray(
            [[_xywh(33.0, 21.0, 16.0, 24.0), _xywh(10.0, 10.0, 8.0, 8.0)]]
        )  # (1, 2, 4)
        mask = jnp.ones((1, 2))
        t = jax.jit(
            lambda b, m: encode_boxes(b, m, (16, 16), stride=4)
        )(boxes, mask)
        # centers: (33, 21)/4 = (8.25, 5.25) -> cell (8, 5); (10, 10)/4 ->
        # cell (2, 2)
        assert t["heat"].shape == (1, 16, 16)
        assert float(t["heat"][0, 5, 8]) == 1.0
        assert float(t["heat"][0, 2, 2]) == 1.0
        np.testing.assert_array_equal(
            np.asarray(t["ind"][0]), [5 * 16 + 8, 2 * 16 + 2]
        )
        np.testing.assert_allclose(
            np.asarray(t["size"][0]), [[4.0, 6.0], [2.0, 2.0]], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(t["offset"][0]), [[0.25, 0.25], [0.5, 0.5]],
            atol=1e-6,
        )
        assert t["mask"].all()

    def test_encode_masks_invalid(self):
        boxes = jnp.asarray(
            [[_xywh(200.0, 8.0, 8.0, 8.0),  # center beyond the grid
              _xywh(8.0, 8.0, 8.0, 8.0)]]
        )
        mask = jnp.asarray([[1.0, 0.0]])  # second is padding
        t = encode_boxes(boxes, mask, (16, 16), stride=4)
        assert not bool(t["mask"].any())
        assert float(t["heat"].max()) == 0.0

    def test_encode_ignore_regions(self):
        boxes = jnp.zeros((1, 1, 4))
        t = encode_boxes(
            boxes,
            jnp.zeros((1, 1)),
            (16, 16),
            stride=4,
            ignore_boxes=jnp.asarray([[[16.0, 16.0, 16.0, 16.0]]]),
            ignore_mask=jnp.ones((1, 1)),
        )
        # ignore box spans cells [4, 8) in both axes
        assert float(t["neg_weight"][0, 5, 5]) == 0.0
        assert float(t["neg_weight"][0, 2, 2]) == 1.0
        assert float(t["neg_weight"][0, 12, 12]) == 1.0

    def test_decode_roundtrip(self):
        H = W = 32
        stride = 4
        rng = np.random.default_rng(0)
        gt = np.stack(
            [
                _xywh(30.0, 40.0, 24.0, 48.0),
                _xywh(90.0, 70.0, 36.0, 60.0),
                _xywh(64.0, 100.0, 20.0, 30.0),
            ]
        )[None]
        t = encode_boxes(jnp.asarray(gt), jnp.ones((1, 3)), (H, W), stride)
        # Dense maps from the sparse targets (numpy scatter — host-side test
        # construction only; the framework never scatters).
        heat = np.asarray(t["heat"])
        logits = np.log(np.clip(heat, 1e-6, 1 - 1e-6)) - np.log1p(
            -np.clip(heat, 1e-6, 1 - 1e-6)
        )
        size = rng.normal(0, 0.1, (1, H, W, 2)).astype(np.float32)
        off = np.zeros((1, H, W, 2), np.float32)
        for m in range(3):
            i = int(t["ind"][0, m])
            size[0, i // W, i % W] = np.asarray(t["size"][0, m])
            off[0, i // W, i % W] = np.asarray(t["offset"][0, m])
        boxes, scores = jax.jit(
            lambda c, s, o: decode_boxes(c, s, o, k=8, stride=stride)
        )(
            jnp.asarray(logits[..., None]),
            jnp.asarray(size),
            jnp.asarray(off),
        )
        boxes, scores = np.asarray(boxes[0]), np.asarray(scores[0])
        # top 3 peaks recover the encoded boxes exactly (offset undoes the
        # integer-cell quantization)
        assert (scores[:3] > 0.9).all() and (scores[3:] < 0.5).all()
        got = boxes[:3][np.argsort(boxes[:3, 0])]
        want = gt[0][np.argsort(gt[0, :, 0])]
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestLoss:
    def _perfect_pred(self, t, H, W):
        heat = np.asarray(t["heat"])
        logits = np.where(heat >= 1.0 - 1e-6, 12.0, -12.0).astype(
            np.float32
        )
        size = np.zeros((1, H, W, 2), np.float32)
        off = np.zeros((1, H, W, 2), np.float32)
        for m in range(t["ind"].shape[1]):
            if not bool(t["mask"][0, m]):
                continue
            i = int(t["ind"][0, m])
            size[0, i // W, i % W] = np.asarray(t["size"][0, m])
            off[0, i // W, i % W] = np.asarray(t["offset"][0, m])
        return dict(
            center=jnp.asarray(logits[..., None]),
            size=jnp.asarray(size),
            offset=jnp.asarray(off),
        )

    def test_perfect_prediction_near_zero(self):
        H = W = 16
        gt = np.stack([_xywh(20.0, 24.0, 16.0, 20.0)])[None]
        t = encode_boxes(jnp.asarray(gt), jnp.ones((1, 1)), (H, W), 4)
        pred = self._perfect_pred(t, H, W)
        total, terms = detection_loss(pred, t)
        assert float(terms["size"]) == 0.0
        assert float(terms["offset"]) == 0.0
        assert float(total) < 0.05
        # a wrong prediction costs much more
        bad = dict(pred, center=-pred["center"])
        bad_total, _ = detection_loss(bad, t)
        assert float(bad_total) > float(total) + 1.0

    def test_ignore_region_suppresses_negatives(self):
        H = W = 16
        boxes = jnp.asarray([[_xywh(20.0, 24.0, 16.0, 20.0)]])
        ig = jnp.asarray([[[40.0, 40.0, 20.0, 20.0]]])
        t = encode_boxes(boxes, jnp.ones((1, 1)), (H, W), 4)
        t_ig = encode_boxes(
            boxes, jnp.ones((1, 1)), (H, W), 4,
            ignore_boxes=ig, ignore_mask=jnp.ones((1, 1)),
        )
        # confident false positive INSIDE the ignore region
        logits = np.full((1, H, W, 1), -12.0, np.float32)
        hy, hx = int(t["ind"][0, 0]) // W, int(t["ind"][0, 0]) % W
        logits[0, hy, hx, 0] = 12.0
        logits[0, 12, 12, 0] = 12.0  # inside ignore box (cells 10..15)
        pred = dict(
            center=jnp.asarray(logits),
            size=jnp.zeros((1, H, W, 2)),
            offset=jnp.zeros((1, H, W, 2)),
        )
        loss_plain = float(detection_loss(pred, t)[1]["center"])
        loss_ignored = float(detection_loss(pred, t_ig)[1]["center"])
        assert loss_ignored < loss_plain - 1.0

    def test_gradients_finite(self):
        H = W = 16
        gt = np.stack([_xywh(20.0, 24.0, 16.0, 20.0)])[None]
        t = encode_boxes(jnp.asarray(gt), jnp.ones((1, 1)), (H, W), 4)

        def f(logits):
            pred = dict(
                center=logits,
                size=jnp.zeros((1, H, W, 2)),
                offset=jnp.zeros((1, H, W, 2)),
            )
            return detection_loss(pred, t)[0]

        g = jax.grad(f)(jnp.zeros((1, H, W, 1)))
        assert bool(jnp.isfinite(g).all())


class TestModel:
    def test_shapes(self):
        model = PersonDetector(img_size=(128, 96), preset="conv-t")
        vars_ = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 128, 96, 3)), train=False
        )
        out = model.apply(vars_, jnp.zeros((2, 128, 96, 3)), train=False)
        assert out["center"].shape == (2, 32, 24, 1)
        assert out["size"].shape == (2, 32, 24, 2)
        assert out["offset"].shape == (2, 32, 24, 2)
        assert model.feat_hw == (32, 24)
        # focal prior: initial sigmoid(center) ~ 0.01
        p = jax.nn.sigmoid(out["center"])
        assert float(p.mean()) < 0.05


class TestDetectionPR:
    def test_perfect(self):
        im = dict(
            dt_boxes=np.asarray([_xywh(10, 10, 8, 8), _xywh(30, 30, 8, 8)]),
            dt_scores=np.asarray([0.9, 0.8]),
            gt_boxes=np.asarray([_xywh(10, 10, 8, 8), _xywh(30, 30, 8, 8)]),
        )
        r = detection_pr([im])
        assert r["ap"] == 1.0 and r["recall"] == 1.0

    def test_false_positive_lowers_ap(self):
        im = dict(
            dt_boxes=np.asarray(
                [_xywh(10, 10, 8, 8), _xywh(60, 60, 8, 8)]
            ),
            dt_scores=np.asarray([0.8, 0.9]),  # FP ranked FIRST
            gt_boxes=np.asarray([_xywh(10, 10, 8, 8)]),
        )
        r = detection_pr([im])
        assert r["recall"] == 1.0 and r["ap"] < 1.0

    def test_ignore_absorbs(self):
        im = dict(
            dt_boxes=np.asarray(
                [_xywh(10, 10, 8, 8), _xywh(60, 60, 8, 8)]
            ),
            dt_scores=np.asarray([0.8, 0.9]),
            gt_boxes=np.asarray([_xywh(10, 10, 8, 8)]),
            ignore_boxes=np.asarray([[50.0, 50.0, 30.0, 30.0]]),
        )
        r = detection_pr([im])
        # the would-be FP sits inside the ignore region -> not counted
        assert r["ap"] == 1.0 and r["recall"] == 1.0


def _blob_frame(rng, centers, hw=(96, 96), blob=6.0):
    """Bright gaussian blobs on dark noise — a learnable 'person'."""
    H, W = hw
    frame = rng.uniform(0, 30, (H, W, 3)).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for cx, cy in centers:
        g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * blob**2))
        frame += g[..., None] * np.asarray([200.0, 160.0, 40.0])
    return np.clip(frame, 0, 255).astype(np.uint8)


class TestLearning:
    def test_detector_overfits_one_batch(self):
        from probpose_pytorch_tpu.detect.train import DetectorTrainer

        rng = np.random.default_rng(0)
        B, hw = 4, (96, 96)
        frames, boxes, masks = [], [], []
        all_centers = []
        for _ in range(B):
            n = int(rng.integers(1, 3))
            centers = [
                (float(rng.uniform(20, 76)), float(rng.uniform(20, 76)))
                for _ in range(n)
            ]
            all_centers.append(centers)
            frames.append(_blob_frame(rng, centers, hw))
            bs = np.zeros((4, 4), np.float32)
            ms = np.zeros((4,), np.float32)
            for i, (cx, cy) in enumerate(centers):
                bs[i] = _xywh(cx, cy, 24.0, 24.0)
                ms[i] = 1.0
            boxes.append(bs)
            masks.append(ms)
        batch = dict(
            frame=np.stack(frames),
            boxes=np.stack(boxes),
            box_mask=np.stack(masks),
            ignore_boxes=np.zeros((B, 2, 4), np.float32),
            ignore_mask=np.zeros((B, 2), np.float32),
        )
        trainer = DetectorTrainer.create(
            img_size=hw, preset="conv-t", lr=2e-3, total_steps=60
        )
        first = None
        for _ in range(60):
            terms = trainer.train_step(batch)
            if first is None:
                first = float(terms["total"])
        last = float(terms["total"])
        assert last < first / 2, (first, last)

        pred = DetectorPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.25,
        )
        det_boxes, det_scores = pred.detect_frame(batch["frame"][0])
        assert len(det_boxes) >= 1
        got_centers = det_boxes[:, :2] + det_boxes[:, 2:] / 2
        want = np.asarray(all_centers[0])
        # every true blob has a detection within ~1.5 cells
        d = np.linalg.norm(
            got_centers[None] - want[:, None], axis=-1
        ).min(axis=1)
        assert (d < 8.0).all(), d


class TestEndToEnd:
    def test_frame_dataset_and_detector_eval(self, tmp_path):
        from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        root = generate_coco_synth(
            tmp_path / "coco",
            n_train_images=4,
            n_val_images=3,
            frame_hw=(96, 96),
            p_crowd=0.5,
            p_unlabeled=0.3,
            seed=0,
        )
        ds = FrameDetectionDataset(
            root / "annotations/person_keypoints_train2017.json",
            root / "train2017",
            max_boxes=6,
            max_ignore=4,
        )
        assert len(ds) >= 3
        item = ds[0]
        assert item["frame"].shape == (96, 96, 3)
        assert item["boxes"].shape == (6, 4)
        assert item["box_mask"].sum() >= 1

        # Tiny pose predictor (untrained: plumbing-level checks only).
        from probpose_pytorch_tpu.models.model import ModelConfig

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17, backbone="vit-nano",
                compute_dtype="float32", deconv_out_channels=(8, 8),
                deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        from probpose_pytorch_tpu.inference import TopDownPredictor

        pose = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )

        # GT-fed oracle 'detector' (duck-typed): detection metrics must be
        # perfect, proving the eval plumbing end to end.
        ann = root / "annotations/person_keypoints_val2017.json"

        class OracleDetector:
            """Replays GT boxes in evaluate_detector_topdown's iteration
            order: image-id ascending over images with any (positive OR
            ignore) annotation."""

            def __init__(self):
                import json as _json

                from probpose_pytorch_tpu.data.coco import (
                    parse_coco_annotations,
                )

                recs, igs = parse_coco_annotations(
                    ann, root / "val2017", include_ignore=True
                )
                pos = {}
                visited = set()
                for r in recs:
                    pos.setdefault(int(r["image_id"]), []).append(r["bbox"])
                    visited.add(int(r["image_id"]))
                visited.update(int(r["image_id"]) for r in igs)
                self.queue = [
                    pos.get(i, []) for i in sorted(visited)
                ]
                self.i = 0

            def detect_frame(self, frame, thr=None):
                boxes = self.queue[self.i]
                self.i += 1
                if not boxes:
                    return (
                        np.zeros((0, 4), np.float32),
                        np.zeros((0,), np.float32),
                    )
                return (
                    np.stack(boxes).astype(np.float32),
                    np.ones(len(boxes), np.float32),
                )

        summary = evaluate_detector_topdown(
            pose, OracleDetector(), ann, root / "val2017",
        )
        assert summary["det_ap50"] == 1.0
        assert summary["det_recall50"] == 1.0
        assert "AP" in summary and 0.0 <= summary["AP"] <= 1.0

    def test_eval_cli_detector_flag(self, tmp_path, capsys):
        """eval.run --detector: end-to-end AP with the framework's own
        detections, via the CLI (checkpointed pose model + checkpointed
        detector)."""
        import json

        from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.eval.run import main as eval_main
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        root = generate_coco_synth(
            tmp_path / "coco", n_train_images=2, n_val_images=2,
            frame_hw=(96, 96), seed=0,
        )
        ViTConfig.PRESETS.setdefault(
            "vit-tiny-eval",
            dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17,
                backbone="vit-tiny-eval", compute_dtype="float32",
                deconv_out_channels=(8, 8), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
            out_dir=str(tmp_path / "pose"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        pose_out = tmp_path / "pose"
        pose_out.mkdir(exist_ok=True)
        cfg.save(pose_out / "config.json")
        ckpt = CheckpointManager(pose_out / "checkpoints", keep=1)
        ckpt.save(0, trainer.state, force=True)
        ckpt.close()

        det_out = tmp_path / "det"
        det_out.mkdir()
        dt = DetectorTrainer.create(img_size=(64, 64), total_steps=1)
        (det_out / "detector.json").write_text(
            json.dumps(dict(img_size=[64, 64], preset="conv-t"))
        )
        dckpt = CheckpointManager(det_out / "checkpoints", keep=1)
        dckpt.save(0, dt.state, force=True)
        dckpt.close()

        eval_main([
            "--checkpoint", str(pose_out / "checkpoints"),
            "--config", str(pose_out / "config.json"),
            "--annotations",
            str(root / "annotations/person_keypoints_val2017.json"),
            "--images", str(root / "val2017"),
            "--detector", str(det_out),
        ])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert {"AP", "det_ap50", "det_recall50"} <= set(rec)

    def test_predict_frame_standalone_mode(self):
        """TopDownPredictor(detector=...).predict_frame(frame) — boxes come
        from the detector; the output carries the expanded boxes used."""
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        ViTConfig.PRESETS.setdefault(
            "vit-tiny-eval",
            dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17,
                backbone="vit-tiny-eval", compute_dtype="float32",
                deconv_out_channels=(8, 8), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)

        class FakeDetector:
            def detect_frame(self, frame, thr=None):
                if thr is not None and thr > 1.0:
                    return (np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.float32))
                return (
                    np.array([[8.0, 8.0, 24.0, 24.0]], np.float32),
                    np.array([0.9], np.float32),
                )

        pose = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
            detector=FakeDetector(),
        )
        frame = np.zeros((96, 96, 3), np.uint8)
        out = pose.predict_frame(frame)
        assert out["boxes"].shape == (1, 4)
        assert len(out["keypoints"]) == 1
        H, W = cfg.model.img_size
        assert abs(out["boxes"][0, 2] / out["boxes"][0, 3] - W / H) < 1e-5
        # empty detection
        out2 = pose.predict_frame(frame, detector_threshold=2.0)
        assert out2["boxes"].shape == (0, 4)
        # no detector configured -> clear error
        pose.detector = None
        import pytest

        with pytest.raises(ValueError, match="detector"):
            pose.predict_frame(frame)

    def test_detector_predictor_jit_buckets(self):
        model = PersonDetector(img_size=(64, 64), preset="conv-t")
        vars_ = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
        pred = DetectorPredictor(
            model=model, variables=vars_, max_detections=8
        )
        frame = np.zeros((96, 80, 3), np.uint8)
        boxes, scores = pred(frame[None])
        assert boxes.shape == (1, 8, 4) and scores.shape == (1, 8)
        b2, s2 = pred.detect_frame(frame, score_threshold=2.0)
        assert len(b2) == 0  # nothing above an impossible threshold


class TestMeshServing:
    """Data-parallel detector serving: frames shard over the mesh's data
    axis (detect/pipeline._device_frames pads ragged batches), params
    replicate via GSPMD — outputs must match single-device exactly."""

    def test_detector_mesh_matches_single_device(self):
        from probpose_pytorch_tpu.parallel import make_mesh

        model = PersonDetector(img_size=(64, 64), preset="conv-t")
        vars_ = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (8, 96, 80, 3), dtype=np.uint8)
        single = DetectorPredictor(
            model=model, variables=vars_, max_detections=8
        )
        meshed = DetectorPredictor(
            model=model, variables=vars_, max_detections=8,
            mesh=make_mesh(8),
        )
        b0, s0 = single(frames)
        b1, s1 = meshed(frames)
        np.testing.assert_allclose(s1, s0, atol=1e-5)
        # Box pixels tolerate f32 reassociation between the mesh and
        # single-device compiles (observed <=0.007 px); still sub-pixel.
        np.testing.assert_allclose(b1, b0, atol=2e-2)

    def test_detector_mesh_pads_ragged_batch(self):
        from probpose_pytorch_tpu.parallel import make_mesh

        model = PersonDetector(img_size=(64, 64), preset="conv-t")
        vars_ = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False
        )
        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
        single = DetectorPredictor(
            model=model, variables=vars_, max_detections=4
        )
        meshed = DetectorPredictor(
            model=model, variables=vars_, max_detections=4,
            mesh=make_mesh(8),
        )
        b0, s0 = single(frames)
        b1, s1 = meshed(frames)
        assert b1.shape == (5, 4, 4) and s1.shape == (5, 4)
        np.testing.assert_allclose(s1, s0, atol=1e-5)
        # Box pixels tolerate f32 reassociation between the mesh and
        # single-device compiles (observed <=0.007 px); still sub-pixel.
        np.testing.assert_allclose(b1, b0, atol=2e-2)

    def test_load_detector_mesh_kwarg(self, tmp_path):
        import json as _json

        from probpose_pytorch_tpu.detect.train import (
            DetectorTrainer,
            load_detector,
        )
        from probpose_pytorch_tpu.parallel import make_mesh
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=10
        )
        (tmp_path / "detector.json").write_text(
            _json.dumps(dict(img_size=[64, 64], preset="conv-t"))
        )
        CheckpointManager(tmp_path / "checkpoints").save(1, trainer.state)
        pred = load_detector(tmp_path / "checkpoints", mesh=make_mesh(8))
        assert pred.mesh is not None
        frame = np.zeros((64, 64, 3), np.uint8)
        boxes, scores = pred.detect_frame(frame, score_threshold=2.0)
        assert len(boxes) == 0


class TestFusedTwoStage:
    """detect/fused.py: detector -> crops -> pose in ONE jitted program."""

    def _models(self):
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        det_model = PersonDetector(img_size=(64, 64), preset="conv-t")
        det_vars = det_model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False
        )
        detector = DetectorPredictor(
            model=det_model, variables=det_vars, max_detections=8
        )
        ViTConfig.PRESETS.setdefault(
            "vit-tiny-eval",
            dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17,
                backbone="vit-tiny-eval", compute_dtype="float32",
                deconv_out_channels=(8, 8), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        pose = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )
        return detector, pose

    def test_expand_boxes_matches_host_expansion(self):
        from probpose_pytorch_tpu.detect import expand_boxes_jax
        from probpose_pytorch_tpu.detect.pipeline import expand_detections

        rng = np.random.default_rng(0)
        boxes = np.concatenate(
            [
                rng.uniform(0, 100, (6, 2)),
                rng.uniform(0.5, 60, (6, 2)),  # includes sub-1px degenerates
            ],
            axis=1,
        ).astype(np.float32)
        boxes[0, 2:] = 0.0  # fully degenerate detection
        want = expand_detections(boxes, (64, 48), 1.25)
        got = np.asarray(expand_boxes_jax(jnp.asarray(boxes), (64, 48), 1.25))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_fused_matches_two_program_path(self):
        """The fused program's poses == detector() then pose() as two
        separate dispatches over the same expanded boxes."""
        from probpose_pytorch_tpu.detect import FusedTwoStagePredictor
        from probpose_pytorch_tpu.detect.pipeline import expand_detections

        detector, pose = self._models()
        fused = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=4
        )
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (2, 80, 96, 3), dtype=np.uint8)
        out = fused(frames)
        assert out["keypoints"].shape == (2, 4, 17, 2)
        assert out["det_scores"].shape == (2, 4)
        assert out["boxes"].shape == (2, 4, 4)

        det_boxes, det_scores = detector(frames)
        np.testing.assert_allclose(
            out["det_scores"], det_scores[:, :4], atol=1e-5
        )
        for i in range(2):
            crop_boxes = expand_detections(
                det_boxes[i, :4], pose.input_size, 1.25
            )
            np.testing.assert_allclose(
                out["boxes"][i], crop_boxes, atol=2e-2
            )
            two = pose(np.tile(frames[i], (4, 1, 1, 1)), crop_boxes)
            np.testing.assert_allclose(
                out["keypoints"][i], two["keypoints"], atol=5e-2
            )
            np.testing.assert_allclose(
                out["scores"][i], two["scores"], atol=1e-3
            )
            np.testing.assert_allclose(
                out["probabilities"][i], two["probabilities"], atol=1e-3
            )

    def test_fused_predict_frame_thresholds(self):
        from probpose_pytorch_tpu.detect import FusedTwoStagePredictor

        detector, pose = self._models()
        fused = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=3
        )
        frame = np.zeros((72, 72, 3), np.uint8)
        all_out = fused.predict_frame(frame, score_threshold=-1.0)
        assert all_out["keypoints"].shape == (3, 17, 2)
        assert all_out["det_scores"].shape == (3,)
        none_out = fused.predict_frame(frame, score_threshold=2.0)
        assert none_out["keypoints"].shape == (0, 17, 2)
        assert none_out["boxes"].shape == (0, 4)

    def test_fused_validation(self):
        import dataclasses

        import pytest

        from probpose_pytorch_tpu.detect import FusedTwoStagePredictor

        detector, pose = self._models()
        with pytest.raises(ValueError, match="max_detections"):
            FusedTwoStagePredictor(
                detector=detector, pose=pose, max_people=99
            )
        with pytest.raises(ValueError, match="return_heatmaps"):
            FusedTwoStagePredictor(
                detector=detector,
                pose=dataclasses.replace(pose, return_heatmaps=True),
                max_people=2,
            )
