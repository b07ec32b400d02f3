"""Video pipeline: frame IO, OKS track association, sequence run, CLI.

The reference has no video surface (SURVEY.md §2.4); this covers the
superset sequence tool in probpose_pytorch_tpu/video.py.
"""

import json

import numpy as np
import pytest

from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.video import (
    OksTracker,
    iter_frames,
    load_boxes,
    run_video,
)

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


class TestFrameIO:
    def test_npy_stack(self, tmp_path):
        rng = np.random.default_rng(0)
        stack = rng.integers(0, 256, (3, 32, 40, 3), dtype=np.uint8)
        np.save(tmp_path / "v.npy", stack)
        frames = list(iter_frames(tmp_path / "v.npy"))
        assert len(frames) == 3
        np.testing.assert_array_equal(frames[1], stack[1])

    def test_directory_sorted(self, tmp_path):
        import PIL.Image

        rng = np.random.default_rng(1)
        stack = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
        # write out of order; iteration must sort by name
        for i in (2, 0, 1):
            PIL.Image.fromarray(stack[i]).save(tmp_path / f"f_{i:03d}.png")
        frames = list(iter_frames(tmp_path))
        for i in range(3):
            np.testing.assert_array_equal(frames[i], stack[i])

    def test_bad_inputs(self, tmp_path):
        (tmp_path / "empty").mkdir()
        with pytest.raises(ValueError, match="no image"):
            list(iter_frames(tmp_path / "empty"))
        np.save(tmp_path / "bad.npy", np.zeros((4, 8, 8)))
        with pytest.raises(ValueError, match="T, H, W, 3"):
            list(iter_frames(tmp_path / "bad.npy"))

    def test_load_boxes(self, tmp_path):
        p = tmp_path / "b.json"
        p.write_text(json.dumps([[[0, 0, 10, 10], [5, 5, 4, 4]], []]))
        boxes = load_boxes(p)
        assert len(boxes) == 2
        assert boxes[0].shape == (2, 4)
        assert boxes[1].shape == (0, 4)


def _pose(cx, cy, k=5, spread=20.0, seed=0):
    rng = np.random.default_rng(seed)
    return np.array([cx, cy], np.float32) + rng.uniform(
        -spread, spread, (k, 2)
    ).astype(np.float32)


class TestOksTracker:
    def test_stable_ids_under_motion(self):
        sig = np.full((5,), 0.05, np.float32)
        tr = OksTracker(threshold=0.3, sigmas=sig)
        a, b = _pose(100, 100, seed=1), _pose(300, 100, seed=2)
        area = np.array([1600.0, 1600.0], np.float32)
        ids0 = tr.update(np.stack([a, b]), area)
        assert sorted(ids0.tolist()) == [0, 1]
        # both drift a little; order in the array flips
        ids1 = tr.update(np.stack([b + 2.0, a + 2.0]), area)
        assert ids1[0] == ids0[1] and ids1[1] == ids0[0]

    def test_new_person_gets_new_id(self):
        sig = np.full((5,), 0.05, np.float32)
        tr = OksTracker(threshold=0.3, sigmas=sig)
        a = _pose(100, 100, seed=3)
        area = np.array([1600.0], np.float32)
        (id_a,) = tr.update(a[None], area)
        c = _pose(400, 300, seed=4)
        ids = tr.update(
            np.stack([a, c]), np.array([1600.0, 1600.0], np.float32)
        )
        assert ids[0] == id_a and ids[1] != id_a

    def test_track_dropped_after_gap(self):
        sig = np.full((5,), 0.05, np.float32)
        tr = OksTracker(threshold=0.3, max_gap=1, sigmas=sig)
        a = _pose(100, 100, seed=5)
        area = np.array([1600.0], np.float32)
        (id0,) = tr.update(a[None], area)
        empty = np.zeros((0, 5, 2), np.float32)
        tr.update(empty, np.zeros((0,), np.float32))
        tr.update(empty, np.zeros((0,), np.float32))
        (id1,) = tr.update(a[None], area)
        assert id1 != id0, "track should have expired after max_gap frames"

    def test_one_to_one_matching(self):
        """Two current poses near one old track: only the better match
        inherits the id; the other opens a new track."""
        sig = np.full((5,), 0.05, np.float32)
        tr = OksTracker(threshold=0.1, sigmas=sig)
        a = _pose(100, 100, seed=6)
        area = np.array([1600.0], np.float32)
        (id0,) = tr.update(a[None], area)
        ids = tr.update(
            np.stack([a + 8.0, a + 1.0]),
            np.array([1600.0, 1600.0], np.float32),
        )
        assert ids[1] == id0 and ids[0] != id0


@pytest.fixture(scope="module")
def tiny_predictor():
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir="/tmp/video-test-run",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    return TopDownPredictor(
        model=trainer.model,
        variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )


class TestRunVideo:
    def test_static_scene_stable_tracks(self, tiny_predictor):
        """Identical frames + identical boxes → identical poses, stable
        track ids, and (eventually) smoothing == raw (static signal)."""
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        boxes = [
            np.array([[0, 0, 32, 32], [30, 30, 32, 32]], np.float32)
        ] * 3
        recs = list(
            run_video(
                tiny_predictor,
                iter([frame] * 3),
                boxes=boxes,
                nms=None,
                track_threshold=0.05,
            )
        )
        assert [r["frame"] for r in recs] == [0, 1, 2]
        ids = [r["track_ids"].tolist() for r in recs]
        assert ids[0] == ids[1] == ids[2]
        np.testing.assert_array_equal(
            recs[0]["keypoints"], recs[2]["keypoints"]
        )
        # static input: the one-euro filter converges to the signal
        np.testing.assert_allclose(
            recs[2]["smoothed"], recs[2]["keypoints"], atol=1.0
        )
        assert recs[0]["boxes"].shape == (2, 4)
        assert recs[0]["pose_scores"].shape == (2,)

    def test_empty_boxes_frame(self, tiny_predictor):
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        boxes = [
            np.array([[0, 0, 32, 32]], np.float32),
            np.zeros((0, 4), np.float32),
            np.array([[0, 0, 32, 32]], np.float32),
        ]
        recs = list(
            run_video(tiny_predictor, iter([frame] * 3), boxes=boxes,
                      nms=None)
        )
        assert len(recs[1]["track_ids"]) == 0
        assert len(recs[0]["track_ids"]) == 1
        assert len(recs[2]["track_ids"]) == 1

    def test_nms_path_maps_boxes(self, tiny_predictor):
        """Duplicate boxes under soft_oks NMS: outputs shrink, and the
        surviving poses' boxes come from the kept input boxes."""
        rng = np.random.default_rng(2)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        boxes = [np.array(
            [[0, 0, 32, 32], [0, 0, 32, 32], [1, 1, 32, 32]], np.float32
        )]
        recs = list(
            run_video(tiny_predictor, iter([frame]), boxes=boxes,
                      nms="oks", nms_threshold=0.9)
        )
        r = recs[0]
        n = len(r["track_ids"])
        assert n < 3, "duplicate boxes should be suppressed"
        assert r["boxes"].shape == (n, 4)
        assert r["keypoints"].shape[0] == n


class TestRunVideoDetector:
    def test_detector_supplies_boxes(self, tiny_predictor):
        """run_video(detector=...) — standalone mode: boxes come from the
        framework's own detector per frame, expanded to the pose crop
        aspect."""
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        calls = []

        class FakeDetector:
            def detect_frame(self, fr, thr=None):
                calls.append(thr)
                return (
                    np.array([[8.0, 8.0, 24.0, 24.0]], np.float32),
                    np.array([0.9], np.float32),
                )

        recs = list(
            run_video(
                tiny_predictor, iter([frame] * 2),
                detector=FakeDetector(), detector_threshold=0.5,
                nms=None, smooth=False,
            )
        )
        assert len(recs) == 2 and calls == [0.5, 0.5]
        # the pose box is the detector box expanded to the crop aspect
        H, W = tiny_predictor.input_size
        box = recs[0]["boxes"][0]
        assert abs(box[2] / box[3] - W / H) < 1e-5
        assert len(recs[0]["keypoints"]) == 1

    def test_detector_and_boxes_mutually_exclusive(self, tiny_predictor):
        with pytest.raises(ValueError, match="not both"):
            next(
                run_video(
                    tiny_predictor,
                    iter([np.zeros((32, 32, 3), np.uint8)]),
                    boxes=[np.zeros((1, 4), np.float32)],
                    detector=object(),
                )
            )


class TestRunVideoStream:
    @pytest.mark.parametrize("nms", [None, "soft_oks"])
    def test_matches_per_frame_mode(self, tiny_predictor, nms):
        """Throughput mode (crops batched across frames) must reproduce the
        per-frame mode record-for-record: same tracks, same smoothing, same
        NMS survivors — batching is an execution detail, not semantics."""
        from probpose_pytorch_tpu.video import run_video, run_video_stream

        rng = np.random.default_rng(3)
        frames = [
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(5)
        ]
        boxes = [
            np.array([[0, 0, 32, 32], [30, 30, 32, 32]], np.float32),
            np.array([[0, 0, 32, 32]], np.float32),
            np.zeros((0, 4), np.float32),
            np.array(
                [[0, 0, 32, 32], [30, 30, 32, 32], [10, 10, 32, 32]],
                np.float32,
            ),
            np.array([[5, 5, 40, 40]], np.float32),
        ]
        kw = dict(boxes=boxes, nms=nms, track_threshold=0.05)
        ref = list(run_video(tiny_predictor, iter(frames), **kw))
        # batch=4 spans frame boundaries; the tail batch carries padding
        got = list(
            run_video_stream(
                tiny_predictor, iter(frames), batch=4, **kw
            )
        )
        assert len(got) == len(ref) == 5
        for r, g in zip(ref, got):
            assert g["frame"] == r["frame"]
            assert g["track_ids"].tolist() == r["track_ids"].tolist()
            for k in ("keypoints", "smoothed", "probabilities",
                      "pose_scores", "boxes"):
                np.testing.assert_allclose(
                    g[k], r[k], rtol=1e-5, atol=1e-5,
                    err_msg=f"frame {r['frame']}: {k}",
                )

    def test_single_program_frame_padding(self, tiny_predictor):
        """Frames smaller than the stream frame shape pad up; one compiled
        program serves the whole sequence."""
        from probpose_pytorch_tpu.video import run_video_stream

        rng = np.random.default_rng(4)
        frames = [
            rng.integers(0, 256, (50, 40, 3), dtype=np.uint8),
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
        ]
        boxes = [np.array([[0, 0, 30, 30]], np.float32)] * 2
        recs = list(
            run_video_stream(
                tiny_predictor, iter(frames), boxes=boxes, batch=2,
                frame_shape=(64, 64), nms=None,
            )
        )
        assert [r["frame"] for r in recs] == [0, 1]
        assert all(r["keypoints"].shape == (1, 5, 2) for r in recs)

    def test_oversized_frame_raises(self, tiny_predictor):
        from probpose_pytorch_tpu.video import run_video_stream

        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (80, 64, 3), dtype=np.uint8)]
        with pytest.raises(ValueError, match="exceeds"):
            list(
                run_video_stream(
                    tiny_predictor, iter(frames), batch=2,
                    frame_shape=(64, 64),
                )
            )


def test_video_cli_on_bundle(tmp_path, tiny_predictor):
    """The video CLI drives an exported StableHLO bundle (no checkpoint on
    the box) in both per-frame and stream modes."""
    from probpose_pytorch_tpu.serve import export_predictor_bundle
    from probpose_pytorch_tpu.video import main as video_main

    out = export_predictor_bundle(
        tiny_predictor, tmp_path / "bundle", buckets=(1, 4),
        frame_shape=(64, 64),
    )
    rng = np.random.default_rng(0)
    np.save(
        tmp_path / "vid.npy",
        rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8),
    )
    (tmp_path / "boxes.json").write_text(
        json.dumps([[[0, 0, 40, 40]]] * 3)
    )
    for mode, extra in (("perframe", []),
                        ("stream", ["--stream-batch", "0"])):
        dst = tmp_path / f"out_{mode}"
        video_main([
            "--bundle", str(out),
            "--frames", str(tmp_path / "vid.npy"),
            "--boxes", str(tmp_path / "boxes.json"),
            "--out", str(dst), "--nms", "none",
        ] + extra)
        lines = (dst / "poses.jsonl").read_text().strip().splitlines()
        assert len(lines) == 3, mode
        rec = json.loads(lines[0])
        assert np.asarray(rec["keypoints"]).shape == (1, 5, 2), mode
    # both modes agree on the same exported programs
    a = json.loads((tmp_path / "out_perframe" / "poses.jsonl")
                   .read_text().splitlines()[2])
    b = json.loads((tmp_path / "out_stream" / "poses.jsonl")
                   .read_text().splitlines()[2])
    np.testing.assert_allclose(
        np.asarray(a["keypoints"]), np.asarray(b["keypoints"]),
        rtol=1e-5, atol=1e-5,
    )


def test_video_cli(tmp_path):
    """End-to-end CLI: checkpoint + npy stack + boxes JSON → poses.jsonl
    + rendered overlays."""
    import PIL.Image

    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
    from probpose_pytorch_tpu.video import main as video_main

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=4, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(8, 8),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir=str(tmp_path / "run"),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    run = tmp_path / "run"
    run.mkdir(parents=True, exist_ok=True)
    cfg.save(run / "config.json")
    ckpt = CheckpointManager(run / "checkpoints", keep=1)
    ckpt.save(0, trainer.state, force=True)
    ckpt.close()

    rng = np.random.default_rng(0)
    np.save(
        tmp_path / "vid.npy",
        rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
    )
    (tmp_path / "boxes.json").write_text(
        json.dumps([[[0, 0, 40, 40]], [[0, 0, 40, 40]]])
    )
    out = tmp_path / "out"
    video_main([
        "--checkpoint", str(run / "checkpoints"),
        "--config", str(run / "config.json"),
        "--frames", str(tmp_path / "vid.npy"),
        "--boxes", str(tmp_path / "boxes.json"),
        "--out", str(out),
        "--render", "--prob-threshold", "0.0",
    ])
    lines = (out / "poses.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert np.asarray(rec["keypoints"]).shape == (1, 4, 2)
    assert np.asarray(rec["smoothed"]).shape == (1, 4, 2)
    assert rec["track_ids"] == [0]
    img = PIL.Image.open(out / "frame_000000.png")
    assert img.size == (64, 64)


class TestBoxesValidation:
    def test_short_boxes_list_raises_clearly(self, tiny_predictor):
        """A boxes list shorter than the frame sequence must raise a clear
        ValueError (not an IndexError mid-run after partial output)."""
        from probpose_pytorch_tpu.video import run_video, run_video_stream

        rng = np.random.default_rng(0)
        frames = [
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(3)
        ]
        boxes = [np.array([[0, 0, 32, 32]], np.float32)]  # 1 entry, 3 frames
        with pytest.raises(ValueError, match="boxes list has 1 entries"):
            list(run_video(tiny_predictor, iter(frames), boxes=boxes,
                           nms=None))
        with pytest.raises(ValueError, match="boxes list has 1 entries"):
            list(run_video_stream(tiny_predictor, iter(frames), boxes=boxes,
                                  nms=None, batch=4))


class TestRunVideoBottomUp:
    """Single-stage mode: one forward per frame, no boxes/detector."""

    @pytest.fixture(scope="class")
    def bu_predictor(self):
        from probpose_pytorch_tpu.detect.pipeline import BottomUpPredictor
        from probpose_pytorch_tpu.detect.train import DetectorTrainer

        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=1,
            num_keypoints=5,
        )
        return BottomUpPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.0,  # untrained: keep all detection slots
            max_detections=4,
        )

    def test_record_contract_and_static_tracks(self, bu_predictor):
        from probpose_pytorch_tpu.video import run_video_bottomup

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        recs = list(run_video_bottomup(
            bu_predictor, iter([frame] * 3), nms=None, smooth=True
        ))
        assert len(recs) == 3
        r = recs[0]
        # identical record schema to run_video's
        assert set(r) == {
            "frame", "t", "track_ids", "keypoints", "smoothed",
            "probabilities", "scores", "pose_scores", "boxes",
        }
        n = len(r["keypoints"])
        assert n == 4  # threshold 0 keeps every detection slot
        assert r["keypoints"].shape == (n, 5, 2)
        assert r["boxes"].shape == (n, 4)
        # no per-joint confidence in this family: probabilities all-ones,
        # scores = center score tiled, pose_scores = center score
        np.testing.assert_array_equal(
            r["probabilities"], np.ones((n, 5), np.float32)
        )
        np.testing.assert_allclose(
            r["pose_scores"], r["scores"][:, 0], atol=1e-6
        )
        # static scene -> stable track ids across frames
        for rec in recs[1:]:
            np.testing.assert_array_equal(
                rec["track_ids"], recs[0]["track_ids"]
            )

    def test_threshold_empties_frame(self, bu_predictor):
        from probpose_pytorch_tpu.video import run_video_bottomup

        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        recs = list(run_video_bottomup(
            bu_predictor, iter([frame]), score_threshold=2.0
        ))
        assert len(recs) == 1
        assert len(recs[0]["keypoints"]) == 0
        assert recs[0]["track_ids"].shape == (0,)

    def test_nms_keeps_top_pose(self, bu_predictor):
        """Untrained slots decode near-identical poses; OKS-NMS must
        suppress duplicates down from max_detections."""
        from probpose_pytorch_tpu.video import run_video_bottomup

        rng = np.random.default_rng(2)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        (rec,) = run_video_bottomup(
            bu_predictor, iter([frame]), nms="oks", nms_threshold=0.9
        )
        assert 1 <= len(rec["keypoints"]) <= 4

    def test_cli_bottomup(self, tmp_path, bu_predictor):
        """video --bottomup on a saved single-stage checkpoint."""
        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
        from probpose_pytorch_tpu.video import main as video_main

        run = tmp_path / "bu_run"
        run.mkdir()
        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=1,
            num_keypoints=5,
        )
        (run / "detector.json").write_text(json.dumps(
            dict(img_size=[64, 64], preset="conv-t", num_keypoints=5)
        ))
        ckpt = CheckpointManager(run / "checkpoints", keep=1)
        ckpt.save(0, trainer.state, force=True)
        ckpt.close()
        rng = np.random.default_rng(3)
        np.save(tmp_path / "vid.npy",
                rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
        out = tmp_path / "out"
        video_main([
            "--bottomup", str(run),
            "--frames", str(tmp_path / "vid.npy"),
            "--detector-threshold", "0.0",
            "--out", str(out),
        ])
        lines = (out / "poses.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert np.asarray(rec["keypoints"]).shape[1:] == (5, 2)

    def test_cli_bottomup_flag_conflicts(self, tmp_path):
        from probpose_pytorch_tpu.video import main as video_main

        np.save(tmp_path / "vid.npy",
                np.zeros((1, 8, 8, 3), np.uint8))
        (tmp_path / "boxes.json").write_text("[[[0,0,4,4]]]")
        with pytest.raises(SystemExit):
            video_main([
                "--bottomup", str(tmp_path),
                "--frames", str(tmp_path / "vid.npy"),
                "--boxes", str(tmp_path / "boxes.json"),
                "--out", str(tmp_path / "o"),
            ])


class TestRunVideoFused:
    """run_video(fused=True): detector -> crops -> pose as ONE program."""

    def test_fused_record_contract(self, tiny_predictor):
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.detect import (
            DetectorPredictor,
            PersonDetector,
        )

        det_model = PersonDetector(img_size=(64, 64), preset="conv-t")
        det_vars = det_model.init(
            jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)), train=False
        )
        detector = DetectorPredictor(
            model=det_model, variables=det_vars, max_detections=8
        )
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        recs = list(
            run_video(
                tiny_predictor, iter([frame] * 2),
                detector=detector, detector_threshold=-1.0,
                fused=True, max_people=3,
                nms=None, smooth=False,
            )
        )
        assert len(recs) == 2
        for r in recs:
            assert r["keypoints"].shape == (3, 5, 2)
            assert r["boxes"].shape == (3, 4)
            assert r["pose_scores"].shape == (3,)
        # identical frames through the fused program -> identical poses
        np.testing.assert_array_equal(
            recs[0]["keypoints"], recs[1]["keypoints"]
        )
        H, W = tiny_predictor.input_size
        box = recs[0]["boxes"][0]
        assert abs(box[2] / box[3] - W / H) < 1e-4

    def test_fused_needs_detector(self, tiny_predictor):
        with pytest.raises(ValueError, match="needs a detector"):
            next(
                run_video(
                    tiny_predictor,
                    iter([np.zeros((32, 32, 3), np.uint8)]),
                    fused=True,
                )
            )

    def test_fused_stream_matches_per_frame(self, tiny_predictor):
        """run_video_fused_stream == run_video(fused=True) record for
        record (same program, batched dispatch + ragged tail)."""
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.detect import (
            DetectorPredictor,
            PersonDetector,
        )
        from probpose_pytorch_tpu.detect.fused import FusedTwoStagePredictor
        from probpose_pytorch_tpu.video import run_video_fused_stream

        det_model = PersonDetector(img_size=(64, 64), preset="conv-t")
        det_vars = det_model.init(
            jax.random.PRNGKey(11), jnp.zeros((1, 64, 64, 3)), train=False
        )
        detector = DetectorPredictor(
            model=det_model, variables=det_vars, max_detections=8
        )
        rng = np.random.default_rng(4)
        seq = [
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(5)  # 5 frames, batch 2 -> ragged tail
        ]
        per_frame = list(
            run_video(
                tiny_predictor, iter(seq),
                detector=detector, detector_threshold=-1.0,
                fused=True, max_people=3,
                nms=None, smooth=False,
            )
        )
        fused = FusedTwoStagePredictor(
            detector=detector, pose=tiny_predictor, max_people=3,
            score_threshold=-1.0,
        )
        streamed = list(
            run_video_fused_stream(
                fused, iter(seq), batch=2,
                nms=None, smooth=False,
            )
        )
        assert len(streamed) == len(per_frame) == 5
        for a, b in zip(streamed, per_frame):
            assert a["frame"] == b["frame"]
            # batch-2 vs batch-1 programs tile differently; observed
            # <=5e-4 px / <=1e-4 score drift (same caveat as
            # run_video_stream's docstring)
            np.testing.assert_allclose(
                a["keypoints"], b["keypoints"], atol=5e-3
            )
            np.testing.assert_allclose(
                a["pose_scores"], b["pose_scores"], atol=1e-3
            )
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=5e-3)
