"""Serving bundles: jax.export roundtrip, bucket/frame padding, CLI.

The bundle must reproduce the live predictor exactly (same traced program,
same params) and must load without touching the model-building code paths.
"""

import json

import numpy as np
import pytest

from probpose_pytorch_tpu.models.vit import ViTConfig

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


def _tiny_predictor(out_dir):
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
        out_dir=str(out_dir),
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
    return trainer, predictor


def _frames_boxes(rng, b, h=60, w=62):
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    boxes = np.stack(
        [
            rng.uniform(0, w / 2, b),
            rng.uniform(0, h / 2, b),
            rng.uniform(10, w / 2, b),
            rng.uniform(10, h / 2, b),
        ],
        axis=-1,
    ).astype(np.float32)
    return frames, boxes


@pytest.fixture(scope="module")
def bundle_env(tmp_path_factory):
    from probpose_pytorch_tpu.serve import (
        ServingBundle,
        export_predictor_bundle,
    )

    root = tmp_path_factory.mktemp("bundle")
    _, predictor = _tiny_predictor(root / "run")
    out = export_predictor_bundle(
        predictor, root / "bundle", buckets=(1, 4), frame_shape=(64, 64)
    )
    return predictor, ServingBundle.load(out)


class TestBundle:
    def test_manifest(self, bundle_env):
        _, bundle = bundle_env
        assert bundle.buckets == (1, 4)
        assert bundle.frame_shape == (64, 64)
        assert (bundle.directory / "fn_b1.bin").exists()
        assert (bundle.directory / "fn_b4.bin").exists()

    def test_roundtrip_matches_predictor(self, bundle_env):
        predictor, bundle = bundle_env
        rng = np.random.default_rng(0)
        frames, boxes = _frames_boxes(rng, 4, h=64, w=64)
        live = predictor(frames, boxes)
        exported = bundle(frames, boxes)
        assert set(live) == set(exported)
        for k in live:
            np.testing.assert_allclose(
                exported[k], live[k], rtol=1e-6, atol=1e-6, err_msg=k
            )

    def test_frame_zero_padding_matches_predictor_semantics(self, bundle_env):
        """A smaller frame zero-pads up to the exported shape; the cropper
        treats out-of-extent samples as black, so results equal the live
        predictor on the same (unpadded) frame."""
        predictor, bundle = bundle_env
        rng = np.random.default_rng(1)
        frames, boxes = _frames_boxes(rng, 4, h=50, w=40)
        live = predictor(frames, boxes)
        exported = bundle(frames, boxes)
        for k in live:
            np.testing.assert_allclose(
                exported[k], live[k], rtol=1e-6, atol=1e-6, err_msg=k
            )

    def test_indexed_manifest_and_call(self, bundle_env):
        """Indexed programs: each unique frame uploads once; results match
        the per-crop-frames program exactly on the same data."""
        _, bundle = bundle_env
        assert bundle.indexed_buckets == {4: (1, 2, 4)}
        rng = np.random.default_rng(11)
        fA = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        fB = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        boxes = _frames_boxes(rng, 4, h=64, w=64)[1]
        ids = np.array([0, 0, 1, 1], np.int32)
        plain = bundle(np.stack([fA, fA, fB, fB]), boxes)
        indexed = bundle(np.stack([fA, fB]), boxes, ids)
        for k in plain:
            np.testing.assert_allclose(
                indexed[k], plain[k], rtol=1e-6, atol=1e-6, err_msg=k
            )

    def test_indexed_frame_count_validated(self, bundle_env):
        _, bundle = bundle_env
        rng = np.random.default_rng(12)
        frames = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
        boxes = _frames_boxes(rng, 4, h=64, w=64)[1]
        with pytest.raises(ValueError, match="unique-frame count"):
            bundle(frames, boxes, np.array([0, 1, 2, 2], np.int32))

    def test_indexed_identity_fallback_bucket1(self, bundle_env):
        """Bucket 1 has no indexed program (F==B==1); frame_ids still work
        via the host-side gather fallback."""
        predictor, bundle = bundle_env
        rng = np.random.default_rng(13)
        frames, boxes = _frames_boxes(rng, 1, h=64, w=64)
        out = bundle(frames, boxes, np.zeros((1,), np.int32))
        live = predictor(frames, boxes)
        for k in live:
            np.testing.assert_allclose(
                out[k], live[k], rtol=1e-6, atol=1e-6, err_msg=k
            )

    def test_predict_stream_indexed_triples(self, bundle_env):
        _, bundle = bundle_env
        rng = np.random.default_rng(14)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        boxes = _frames_boxes(rng, 4, h=64, w=64)[1]
        ids = np.zeros((4,), np.int32)
        batches = [(frame[None], boxes, ids)] * 3
        outs = list(bundle.predict_stream(iter(batches), depth=2))
        sync = bundle(frame[None], boxes, ids)
        assert len(outs) == 3
        for out in outs:
            for k in sync:
                np.testing.assert_allclose(
                    out[k], sync[k], rtol=1e-6, atol=1e-6, err_msg=k
                )

    def test_predict_stream_matches_sync(self, bundle_env):
        predictor, bundle = bundle_env
        rng = np.random.default_rng(7)
        batches = [_frames_boxes(rng, b, h=50, w=40) for b in (4, 1, 4, 4, 1)]
        streamed = list(bundle.predict_stream(iter(batches), depth=2))
        assert len(streamed) == len(batches)
        for (frames, boxes), out in zip(batches, streamed):
            sync = bundle(frames, boxes)
            assert set(out) == set(sync)
            for k in sync:
                np.testing.assert_allclose(
                    out[k], sync[k], rtol=1e-6, atol=1e-6, err_msg=k
                )

    def test_predict_stream_rejects_non_bucket(self, bundle_env):
        _, bundle = bundle_env
        rng = np.random.default_rng(8)
        batches = [_frames_boxes(rng, 3, h=50, w=40)]
        with pytest.raises(ValueError, match="bucket"):
            list(bundle.predict_stream(iter(batches)))

    def test_oversized_frame_rejected(self, bundle_env):
        _, bundle = bundle_env
        rng = np.random.default_rng(2)
        frames, boxes = _frames_boxes(rng, 4, h=65, w=64)
        with pytest.raises(ValueError, match="exceeds"):
            bundle(frames, boxes)

    def test_non_bucket_batch_rejected(self, bundle_env):
        _, bundle = bundle_env
        rng = np.random.default_rng(3)
        frames, boxes = _frames_boxes(rng, 3, h=64, w=64)
        with pytest.raises(ValueError, match="bucket"):
            bundle(frames, boxes)

    def test_predict_frame_pads_and_chunks(self, bundle_env):
        predictor, bundle = bundle_env
        rng = np.random.default_rng(4)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        # n=3 pads to bucket 4; n=9 chunks past the top bucket (4,4,1).
        for n in (3, 9):
            _, boxes = _frames_boxes(rng, n, h=64, w=64)
            out = bundle.predict_frame(frame, boxes)
            live = predictor.predict_frame(frame, boxes, buckets=(1, 4))
            assert len(out["keypoints"]) == n
            np.testing.assert_allclose(
                out["keypoints"], live["keypoints"], rtol=1e-6, atol=1e-6
            )

    def test_load_does_not_need_model_code(self, bundle_env, monkeypatch):
        """The deployment promise: a loaded bundle serves without building
        models — flax model construction must never run."""
        _, bundle = bundle_env
        import probpose_pytorch_tpu.models.model as model_mod
        from probpose_pytorch_tpu.serve import ServingBundle

        def boom(*a, **k):  # pragma: no cover - would fail the test
            raise AssertionError("model code invoked during bundle serving")

        monkeypatch.setattr(model_mod, "build_model", boom)
        fresh = ServingBundle.load(bundle.directory)
        rng = np.random.default_rng(5)
        frames, boxes = _frames_boxes(rng, 1, h=64, w=64)
        out = fresh(frames, boxes)
        assert out["keypoints"].shape[0] == 1

    def test_version_gate(self, bundle_env, tmp_path):
        _, bundle = bundle_env
        import shutil

        from probpose_pytorch_tpu.serve import ServingBundle

        copy = tmp_path / "old"
        shutil.copytree(bundle.directory, copy)
        manifest = json.loads((copy / "manifest.json").read_text())
        manifest["version"] = 0
        (copy / "manifest.json").write_text(json.dumps(manifest))
        with pytest.raises(ValueError, match="version"):
            ServingBundle.load(copy)


def test_calibrated_predictor_exports(tmp_path):
    """Temperature scaling is part of the traced program, so an exported
    bundle of a calibrated predictor serves calibrated probabilities —
    equal to the host-side apply_temperature of the uncalibrated outputs."""
    import dataclasses

    from probpose_pytorch_tpu.eval.calibration import apply_temperature
    from probpose_pytorch_tpu.serve import (
        ServingBundle,
        export_predictor_bundle,
    )

    _, plain = _tiny_predictor(tmp_path / "run")
    calibrated = dataclasses.replace(
        plain, calibration={"presence": 3.0, "visibility": 0.4}
    )
    out = export_predictor_bundle(
        calibrated, tmp_path / "bundle", buckets=(2,), frame_shape=(64, 64)
    )
    bundle = ServingBundle.load(out)
    rng = np.random.default_rng(7)
    frames, boxes = _frames_boxes(rng, 2, h=64, w=64)
    raw = plain(frames, boxes)
    served = bundle(frames, boxes)
    np.testing.assert_allclose(
        np.asarray(served["probabilities"]),
        apply_temperature(np.asarray(raw["probabilities"]), 3.0),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(served["visibilities"]),
        apply_temperature(np.asarray(raw["visibilities"]), 0.4),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(served["keypoints"]), np.asarray(raw["keypoints"])
    )


def test_quantized_predictor_exports(tmp_path):
    """A weight-only-int8 predictor exports (quantized variables ride the
    bundle) and the reloaded program matches the live quantized
    predictor."""
    from probpose_pytorch_tpu.serve import (
        ServingBundle,
        export_predictor_bundle,
    )

    _, base = _tiny_predictor(tmp_path / "run")
    from probpose_pytorch_tpu.inference import TopDownPredictor

    pred = TopDownPredictor(
        model=base.model,
        variables=base.variables,
        codec=base.codec,
        input_size=base.input_size,
        quantize="int8_wo",
    )
    out = export_predictor_bundle(
        pred, tmp_path / "bundle", buckets=(2,), frame_shape=(64, 64)
    )
    b = ServingBundle.load(out)
    rng = np.random.default_rng(5)
    frames, boxes = _frames_boxes(rng, 2, h=64, w=64)
    live = pred(frames, boxes)
    got = b(frames, boxes)
    for k in live:
        np.testing.assert_allclose(
            got[k], live[k], rtol=1e-6, atol=1e-6, err_msg=k
        )


def test_portable_export_guard_and_platforms(tmp_path):
    """Multi-platform export: manifest records the targets; a Pallas
    attention impl is rejected with a clear message (it lowers for TPU
    only). The XLA-sparsemax trace path is exercised by exporting for a
    platform set differing from the current backend."""
    import jax

    from probpose_pytorch_tpu.serve import (
        ServingBundle,
        export_predictor_bundle,
    )

    _, predictor = _tiny_predictor(tmp_path / "run")
    current = jax.default_backend()
    targets = ["cpu", "tpu"] if current == "cpu" else ["cpu"]
    out = export_predictor_bundle(
        predictor, tmp_path / "bundle", buckets=(2,), frame_shape=(64, 64),
        platforms=targets,
    )
    b = ServingBundle.load(out)
    assert b.manifest["platforms"] == targets
    rng = np.random.default_rng(0)
    frames, boxes = _frames_boxes(rng, 2, h=64, w=64)
    live = predictor(frames, boxes)
    got = b(frames, boxes)
    np.testing.assert_allclose(
        got["keypoints"], live["keypoints"], rtol=1e-4, atol=1e-4
    )

    # fused attention cannot target non-TPU platforms
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0, attn_impl="fused",
        ),
        out_dir=str(tmp_path / "run2"),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    fused_pred = TopDownPredictor(
        model=trainer.model,
        variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )
    with pytest.raises(ValueError, match="per-platform"):
        export_predictor_bundle(
            fused_pred, tmp_path / "b2", buckets=(2,),
            frame_shape=(64, 64),
            platforms=["cpu", "tpu"] if current == "cpu" else ["cpu"],
        )


class TestDetectorBundle:
    @pytest.fixture(scope="class")
    def det_env(self, tmp_path_factory):
        from probpose_pytorch_tpu.detect.pipeline import DetectorPredictor
        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.serve import (
            DetectorBundle,
            export_detector_bundle,
        )

        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=1
        )
        live = DetectorPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.0,  # untrained: keep everything, compare raw
            max_detections=8,
        )
        root = tmp_path_factory.mktemp("detbundle")
        out = export_detector_bundle(
            live, root / "bundle", frame_shapes=[(64, 64), (96, 96)]
        )
        return live, DetectorBundle.load(out), out

    def test_manifest_and_kind_gates(self, det_env, bundle_env):
        from probpose_pytorch_tpu.serve import DetectorBundle, ServingBundle

        live, bundle, out = det_env
        assert bundle.frame_shapes == ((64, 64), (96, 96))
        assert bundle.score_threshold == 0.0
        # a pose bundle refuses to load as a detector and vice versa
        _, pose_bundle = bundle_env
        with pytest.raises(ValueError, match="not a detector bundle"):
            DetectorBundle.load(pose_bundle.directory)
        with pytest.raises((ValueError, KeyError)):
            ServingBundle.load(out)

    def test_matches_live_detector(self, det_env):
        live, bundle, _ = det_env
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        lb, ls = live.detect_frame(frame)
        bb, bs = bundle.detect_frame(frame)
        np.testing.assert_allclose(bb, lb, atol=1e-5)
        np.testing.assert_allclose(bs, ls, atol=1e-6)

    def test_pads_smaller_frames_and_rejects_oversize(self, det_env):
        live, bundle, _ = det_env
        rng = np.random.default_rng(1)
        # 80x70 pads up to the 96x96 program; padding is bottom/right so
        # coordinates match the live detector fed the padded frame
        frame = rng.integers(0, 256, (80, 70, 3), dtype=np.uint8)
        padded = np.pad(frame, ((0, 16), (0, 26), (0, 0)))
        lb, ls = live.detect_frame(padded)
        bb, bs = bundle.detect_frame(frame)
        np.testing.assert_allclose(bb, lb, atol=1e-5)
        np.testing.assert_allclose(bs, ls, atol=1e-6)
        with pytest.raises(ValueError, match="exceeds"):
            bundle.detect_frame(
                np.zeros((128, 128, 3), np.uint8)
            )

    def test_load_detector_dispatches_to_bundle(self, det_env):
        from probpose_pytorch_tpu.detect.train import load_detector
        from probpose_pytorch_tpu.serve import DetectorBundle

        _, _, out = det_env
        loaded = load_detector(out)
        assert isinstance(loaded, DetectorBundle)

    def test_export_cli_detector_mode(self, det_env, tmp_path, capsys):
        """serve.export --detector-checkpoint: CLI round trip on a saved
        detector checkpoint."""
        import json as _json

        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.serve.export import main as export_main
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        run = tmp_path / "det_run"
        run.mkdir()
        trainer = DetectorTrainer.create(img_size=(64, 64), total_steps=1)
        (run / "detector.json").write_text(
            _json.dumps(dict(img_size=[64, 64], preset="conv-t"))
        )
        ckpt = CheckpointManager(run / "checkpoints", keep=1)
        ckpt.save(0, trainer.state, force=True)
        ckpt.close()
        export_main([
            "--detector-checkpoint", str(run),
            "--out", str(tmp_path / "det_bundle"),
            "--frame-size", "64,64;96,96",
        ])
        from probpose_pytorch_tpu.serve import DetectorBundle

        bundle = DetectorBundle.load(tmp_path / "det_bundle")
        assert bundle.frame_shapes == ((64, 64), (96, 96))
        boxes, scores = bundle.detect_frame(
            np.zeros((64, 64, 3), np.uint8)
        )
        assert boxes.shape[1] == 4


class TestBottomUpBundle:
    @pytest.fixture(scope="class")
    def bu_env(self, tmp_path_factory):
        from probpose_pytorch_tpu.detect.pipeline import BottomUpPredictor
        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.serve import (
            BottomUpBundle,
            export_bottomup_bundle,
        )

        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=1,
            num_keypoints=5,
        )
        live = BottomUpPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.0,  # untrained: keep everything, compare raw
            max_detections=6,
        )
        root = tmp_path_factory.mktemp("bubundle")
        out = export_bottomup_bundle(
            live, root / "bundle",
            frame_shapes=[(64, 64), (96, 96)], batches=(1, 2),
        )
        return live, BottomUpBundle.load(out), out

    def test_manifest_and_kind_gates(self, bu_env, tmp_path):
        import json as _json

        from probpose_pytorch_tpu.serve import BottomUpBundle, DetectorBundle

        live, bundle, out = bu_env
        assert bundle.frame_shapes == ((64, 64), (96, 96))
        assert bundle.batches == (1, 2)
        assert bundle.manifest["num_keypoints"] == 5
        # wrong-kind manifests refuse to load in either direction
        fake = tmp_path / "fake_det"
        fake.mkdir()
        (fake / "manifest.json").write_text(
            _json.dumps({"kind": "detector", "version": 1})
        )
        with pytest.raises(ValueError, match="not a bottom-up"):
            BottomUpBundle.load(fake)
        with pytest.raises(ValueError, match="not a detector bundle"):
            DetectorBundle.load(out)

    def test_matches_live_predictor(self, bu_env):
        live, bundle, _ = bu_env
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
        lb, ls, lp, lk = live(frames)
        bb, bs, bp, bk = bundle(frames)
        np.testing.assert_allclose(bb, lb, atol=1e-5)
        np.testing.assert_allclose(bs, ls, atol=1e-6)
        np.testing.assert_allclose(bp, lp, atol=1e-5)
        np.testing.assert_allclose(bk, lk, atol=1e-6)

    def test_predict_frame_pads_and_thresholds(self, bu_env):
        live, bundle, _ = bu_env
        rng = np.random.default_rng(1)
        # 80x70 pads up to the 96x96 program (bottom/right zero padding ==
        # live predictor fed the padded frame)
        frame = rng.integers(0, 256, (80, 70, 3), dtype=np.uint8)
        padded = np.pad(frame, ((0, 16), (0, 26), (0, 0)))
        lo = live.predict_frame(padded)
        bo = bundle.predict_frame(frame)
        np.testing.assert_allclose(bo["keypoints"], lo["keypoints"],
                                   atol=1e-5)
        np.testing.assert_allclose(bo["scores"], lo["scores"], atol=1e-6)
        with pytest.raises(ValueError, match="exceeds"):
            bundle.predict_frame(np.zeros((128, 128, 3), np.uint8))
        # a high threshold on an untrained net keeps nothing
        empty = bundle.predict_frame(frame, score_threshold=2.0)
        assert len(empty["keypoints"]) == 0

    def test_batch_chunking_over_buckets(self, bu_env):
        """B=5 splits 2+2+1 over the (1, 2) ladder; results match a live
        batched call exactly."""
        live, bundle, _ = bu_env
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
        lb, ls, lp, lk = live(frames)
        bb, bs, bp, bk = bundle(frames)
        assert bb.shape == lb.shape and bp.shape == lp.shape
        np.testing.assert_allclose(bs, ls, atol=1e-6)
        np.testing.assert_allclose(bp, lp, atol=1e-5)
        np.testing.assert_allclose(bk, lk, atol=1e-6)

    def test_load_bottomup_dispatches_to_bundle(self, bu_env):
        from probpose_pytorch_tpu.detect.train import load_bottomup
        from probpose_pytorch_tpu.serve import BottomUpBundle

        _, _, out = bu_env
        loaded = load_bottomup(out)
        assert isinstance(loaded, BottomUpBundle)

    def test_export_cli_bottomup_mode(self, tmp_path):
        """serve.export --bottomup-checkpoint: CLI round trip on a saved
        single-stage pose checkpoint."""
        import json as _json

        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.serve.export import main as export_main
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        run = tmp_path / "bu_run"
        run.mkdir()
        trainer = DetectorTrainer.create(
            img_size=(64, 64), total_steps=1, num_keypoints=5
        )
        (run / "detector.json").write_text(
            _json.dumps(
                dict(img_size=[64, 64], preset="conv-t", num_keypoints=5)
            )
        )
        ckpt = CheckpointManager(run / "checkpoints", keep=1)
        ckpt.save(0, trainer.state, force=True)
        ckpt.close()
        export_main([
            "--bottomup-checkpoint", str(run),
            "--out", str(tmp_path / "bu_bundle"),
            "--frame-size", "64,64",
            "--buckets", "1,2",
        ])
        from probpose_pytorch_tpu.serve import BottomUpBundle

        bundle = BottomUpBundle.load(tmp_path / "bu_bundle")
        assert bundle.batches == (1, 2)
        out = bundle.predict_frame(np.zeros((64, 64, 3), np.uint8))
        assert out["keypoints"].shape[1:] == (5, 2)


def test_flatten_roundtrip():
    from probpose_pytorch_tpu.serve.export import _flatten, _unflatten

    tree = {
        "params": {"backbone": {"w": np.arange(6).reshape(2, 3)}, "b": np.ones(2)},
        "batch_stats": {"head": {"mean": np.zeros(3)}},
    }
    flat = _flatten(tree)
    assert set(flat) == {
        "params/backbone/w",
        "params/b",
        "batch_stats/head/mean",
    }
    back = _unflatten(flat)
    np.testing.assert_array_equal(back["params"]["backbone"]["w"], tree["params"]["backbone"]["w"])
    np.testing.assert_array_equal(back["batch_stats"]["head"]["mean"], np.zeros(3))


def test_export_cli(tmp_path):
    """Checkpoint dir -> bundle via the CLI entry point."""
    from probpose_pytorch_tpu.serve.export import main
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    trainer, predictor = _tiny_predictor(tmp_path / "run")
    ckpt_dir = tmp_path / "run" / "checkpoints"
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(0, trainer.state, force=True)
    trainer.cfg.save(tmp_path / "run" / "config.json")
    out = tmp_path / "bundle"
    main(
        [
            "--checkpoint", str(ckpt_dir),
            "--out", str(out),
            "--buckets", "2",
            "--frame-size", "64,64",
        ]
    )
    from probpose_pytorch_tpu.serve import ServingBundle

    bundle = ServingBundle.load(out)
    rng = np.random.default_rng(6)
    frames, boxes = _frames_boxes(rng, 2, h=64, w=64)
    live = predictor(frames, boxes)
    exported = bundle(frames, boxes)
    np.testing.assert_allclose(
        exported["keypoints"], live["keypoints"], rtol=1e-6, atol=1e-6
    )


def test_mesh_predictor_rejected(tmp_path):
    from probpose_pytorch_tpu.serve import export_predictor_bundle

    _, predictor = _tiny_predictor(tmp_path / "run")
    predictor.mesh = object()  # any non-None mesh marker
    with pytest.raises(ValueError, match="single-device"):
        export_predictor_bundle(
            predictor, tmp_path / "b", buckets=(1,), frame_shape=(64, 64)
        )


def test_direct_dataclass_construction(bundle_env):
    """ServingBundle built via the generated __init__ (not load()) must be
    usable — _programs is a default field, not load()-only state."""
    from probpose_pytorch_tpu.serve import ServingBundle

    _, loaded = bundle_env
    bundle = ServingBundle(
        directory=loaded.directory,
        manifest=loaded.manifest,
        variables=loaded.variables,
    )
    rng = np.random.default_rng(3)
    frames, boxes = _frames_boxes(rng, 1, h=64, w=64)
    out = bundle(frames, boxes)
    ref = loaded(frames, boxes)
    np.testing.assert_allclose(out["keypoints"], ref["keypoints"])


def test_manifest_records_calibration(bundle_env):
    """The manifest must state the baked-in calibration temperatures (empty
    for an uncalibrated export) so deploy tooling can tell raw from
    temperature-scaled bundles."""
    _, bundle = bundle_env
    assert bundle.manifest["calibration"] == {}


class TestFusedBundle:
    @pytest.fixture(scope="class")
    def fused_env(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.detect import (
            DetectorPredictor,
            FusedTwoStagePredictor,
            PersonDetector,
        )
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.serve import FusedBundle, export_fused_bundle
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        det_model = PersonDetector(img_size=(64, 64), preset="conv-t")
        det_vars = det_model.init(
            jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)), train=False
        )
        detector = DetectorPredictor(
            model=det_model, variables=det_vars, max_detections=4
        )
        ViTConfig.PRESETS.setdefault(
            "vit-tiny-eval",
            dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5,
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
        live = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=3,
            score_threshold=-1.0,  # untrained: keep everything
        )
        root = tmp_path_factory.mktemp("fusedbundle")
        out = export_fused_bundle(
            live, root / "bundle",
            frame_shapes=[(72, 80)], batches=(1, 2),
        )
        return live, FusedBundle.load(out), out

    def test_manifest_and_kind_gates(self, fused_env, tmp_path):
        import json as _json

        from probpose_pytorch_tpu.serve import BottomUpBundle, FusedBundle

        live, bundle, out = fused_env
        assert bundle.frame_shapes == ((72, 80),)
        assert bundle.batches == (1, 2)
        assert bundle.manifest["max_people"] == 3
        fake = tmp_path / "fake"
        fake.mkdir()
        (fake / "manifest.json").write_text(
            _json.dumps({"kind": "bottomup", "version": 1})
        )
        with pytest.raises(ValueError, match="not a fused"):
            FusedBundle.load(fake)
        with pytest.raises(ValueError, match="not a bottom-up"):
            BottomUpBundle.load(out)

    def test_matches_live_predictor(self, fused_env):
        live, bundle, _ = fused_env
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (2, 72, 80, 3), dtype=np.uint8)
        lo = live(frames)
        bo = bundle(frames)
        assert set(bo) == set(lo)
        for k in lo:
            np.testing.assert_allclose(bo[k], lo[k], atol=1e-4, err_msg=k)
        # predict_frame contract
        pf = bundle.predict_frame(frames[0])
        assert pf["keypoints"].shape == (3, 5, 2)
        # unexported shape rejected clearly
        with pytest.raises(ValueError, match="not exported"):
            bundle(frames[:1, :64, :64])

    def test_fused_refuses_bundle_stages(self, fused_env):
        from probpose_pytorch_tpu.detect import FusedTwoStagePredictor

        live, bundle, out = fused_env
        with pytest.raises(ValueError, match="LIVE predictors"):
            FusedTwoStagePredictor(
                detector=bundle, pose=live.pose, max_people=2
            )

    def test_export_cli_fused_mode(self, tmp_path):
        """serve.export --checkpoint ... --fused-detector DIR: CLI round
        trip to a loadable FusedBundle."""
        import json as _json

        import jax

        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.serve import FusedBundle
        from probpose_pytorch_tpu.serve.export import main as export_main
        from probpose_pytorch_tpu.train import TrainConfig, Trainer
        from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

        det_run = tmp_path / "det_run"
        det_run.mkdir()
        det_trainer = DetectorTrainer.create(
            img_size=(64, 64), total_steps=1
        )
        (det_run / "detector.json").write_text(
            _json.dumps(dict(img_size=[64, 64], preset="conv-t"))
        )
        dckpt = CheckpointManager(det_run / "checkpoints", keep=1)
        dckpt.save(0, det_trainer.state)
        dckpt.close()

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5,
                backbone="vit-tiny-e2e", compute_dtype="float32",
                deconv_out_channels=(8, 8), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
            out_dir=str(tmp_path / "pose_run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        pose_run = tmp_path / "pose_run"
        pose_run.mkdir(exist_ok=True)
        cfg.save(pose_run / "config.json")
        pckpt = CheckpointManager(pose_run / "checkpoints", keep=1)
        pckpt.save(0, trainer.state)
        pckpt.close()

        export_main([
            "--checkpoint", str(pose_run / "checkpoints"),
            "--config", str(pose_run / "config.json"),
            "--fused-detector", str(det_run),
            "--out", str(tmp_path / "fused_bundle"),
            "--frame-size", "96,96",
            "--max-people", "3",
        ])
        bundle = FusedBundle.load(tmp_path / "fused_bundle")
        assert bundle.manifest["max_people"] == 3
        out = bundle.predict_frame(
            np.zeros((96, 96, 3), np.uint8), score_threshold=-1.0
        )
        assert out["keypoints"].shape == (3, 5, 2)
        assert out["boxes"].shape == (3, 4)
