"""End-to-end tests: YOLO-format training via the CLI, multi-person
prediction, host metrics parity."""

import json
import sys

import numpy as np
import pytest

from probpose_pytorch_tpu.models.vit import ViTConfig

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


@pytest.fixture
def yolo_root(tmp_path):
    """Synthetic YOLO-pose dataset on disk: 2 splits, 5 keypoints."""
    import PIL.Image

    rng = np.random.default_rng(0)
    for split, n in [("train", 6), ("valid", 2)]:
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(n):
            w, h = 100, 80
            PIL.Image.fromarray(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"{i}.png")
            parts = ["0", "0.5", "0.5", "0.6", "0.7"]
            for _ in range(5):
                parts += [
                    f"{rng.uniform(0.2, 0.8):.4f}",
                    f"{rng.uniform(0.2, 0.8):.4f}",
                    str(rng.integers(0, 3)),
                ]
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                " ".join(parts) + "\n"
            )
    return tmp_path


def test_yolo_dataset_loading(yolo_root):
    from probpose_pytorch_tpu.data import YOLOPoseDataset

    ds = YOLOPoseDataset(yolo_root, "train", (64, 48))
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (64, 48, 3)
    assert s["keypoints"].shape == (5, 2)
    # v==1 promoted to 2 -> visible; visibility = min(v,1)
    assert set(np.unique(s["keypoints_visible"])) <= {0.0, 1.0}


def test_cli_trains_on_yolo_data(yolo_root, tmp_path):
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig
    from probpose_pytorch_tpu.train.cli import main

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
        epochs=1,
        train_batch_size=2,
        val_batch_size=2,
        val_every=1000,
        data_root=str(yolo_root),
        dataset_format="yolo",
        num_workers=1,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)
    out = tmp_path / "out"
    main([str(out), "--config", str(cfg_path), "--max-steps", "2"])
    assert (out / "config.json").exists()
    assert (out / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("training/loss" in l for l in lines)
    assert (out / "checkpoints").exists()


def test_multiperson_predictor(tmp_path):
    """Detector boxes -> fused crops -> decode -> frame-space keypoints
    (BASELINE config #4 pipeline shape)."""
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
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 120, 160, 3), dtype=np.uint8)
    boxes = rng.uniform([0, 0, 40, 50], [60, 40, 90, 70], (3, 4)).astype(
        np.float32
    )
    out = predictor(frames, boxes)
    assert out["keypoints"].shape == (3, 5, 2)
    assert out["scores"].shape == (3, 5)
    assert out["probabilities"].shape == (3, 1, 5)
    # frame-space: keypoints land inside (or near) their boxes
    x0 = boxes[:, None, 0] - boxes[:, None, 2]
    x1 = boxes[:, None, 0] + 2 * boxes[:, None, 2]
    assert ((out["keypoints"][..., 0] >= x0) & (out["keypoints"][..., 0] <= x1)).all()

    # predict_stream: same results, order preserved, batches stay in flight.
    batches = []
    for seed in range(5):
        r = np.random.default_rng(seed)
        batches.append(
            (
                r.integers(0, 256, (3, 120, 160, 3), dtype=np.uint8),
                r.uniform([0, 0, 40, 50], [60, 40, 90, 70], (3, 4)).astype(
                    np.float32
                ),
            )
        )
    streamed = list(predictor.predict_stream(iter(batches), depth=2))
    assert len(streamed) == 5
    for (f, b), got in zip(batches, streamed):
        want = predictor(f, b)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="depth"):
        next(predictor.predict_stream(iter(batches), depth=0))


def test_host_metrics_match_on_device():
    import jax.numpy as jnp

    from probpose_pytorch_tpu.eval.metrics_host import (
        balanced_binary_accuracy_sampled,
        pose_pck_accuracy as host_pck,
    )
    from probpose_pytorch_tpu.losses import (
        balanced_binary_accuracy,
        pose_pck_accuracy,
    )

    rng = np.random.default_rng(0)
    out = rng.random((4, 6, 24, 18)).astype(np.float32)
    tgt = rng.random((4, 6, 24, 18)).astype(np.float32)
    mask = rng.random((4, 6)) > 0.3
    _, host_avg, host_cnt = host_pck(out, tgt, mask)
    _, dev_avg, dev_cnt = pose_pck_accuracy(
        jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(mask)
    )
    assert host_cnt == int(dev_cnt)
    np.testing.assert_allclose(host_avg, float(dev_avg), rtol=1e-6)

    # Balanced accuracy: the sampled (reference) estimator converges to the
    # deterministic on-device value on a well-separated problem.
    dt = np.concatenate([rng.uniform(0.7, 1, 500), rng.uniform(0, 0.3, 300)])
    gt = np.concatenate([np.ones(500), np.zeros(300)])
    m = np.ones(800, bool)
    sampled, _ = balanced_binary_accuracy_sampled(
        dt, gt, m, np.random.default_rng(1)
    )
    det, _ = balanced_binary_accuracy(
        jnp.asarray(dt[None]), jnp.asarray(gt[None]), jnp.asarray(m[None])
    )
    assert abs(sampled - float(det)) < 0.02


def test_predict_frame_bucketing(tmp_path):
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
        out_dir=str(tmp_path / "run"),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    predictor = TopDownPredictor(
        model=trainer.model,
        variables={"params": trainer.state.params,
                   "batch_stats": trainer.state.batch_stats},
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    boxes = rng.uniform([0, 0, 40, 50], [60, 40, 90, 70], (3, 4)).astype(
        np.float32
    )
    out = predictor.predict_frame(frame, boxes, buckets=(4, 8))
    assert out["keypoints"].shape == (3, 5, 2)
    # Bucketed (padded to 4, frame zero-padded 120x160 -> 128x192 by the
    # default frame_size_multiple=64) results equal unbucketed, unpadded
    # ones for the real boxes.
    direct = predictor(np.broadcast_to(frame, (3, *frame.shape)),
                       boxes)
    np.testing.assert_allclose(out["keypoints"], direct["keypoints"],
                               atol=1e-4)
    # Exact frame shapes when frame-size bucketing is disabled.
    predictor.frame_size_multiple = None
    exact = predictor.predict_frame(frame, boxes, buckets=(4, 8))
    np.testing.assert_allclose(exact["keypoints"], direct["keypoints"],
                               atol=1e-4)
    # A box hanging past the original frame edge samples black either way
    # (crop_resize zero-pads out-of-extent reads), so padded and exact
    # frames agree even there.
    edge = np.array([[130.0, 90.0, 60.0, 60.0]], np.float32)
    exact_edge = predictor.predict_frame(frame, edge, buckets=(4, 8))
    predictor.frame_size_multiple = 64
    padded_edge = predictor.predict_frame(frame, edge, buckets=(4, 8))
    np.testing.assert_allclose(
        padded_edge["keypoints"], exact_edge["keypoints"], atol=1e-4
    )


def test_derive_bucket_ladder():
    from probpose_pytorch_tpu.inference import derive_bucket_ladder

    # Latency floor: batches 1..32 cost the same -> one rung covers them.
    flat_then_linear = [
        {"batch": 1, "ms_per_batch": 5.0},
        {"batch": 8, "ms_per_batch": 5.0},
        {"batch": 32, "ms_per_batch": 5.1},
        {"batch": 128, "ms_per_batch": 13.0},
        {"batch": 384, "ms_per_batch": 39.0},
    ]
    assert derive_bucket_ladder(flat_then_linear) == (32, 128, 384)
    # Strictly linear latency keeps every rung.
    linear = [{"batch": b, "ms_per_batch": float(b)} for b in (1, 2, 4, 8)]
    assert derive_bucket_ladder(linear) == (1, 2, 4, 8)
    # A rung inside the margin of the next one is pruned.
    close = [
        {"batch": 4, "ms_per_batch": 9.5},
        {"batch": 8, "ms_per_batch": 10.0},
    ]
    assert derive_bucket_ladder(close, margin=0.10) == (8,)
    import pytest

    with pytest.raises(ValueError):
        derive_bucket_ladder([])


def test_cli_with_crop_cache(yolo_root, tmp_path):
    import dataclasses

    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig
    from probpose_pytorch_tpu.train.cli import main

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        epochs=1, train_batch_size=2, val_batch_size=2, val_every=1000,
        data_root=str(yolo_root), dataset_format="yolo", num_workers=1,
        cache_dir=str(tmp_path / "cache"),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)
    out = tmp_path / "out"
    main([str(out), "--config", str(cfg_path), "--max-steps", "2"])
    assert (tmp_path / "cache" / "train" / "meta.json").exists()
    assert "training/loss" in (out / "metrics.jsonl").read_text()


def test_inference_cli(tmp_path):
    """Full single-image inference CLI: checkpoint -> heatmap PNGs +
    rendered output + predictions.json (reference inference.py surface)."""
    import PIL.Image

    from probpose_pytorch_tpu.inference import main as infer_main
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

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
    out = tmp_path / "run"
    out.mkdir(parents=True, exist_ok=True)
    cfg.save(out / "config.json")
    ckpt = CheckpointManager(out / "checkpoints", keep=1)
    ckpt.save(0, trainer.state, force=True)
    ckpt.close()

    img_path = tmp_path / "img.png"
    PIL.Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (80, 100, 3), dtype=np.uint8)
    ).save(img_path)
    result_dir = tmp_path / "result"
    infer_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--image", str(img_path),
        "--output", str(result_dir),
        "--prob-threshold", "0.0",
    ])
    assert (result_dir / "output_image.png").exists()
    assert (result_dir / "heatmap_0.png").exists()
    assert (result_dir / "predictions.json").exists()
    rec = json.loads((result_dir / "predictions.json").read_text())
    assert np.asarray(rec["keypoints"]).shape == (1, 4, 2)
