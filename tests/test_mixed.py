"""Mixed multi-dataset training: concatenation, re-weighting, CLI wiring."""


import numpy as np
import pytest

from probpose_pytorch_tpu.data import (
    MixedPoseDataset,
    SyntheticPoseDataset,
    generate_coco_synth,
)
from probpose_pytorch_tpu.models.vit import ViTConfig

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


class TestMixedDataset:
    def test_concatenation_order_and_len(self):
        a = SyntheticPoseDataset(3, (64, 48), 5, seed=1)
        b = SyntheticPoseDataset(2, (64, 48), 5, seed=2)
        m = MixedPoseDataset([a, b])
        assert len(m) == 5
        np.testing.assert_array_equal(m[0]["image"], a[0]["image"])
        np.testing.assert_array_equal(m[3]["image"], b[0]["image"])

    def test_repeats_reweight(self):
        a = SyntheticPoseDataset(3, (64, 48), 5, seed=1)
        b = SyntheticPoseDataset(2, (64, 48), 5, seed=2)
        m = MixedPoseDataset([a, b], repeats=[1, 3])
        assert len(m) == 3 + 3 * 2
        # the last 3 repeats are b again
        np.testing.assert_array_equal(m[len(m) - 1]["image"], b[1]["image"])

    def test_keypoint_mismatch_rejected(self):
        a = SyntheticPoseDataset(2, (64, 48), 5, seed=1)
        b = SyntheticPoseDataset(2, (64, 48), 7, seed=2)
        with pytest.raises(ValueError, match="keypoint counts"):
            MixedPoseDataset([a, b])

    def test_validations(self):
        a = SyntheticPoseDataset(2, (64, 48), 5, seed=1)
        with pytest.raises(ValueError, match="no datasets"):
            MixedPoseDataset([])
        with pytest.raises(ValueError, match="repeats"):
            MixedPoseDataset([a], repeats=[1, 2])
        with pytest.raises(ValueError, match="repeats"):
            MixedPoseDataset([a], repeats=[0])


def test_mixed_cli_end_to_end(tmp_path):
    """Two on-disk COCO-format corpora mixed 1:2 through the train CLI."""
    from probpose_pytorch_tpu.data.mixed import build_mixed_datasets
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig
    from probpose_pytorch_tpu.train.cli import main as train_main

    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    generate_coco_synth(root_a, n_train_images=6, n_val_images=3, seed=0)
    generate_coco_synth(root_b, n_train_images=4, n_val_images=2, seed=5)

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=17, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        dataset_format="mixed",
        mixed_datasets=(
            {"root": str(root_a), "format": "coco", "repeat": 1},
            {"root": str(root_b), "format": "coco", "repeat": 2},
        ),
        epochs=1,
        train_batch_size=2,
        val_batch_size=2,
        val_every=1000,
        log_every=1,
        num_workers=1,
        out_dir=str(tmp_path / "run"),
    )
    # config round-trips with the mixed entries intact
    back = TrainConfig.from_json(cfg.to_json())
    assert back.mixed_datasets[1]["repeat"] == 2

    train, val = build_mixed_datasets(cfg)
    base_lens = [len(ds) for ds in train.datasets]
    assert len(train) == base_lens[0] + 2 * base_lens[1]
    assert len(val) > 0  # first member's val split

    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)
    out = tmp_path / "run"
    train_main([str(out), "--config", str(cfg_path), "--max-steps", "2"])
    assert "training/loss" in (out / "metrics.jsonl").read_text()
