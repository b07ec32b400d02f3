"""Multi-scale TTA (TopDownPredictor.scale_test).

Boxes re-crop at several area scales about their centers; each scale runs
the full forward + decode in its own crop geometry and predictions average
in FRAME space (different box geometries share no heatmap grid, so
coordinate-space averaging is the well-defined mean). Standard top-down
eval practice the reference lacks (its inference script is single-forward,
reference inference.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from probpose_pytorch_tpu.inference import TopDownPredictor, _scale_boxes
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


class TestScaleBoxes:
    def test_identity_at_unit_scale(self):
        boxes = jnp.asarray([[5.0, 7.0, 40.0, 60.0]])
        np.testing.assert_allclose(
            np.asarray(_scale_boxes(boxes, 1.0)), np.asarray(boxes)
        )

    def test_center_preserved(self):
        boxes = jnp.asarray([[10.0, 20.0, 30.0, 50.0]])
        out = np.asarray(_scale_boxes(boxes, 1.3))[0]
        cx, cy = 10 + 15, 20 + 25
        np.testing.assert_allclose(out[0] + out[2] / 2, cx, rtol=1e-6)
        np.testing.assert_allclose(out[1] + out[3] / 2, cy, rtol=1e-6)
        np.testing.assert_allclose(out[2], 30 * 1.3, rtol=1e-6)
        np.testing.assert_allclose(out[3], 50 * 1.3, rtol=1e-6)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir=str(tmp_path_factory.mktemp("run")),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 90, 110, 3), dtype=np.uint8)
    boxes = np.array([[5, 5, 60, 70], [20, 10, 50, 60]], np.float32)
    return cfg, trainer, variables, frames, boxes


def _predictor(cfg, trainer, variables, **kw):
    return TopDownPredictor(
        model=trainer.model,
        variables=variables,
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
        **kw,
    )


def test_unit_scale_equals_plain(setup):
    cfg, trainer, variables, frames, boxes = setup
    plain = _predictor(cfg, trainer, variables)(frames, boxes)
    unit = _predictor(cfg, trainer, variables, scale_test=(1.0,))(
        frames, boxes
    )
    for k in plain:
        np.testing.assert_allclose(unit[k], plain[k], rtol=1e-6, atol=1e-6)


def test_duplicate_scales_average_to_plain(setup):
    cfg, trainer, variables, frames, boxes = setup
    plain = _predictor(cfg, trainer, variables)(frames, boxes)
    dup = _predictor(cfg, trainer, variables, scale_test=(1.0, 1.0))(
        frames, boxes
    )
    for k in plain:
        np.testing.assert_allclose(dup[k], plain[k], rtol=1e-5, atol=1e-5)


def test_matches_manual_per_scale_average(setup):
    cfg, trainer, variables, frames, boxes = setup
    scales = (0.9, 1.0, 1.2)
    out = _predictor(cfg, trainer, variables, scale_test=scales)(
        frames, boxes
    )
    acc = None
    for s in scales:
        boxes_s = np.asarray(_scale_boxes(jnp.asarray(boxes), s))
        one = _predictor(cfg, trainer, variables)(frames, boxes_s)
        acc = (
            {k: v.astype(np.float64) for k, v in one.items()}
            if acc is None
            else {k: acc[k] + one[k] for k in acc}
        )
    for k in acc:
        np.testing.assert_allclose(
            out[k], acc[k] / len(scales), rtol=1e-4, atol=1e-4
        )
    # And the TTA output actually differs from single-scale.
    plain = _predictor(cfg, trainer, variables)(frames, boxes)
    assert np.abs(plain["keypoints"] - out["keypoints"]).max() > 1e-6


def test_unit_scores_mode(setup):
    """scale_test_scores="unit": keypoints still average across scales but
    the confidence fields come from the unit-scale forward."""
    cfg, trainer, variables, frames, boxes = setup
    scales = (0.9, 1.0, 1.2)
    mean_out = _predictor(
        cfg, trainer, variables, scale_test=scales,
        scale_test_scores="mean",
    )(frames, boxes)
    unit_out = _predictor(
        cfg, trainer, variables, scale_test=scales,
        scale_test_scores="unit",
    )(frames, boxes)
    plain = _predictor(cfg, trainer, variables)(frames, boxes)
    np.testing.assert_allclose(
        unit_out["keypoints"], mean_out["keypoints"], rtol=1e-5, atol=1e-5
    )
    for k in ("scores", "probabilities", "visibilities", "oks", "errors"):
        np.testing.assert_allclose(
            unit_out[k], plain[k], rtol=1e-5, atol=1e-5, err_msg=k
        )
    with pytest.raises(ValueError, match="scale_test_scores"):
        _predictor(cfg, trainer, variables, scale_test_scores="median")


def test_composes_with_flip_test(setup):
    cfg, trainer, variables, frames, boxes = setup
    out = _predictor(
        cfg, trainer, variables,
        scale_test=(0.9, 1.1), flip_test=True,
        flip_pairs=((1, 2), (3, 4)),
    )(frames, boxes)
    assert np.isfinite(out["keypoints"]).all()
    assert out["keypoints"].shape == (2, 5, 2)


def test_rejects_nonpositive_scale(setup):
    cfg, trainer, variables, frames, boxes = setup
    with pytest.raises(ValueError, match="scale_test"):
        _predictor(cfg, trainer, variables, scale_test=(0.0, 1.0))
