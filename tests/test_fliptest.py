"""Flip-test TTA: mirror-averaging semantics and predictor wiring.

Under the codec's x_hm ∈ [0, W_hm−1] affine an array reverse along W is the
exact mirror (no sub-pixel shift), so a prediction averaged with its own
mirror must be a fixed point, and the predictor's flip_test path must equal
the manually-composed two-forward average.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.ops.augment import _swap_pairs, average_flip_pred

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)

PAIRS = ((1, 2), (3, 4))


def _fake_pred(rng, b=2, k=5, h=8, w=6):
    hm = jnp.asarray(rng.random((b, k, h, w), dtype=np.float32))
    scalars = [
        jnp.asarray(rng.random((b, k, 1, 1), dtype=np.float32))
        for _ in range(4)
    ]
    return (hm, *scalars)


def _mirror_pred(pred):
    """The model's output on mirrored crops IF the model were perfectly
    equivariant: heatmaps W-reversed with L/R channels swapped, scalars
    channel-swapped."""
    hm, *scalars = pred
    return (
        _swap_pairs(hm[..., ::-1], PAIRS),
        *[_swap_pairs(s, PAIRS) for s in scalars],
    )


def test_average_with_own_mirror_is_identity():
    pred = _fake_pred(np.random.default_rng(0))
    avg = average_flip_pred(pred, _mirror_pred(pred), PAIRS)
    for a, b in zip(avg, pred):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_average_is_mirror_equivariant():
    """TTA on a mirrored input is exactly the mirrored TTA output: on
    mirror(crops) the normal forward produces pred_f and the flipped forward
    produces pred, so avg(pred_f, pred) must equal mirror(avg(pred, pred_f))
    — guaranteeing flip-averaged predictions are left/right unbiased."""
    rng = np.random.default_rng(1)
    pred, pred_f = _fake_pred(rng), _fake_pred(rng)
    want = _mirror_pred(average_flip_pred(pred, pred_f, PAIRS))
    got = average_flip_pred(pred_f, pred, PAIRS)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_predictor_flip_test_matches_manual_average(tmp_path):
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.ops.preprocess import (
        crop_resize,
        untransform_keypoints,
    )
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
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    predictor = TopDownPredictor(
        model=trainer.model,
        variables=variables,
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
        flip_test=True,
        flip_pairs=PAIRS,
    )
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 90, 110, 3), dtype=np.uint8)
    boxes = np.array([[5, 5, 60, 70], [20, 10, 50, 60]], np.float32)
    out = predictor(frames, boxes)

    crops = crop_resize(
        jnp.asarray(frames), jnp.asarray(boxes), cfg.model.img_size,
        "bilinear_matmul",
    )
    pred = trainer.model.apply(variables, crops, train=False)
    pred_f = trainer.model.apply(variables, crops[:, :, ::-1, :], train=False)
    avg = average_flip_pred(pred, pred_f, PAIRS)
    (kpts, scores), probs, *_ = trainer.encode_codec.decode(avg)
    kpts = untransform_keypoints(kpts, jnp.asarray(boxes), cfg.model.img_size)
    np.testing.assert_allclose(
        out["keypoints"], np.asarray(kpts), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        out["probabilities"], np.asarray(probs), rtol=1e-5, atol=1e-5
    )

    # And it differs from the non-TTA output (the flip path actually ran).
    plain = TopDownPredictor(
        model=trainer.model,
        variables=variables,
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )(frames, boxes)
    assert np.abs(plain["keypoints"] - out["keypoints"]).max() > 1e-6
