"""SimCC head family: codec round-trip, loss, training, and serving.

The SimCC family (models/simcc.py, codec_simcc.py, losses_simcc.py) is a
superset — the reference has only the 2-D ProbMap codecs — so these tests
use independent numpy oracles and internal-consistency bars rather than
reference parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.codec_simcc import (
    SimCCCodec,
    SimCCLabel,
    _axis_decode,
)
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer

ViTConfig.PRESETS.setdefault(
    "vit-tiny-e2e", dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0)
)


def _label(split=2.0, sigma=6.0, size=(48, 64)):
    # size = (in_w, in_h)
    return SimCCLabel(size, split_ratio=split, sigma=sigma,
                      sigmas=(0.05,) * 5)


class TestCodec:
    def test_labels_normalized(self):
        lab = _label()
        rng = np.random.default_rng(0)
        kpts = rng.uniform((2, 2), (46, 62), (3, 5, 2)).astype(np.float32)
        enc = lab.encode(jnp.asarray(kpts))
        np.testing.assert_allclose(
            np.asarray(enc["x_labels"]).sum(-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(enc["y_labels"]).sum(-1), 1.0, atol=1e-5
        )

    def test_encode_decode_round_trip(self):
        """encode -> decode recovers keypoints to sub-bin precision."""
        lab = _label()
        rng = np.random.default_rng(1)
        kpts = rng.uniform((3, 3), (45, 61), (4, 5, 2)).astype(np.float32)
        enc = lab.encode(jnp.asarray(kpts))
        dec, scores = lab.decode_axis_pair(
            jnp.log(enc["x_labels"] + 1e-12),
            jnp.log(enc["y_labels"] + 1e-12),
        )
        err = np.abs(np.asarray(dec) - kpts).max()
        assert err < 0.5 / lab.split_ratio, err
        assert (np.asarray(scores) > 0).all()

    def test_axis_decode_subpixel(self):
        """A clean Gaussian peaked at a fractional bin decodes to it."""
        bins = np.arange(96, dtype=np.float32)
        for center in (17.3, 40.0, 63.7):
            logits = -((bins - center) ** 2) / (2 * 5.0**2)
            coord, score = _axis_decode(jnp.asarray(logits)[None, None])
            assert abs(float(coord[0, 0]) - center) < 0.05
            assert float(score[0, 0]) > 0

    def test_off_image_keypoints_zero_weight(self):
        lab = _label()
        kpts = np.array([[[-5.0, 10.0], [20.0, 30.0], [100.0, 10.0],
                          [10.0, 20.0], [30.0, 70.0]]], np.float32)
        enc = lab.encode(jnp.asarray(kpts))
        w = np.asarray(enc["keypoint_weights"])[0]
        np.testing.assert_array_equal(w, [0, 1, 0, 1, 0])

    def test_facade_decode_contract(self):
        """SimCCCodec.decode returns the Codec facade's shapes."""
        lab = _label()
        codec = SimCCCodec(lab)
        B, K = 2, 5
        Wb, Hb = lab.bins
        rng = np.random.default_rng(2)
        pred = (
            (jnp.asarray(rng.normal(size=(B, K, Wb)), jnp.float32),
             jnp.asarray(rng.normal(size=(B, K, Hb)), jnp.float32)),
            *[jnp.asarray(rng.uniform(size=(B, K, 1, 1)), jnp.float32)
              for _ in range(4)],
        )
        (kpts, scores), probs, vis, oks, errs = codec.decode(pred)
        assert kpts.shape == (B, K, 2) and scores.shape == (B, K)
        for t in (probs, vis, oks, errs):
            assert t.shape == (B, 1, K)
        # errors normalized by the bin diagonal
        assert float(jnp.max(errs)) <= 1.0 / np.sqrt(Wb**2 + Hb**2) + 1e-6


class TestMirror:
    def test_mirror_x_bins_delta(self):
        from probpose_pytorch_tpu.ops.augment import _mirror_x_bins

        split = 2
        Wb = 16
        for b in range(Wb - split + 1):
            p = np.zeros((1, 1, Wb), np.float32)
            p[0, 0, b] = 1.0
            m = np.asarray(_mirror_x_bins(jnp.asarray(p), split))
            want = Wb - split - b
            assert m[0, 0, want] == pytest.approx(1.0), (b, want)

    def test_flip_average_own_mirror_fixed_point(self):
        """Averaging a SimCC pred with its own perfect mirror reproduces
        the original distributions (the flip-test identity bar)."""
        from probpose_pytorch_tpu.ops.augment import (
            _mirror_x_bins,
            _swap_pairs,
            average_flip_pred_simcc,
        )

        pairs = ((1, 2), (3, 4))
        split = 2
        rng = np.random.default_rng(3)
        # Keep mass off the last split-1 bins so the mirror is lossless.
        x = rng.normal(size=(2, 5, 32)).astype(np.float32)
        x[..., -(split - 1):] = -30.0
        y = rng.normal(size=(2, 5, 24)).astype(np.float32)
        scalars = [
            jnp.asarray(rng.uniform(size=(2, 5, 1, 1)), jnp.float32)
            for _ in range(4)
        ]
        pred = ((jnp.asarray(x), jnp.asarray(y)), *scalars)
        px = jax.nn.softmax(jnp.asarray(x), axis=-1)
        py = jax.nn.softmax(jnp.asarray(y), axis=-1)
        # the model's output on mirrored crops IF perfectly equivariant
        mirror_x = jnp.log(
            _swap_pairs(_mirror_x_bins(px, split), pairs) + 1e-12
        )
        mirror_y = jnp.log(_swap_pairs(py, pairs) + 1e-12)
        pred_f = (
            (mirror_x, mirror_y),
            *[_swap_pairs(s, pairs) for s in scalars],
        )
        avg = average_flip_pred_simcc(pred, pred_f, pairs, split)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(avg[0][0], axis=-1)),
            np.asarray(px), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(avg[0][1], axis=-1)),
            np.asarray(py), atol=1e-4,
        )
        for a, s in zip(avg[1:], scalars):
            np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                                       atol=1e-6)


def _simcc_cfg(tmp_path, **overrides):
    base = dict(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            head_type="simcc", compute_dtype="float32",
            pool_sizes=((2, 2), (2, 2)), simcc_sigma=4.0,
        ),
        epochs=1, train_batch_size=4, val_batch_size=4,
        out_dir=str(tmp_path / "run"),
    )
    base.update(overrides)
    return TrainConfig(**base)


class TestTraining:
    def test_train_and_eval_step(self, tmp_path):
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )

        cfg = _simcc_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=2)
        ds = SyntheticPoseDataset(8, cfg.model.img_size, 5, seed=0)
        batch = next(iter(batch_iterator(ds, 4, shuffle=False,
                                         num_workers=1)))
        state, m = trainer.train_step(trainer.state, batch)
        assert np.isfinite(float(m["loss"]))
        for term in ("kpt", "probability", "visibility", "oks", "error"):
            assert np.isfinite(float(m[f"loss/{term}"])), term
        ev = trainer.eval_step(state, trainer._device_batch(batch))
        assert np.isfinite(float(ev["loss"]))
        assert np.isfinite(float(ev["acc/kpt"]))

    def test_kpt_loss_learns(self, tmp_path):
        """The localization term drops markedly when overfitting one
        batch — the family actually learns, not just runs."""
        from probpose_pytorch_tpu.data import (
            SyntheticPoseDataset,
            batch_iterator,
        )

        from probpose_pytorch_tpu.train.config import OptimConfig

        cfg = _simcc_cfg(
            tmp_path,
            optim=OptimConfig(peak_lr=3e-3, schedule="constant"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=80)
        ds = SyntheticPoseDataset(4, cfg.model.img_size, 5, seed=0)
        batch = next(iter(batch_iterator(ds, 4, shuffle=False,
                                         num_workers=1)))
        state = trainer.state
        first = None
        for _ in range(80):
            state, m = trainer.train_step(state, batch)
            if first is None:
                first = float(m["loss/kpt"])
        last = float(m["loss/kpt"])
        assert last < first * 0.6, (first, last)


class TestPredictor:
    def _predictor(self, tmp_path, **kw):
        from probpose_pytorch_tpu.inference import TopDownPredictor

        cfg = _simcc_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        return TopDownPredictor(
            model=trainer.model,
            variables=variables,
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
            **kw,
        )

    def test_predict_shapes(self, tmp_path):
        p = self._predictor(tmp_path, return_heatmaps=True)
        rng = np.random.default_rng(4)
        frames = rng.integers(0, 256, (2, 90, 110, 3), dtype=np.uint8)
        boxes = np.array([[5, 5, 60, 70], [20, 10, 50, 60]], np.float32)
        out = p(frames, boxes)
        assert out["keypoints"].shape == (2, 5, 2)
        assert out["scores"].shape == (2, 5)
        assert out["probabilities"].shape == (2, 1, 5)
        # outer-product heatmap rendering at bin resolution (Hb, Wb):
        # crop (64, 48) at split 2 -> 128 x 96
        assert out["heatmaps"].shape == (2, 5, 128, 96)
        assert np.isfinite(out["keypoints"]).all()

    def test_tta_composes(self, tmp_path):
        p = self._predictor(
            tmp_path, flip_test=True, flip_pairs=((1, 2), (3, 4)),
            scale_test=(0.9, 1.1),
        )
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (2, 90, 110, 3), dtype=np.uint8)
        boxes = np.array([[5, 5, 60, 70], [20, 10, 50, 60]], np.float32)
        out = p(frames, boxes)
        assert np.isfinite(out["keypoints"]).all()
        assert out["keypoints"].shape == (2, 5, 2)


class TestBundle:
    def test_bundle_roundtrip(self, tmp_path):
        """A SimCC predictor exports to a StableHLO bundle and reloads
        with exact output parity (the deployment path is head-agnostic)."""
        from probpose_pytorch_tpu.serve import (
            ServingBundle,
            export_predictor_bundle,
        )

        p = TestPredictor()._predictor(tmp_path)
        out = export_predictor_bundle(
            p, tmp_path / "bundle", buckets=(2,), frame_shape=(96, 112),
        )
        bundle = ServingBundle.load(out)
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (2, 90, 110, 3), dtype=np.uint8)
        boxes = np.array([[5, 5, 60, 70], [20, 10, 50, 60]], np.float32)
        live = p(frames, boxes)
        exported = bundle(frames, boxes)
        assert set(live) == set(exported)
        for k in live:
            np.testing.assert_allclose(
                exported[k], live[k], rtol=1e-6, atol=1e-6, err_msg=k
            )
        import json as _json

        manifest = _json.loads((out / "manifest.json").read_text())
        assert manifest["scale_test"] == []


class TestMeshServing:
    def test_dp_mesh_matches_single_device(self, tmp_path):
        """SimCC serving on an 8-way dp mesh == single-device."""
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.parallel import make_mesh

        cfg = _simcc_cfg(tmp_path)
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        rng = np.random.default_rng(9)
        frames = rng.integers(0, 256, (8, 90, 110, 3), dtype=np.uint8)
        boxes = rng.uniform(
            [0, 0, 40, 50], [20, 20, 60, 60], (8, 4)
        ).astype(np.float32)

        def predictor(**kw):
            return TopDownPredictor(
                model=trainer.model, variables=variables,
                codec=trainer.encode_codec, input_size=cfg.model.img_size,
                **kw,
            )

        single = predictor()(frames, boxes)
        meshed = predictor(mesh=make_mesh(8, model_parallel=1))(
            frames, boxes
        )
        for k in single:
            np.testing.assert_allclose(
                meshed[k], single[k], rtol=1e-5, atol=1e-5, err_msg=k
            )


def test_learn_from_zeros_masks_out_of_image_keypoints():
    """learn_heatmaps_from_zeros must NOT give CE weight to annotated
    out-of-image keypoints: their truncated 1-D Gaussians renormalize into
    a confident edge spike (a softmax head cannot represent the ProbMap
    analogue's all-zero target), which would train systematic edge bias."""
    import jax.numpy as jnp

    from probpose_pytorch_tpu.codec_simcc import SimCCCodec
    from probpose_pytorch_tpu.losses_simcc import SimCCLoss

    from probpose_pytorch_tpu.codec_simcc import SimCCLabel
    codec = SimCCCodec(SimCCLabel((32, 24), sigmas=np.full(2, 0.05)))
    loss_fn = SimCCLoss(codec)
    # one in-image keypoint, one annotated keypoint OUTSIDE the crop
    kpts = jnp.asarray([[[10.0, 10.0], [-7.0, 12.0]]])
    gt = dict(
        codec.encode(kpts, jnp.ones((1, 2))),
        keypoints_visible=jnp.ones((1, 2)),
    )
    Wb, Hb = codec.label.bins
    rng = np.random.default_rng(0)
    pred = (
        (
            jnp.asarray(rng.normal(size=(1, 2, Wb)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, 2, Hb)), jnp.float32),
        ),
        jnp.full((1, 2), 0.5),
        jnp.full((1, 2), 0.5),
        jnp.zeros((1, 2)),
        jnp.zeros((1, 2)),
    )
    base = loss_fn(gt, pred, learn_heatmaps_from_zeros=True)

    # perturb ONLY the out-of-image keypoint's logits: the kpt CE must not
    # move (weight 0), while the default weighting path also gives it 0
    # weight (keypoint_weights = vis * in_image)
    (dx, dy), *rest = pred
    dx2 = dx.at[0, 1].add(3.0)
    moved = loss_fn(gt, ((dx2, dy), *rest), learn_heatmaps_from_zeros=True)
    np.testing.assert_allclose(
        float(base["kpt"]), float(moved["kpt"]), rtol=1e-6
    )
