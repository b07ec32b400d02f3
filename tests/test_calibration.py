"""Confidence-calibration metrics: units + eval-pipeline integration.

The calibration surface is greenfield vs the reference (SURVEY §2.4): the
reference thresholds presence probability at 0.9 (inference.py:64-66) but
never measures whether that 0.9 means anything. These tests pin the metric
definitions (ECE/MCE/Brier/NLL against hand-computable fixtures), the
temperature-scaling MLE (recovers a known distortion), and the plumbing
through evaluate_topdown / the eval CLI.
"""

import json

import numpy as np
import pytest

from probpose_pytorch_tpu.eval.calibration import (
    apply_temperature,
    brier_score,
    calibration_report,
    expected_calibration_error,
    fit_temperature,
    max_calibration_error,
    nll,
    reliability_bins,
)


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


class TestBinsAndECE:
    def test_hand_computed_two_bins(self):
        # Two bins (n_bins=2): low bin p=[0.1,0.3] y=[0,1]; high bin
        # p=[0.8,0.8] y=[1,1].  ECE = 0.5*|0.5-0.2| + 0.5*|1.0-0.8| = 0.25.
        p = np.array([0.1, 0.3, 0.8, 0.8])
        y = np.array([0.0, 1.0, 1.0, 1.0])
        b = reliability_bins(p, y, n_bins=2)
        np.testing.assert_allclose(b["count"], [2, 2])
        np.testing.assert_allclose(b["confidence"], [0.2, 0.8])
        np.testing.assert_allclose(b["accuracy"], [0.5, 1.0])
        assert expected_calibration_error(p, y, 2) == pytest.approx(0.25)
        assert max_calibration_error(p, y, 2) == pytest.approx(0.3)

    def test_p_equal_one_lands_in_last_bin(self):
        b = reliability_bins(np.array([1.0]), np.array([1.0]), n_bins=15)
        assert b["count"][-1] == 1 and b["count"].sum() == 1

    def test_empty_bins_are_nan_and_ignored(self):
        p = np.array([0.95, 0.97])
        y = np.array([1.0, 1.0])
        b = reliability_bins(p, y, n_bins=10)
        assert np.isnan(b["confidence"][0])
        # ECE over only the populated bin
        assert expected_calibration_error(p, y, 10) == pytest.approx(
            abs(1.0 - 0.96)
        )

    def test_perfectly_calibrated_large_sample(self):
        rng = np.random.default_rng(0)
        p = rng.uniform(0.02, 0.98, 200_000)
        y = (rng.uniform(size=p.shape) < p).astype(np.float64)
        assert expected_calibration_error(p, y) < 0.01

    def test_brier_and_nll_fixtures(self):
        p = np.array([0.5, 0.5])
        y = np.array([1.0, 0.0])
        assert brier_score(p, y) == pytest.approx(0.25)
        assert nll(p, y) == pytest.approx(np.log(2.0))

    def test_nll_finite_at_saturated_probs(self):
        # f32-saturated device outputs must not produce inf/NaN host metrics.
        p = np.array([1.0, 0.0, 1.0])
        y = np.array([1.0, 0.0, 0.0])  # last one is a confident miss
        v = nll(p, y)
        assert np.isfinite(v) and v > 1.0


class TestTemperature:
    def test_identity_temperature_is_noop(self):
        p = np.linspace(0.05, 0.95, 19)
        np.testing.assert_allclose(apply_temperature(p, 1.0), p, atol=1e-12)

    def test_apply_softens_toward_half(self):
        p = np.array([0.05, 0.9, 0.99])
        q = apply_temperature(p, 3.0)
        assert np.all(np.abs(q - 0.5) < np.abs(p - 0.5))
        # and sharpens for T < 1
        r = apply_temperature(p, 0.5)
        assert np.all(np.abs(r - 0.5) > np.abs(p - 0.5))

    def test_recovers_known_distortion(self):
        # Labels drawn from sigmoid(z); model reports sigmoid(2z)
        # (overconfident by 2x in logit space) -> fitted T ~= 2.
        rng = np.random.default_rng(1)
        z = rng.normal(0.0, 2.0, 100_000)
        y = (rng.uniform(size=z.shape) < _sigmoid(z)).astype(np.float64)
        p_over = _sigmoid(2.0 * z)
        t = fit_temperature(p_over, y)
        assert t == pytest.approx(2.0, rel=0.05)
        # scaling with the fitted T improves both NLL and ECE
        p_fixed = apply_temperature(p_over, t)
        assert nll(p_fixed, y) < nll(p_over, y)
        assert (
            expected_calibration_error(p_fixed, y)
            < expected_calibration_error(p_over, y)
        )

    def test_calibrated_input_keeps_t_near_one(self):
        rng = np.random.default_rng(2)
        z = rng.normal(0.0, 1.5, 50_000)
        y = (rng.uniform(size=z.shape) < _sigmoid(z)).astype(np.float64)
        assert fit_temperature(_sigmoid(z), y) == pytest.approx(1.0, abs=0.05)

    def test_degenerate_inputs_return_identity(self):
        assert fit_temperature(np.array([]), np.array([])) == 1.0
        # single-class labels: T is unidentifiable, keep 1.0
        assert fit_temperature(np.array([0.7, 0.8]), np.array([1.0, 1.0])) == 1.0


class TestReport:
    def test_report_keys_and_json_roundtrip(self):
        rng = np.random.default_rng(3)
        p = rng.uniform(0.01, 0.99, 500)
        y = (rng.uniform(size=p.shape) < p).astype(np.float64)
        rep = calibration_report(p, y)
        assert rep["n"] == 500
        assert 0.0 <= rep["positive_rate"] <= 1.0
        for k in ("ece", "mce", "brier", "nll", "temperature",
                  "ece_scaled", "nll_scaled"):
            assert np.isfinite(rep[k]), k
        # bins serialize (NaN -> None) so --calibration-dump can json.dumps
        s = json.dumps(rep)
        assert json.loads(s)["n"] == 500


class TestReliabilityDiagram:
    def test_renders_png(self, tmp_path):
        from probpose_pytorch_tpu.viz import reliability_diagram

        rng = np.random.default_rng(4)
        p = rng.uniform(0.01, 0.99, 2000)
        y = (rng.uniform(size=p.shape) < p ** 2).astype(np.float64)
        b = reliability_bins(p, y)
        img = reliability_diagram(b, title="presence")
        assert img.size[0] >= 300 and img.size[1] > img.size[0] // 2
        img.save(tmp_path / "rel.png")
        assert (tmp_path / "rel.png").stat().st_size > 500
        # JSON-roundtripped bins (NaN -> None) render identically
        rep = calibration_report(p, y)
        dumped = json.loads(json.dumps(rep["bins"]))
        img2 = reliability_diagram(dumped, title="presence")
        assert np.array_equal(np.asarray(img), np.asarray(img2))
        # and a histogram with empty bins doesn't crash
        reliability_diagram(
            reliability_bins(np.array([0.95]), np.array([1.0]))
        )


class TestPredictorTemperature:
    def test_in_jit_rescale_matches_host(self):
        """TopDownPredictor(calibration=...) must rescale probabilities /
        visibilities exactly like the host-side apply_temperature (up to
        f32), leaving every other output untouched."""
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5, backbone="vit-nano",
                compute_dtype="float32", deconv_out_channels=(8, 8),
                deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        common = dict(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )
        plain = TopDownPredictor(**common)
        scaled = TopDownPredictor(
            **common, calibration={"presence": 2.5, "visibility": 0.5}
        )
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (2, 120, 160, 3), dtype=np.uint8)
        boxes = np.array(
            [[10, 10, 80, 60], [30, 20, 90, 70]], np.float32
        )
        a, b = plain(frames, boxes), scaled(frames, boxes)
        np.testing.assert_allclose(
            np.asarray(b["probabilities"]),
            apply_temperature(np.asarray(a["probabilities"]), 2.5),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(b["visibilities"]),
            apply_temperature(np.asarray(a["visibilities"]), 0.5),
            atol=1e-6,
        )
        for k in ("keypoints", "scores", "oks", "errors"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )

    def test_bad_calibration_rejected(self):
        from probpose_pytorch_tpu.inference import TopDownPredictor

        with pytest.raises(ValueError, match="unknown calibration"):
            TopDownPredictor(
                model=None, variables={}, codec=None, input_size=(64, 48),
                calibration={"scores": 2.0},
            )
        with pytest.raises(ValueError, match="positive finite"):
            TopDownPredictor(
                model=None, variables={}, codec=None, input_size=(64, 48),
                calibration={"presence": 0.0},
            )


class TestPipelineIntegration:
    def test_evaluate_topdown_reports_calibration(self, tmp_path):
        """An oracle predictor with a deliberately miscalibrated presence
        branch: evaluate_topdown(calibration=True) must report a large
        presence ECE and a visibility report keyed off COCO v==2."""
        import PIL.Image

        from probpose_pytorch_tpu.codec import ProbMap
        from probpose_pytorch_tpu.data.coco import (
            COCO_SIGMAS,
            COCOPoseDataset,
        )
        from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rng = np.random.default_rng(5)
        images, annotations = [], []
        for i in range(4):
            arr = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
            PIL.Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
            images.append(
                dict(id=i, file_name=f"{i:06d}.jpg", width=160, height=120)
            )
            kps = rng.uniform([30, 30], [120, 100], (17, 2))
            v = rng.integers(1, 3, 17)  # all labeled; mix of v=1 and v=2
            flat = np.concatenate([kps, v[:, None]], 1).reshape(-1).tolist()
            annotations.append(
                dict(id=100 + i, image_id=i, category_id=1, keypoints=flat,
                     num_keypoints=17, bbox=[25.0, 25.0, 100.0, 80.0],
                     area=8000.0, iscrowd=0)
            )
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(
            json.dumps(dict(images=images, annotations=annotations))
        )
        ds = COCOPoseDataset(ann_file, img_dir, (64, 48), min_keypoints=1)
        pm = ProbMap((48, 64), (48, 64), sigmas=COCO_SIGMAS)

        import jax.numpy as jnp

        class Oracle:
            input_size = (64, 48)

            def __call__(self, crops, boxes):
                i = getattr(self, "_i", 0)
                samples = [
                    ds[min(i + j, len(ds) - 1)] for j in range(len(crops))
                ]
                self._i = i + len(crops)
                kpts = np.stack([s["keypoints"] for s in samples])
                vis = np.stack([s["keypoints_visible"] for s in samples])
                enc = pm.encode(jnp.asarray(kpts), jnp.asarray(vis))
                dec, scores = pm.decode(enc["heatmaps"])
                K = kpts.shape[1]
                return dict(
                    keypoints=np.asarray(dec),
                    scores=np.asarray(scores),
                    # Miscalibrated presence: everything truly in-crop, but
                    # the branch claims 0.6.
                    probabilities=np.full((len(crops), 1, K), 0.6),
                    # Perfectly confident visibility, half right by design.
                    visibilities=np.full((len(crops), 1, K), 1.0),
                )

        res = evaluate_topdown(
            Oracle(), ds, batch_size=2, sigmas=COCO_SIGMAS, calibration=True
        )
        cal = res["calibration"]
        pres = cal["presence"]
        # all labeled GT lie inside their own bbox -> positive rate 1.0;
        # reported p=0.6 -> ECE = 0.4 exactly
        assert pres["positive_rate"] == pytest.approx(1.0)
        assert pres["ece"] == pytest.approx(0.4, abs=1e-6)
        # one-class labels -> temperature unidentifiable, identity kept
        assert pres["temperature"] == 1.0
        vis_rep = cal["visibility"]
        # v sampled from {1,2}: positive rate strictly inside (0,1), and a
        # constant p=1.0 branch is overconfident by exactly 1 - rate
        assert 0.0 < vis_rep["positive_rate"] < 1.0
        assert vis_rep["ece"] == pytest.approx(
            1.0 - vis_rep["positive_rate"], abs=1e-6
        )
        # default path stays lean: no calibration key without the flag
        res_plain = evaluate_topdown(
            Oracle(), ds, batch_size=2, sigmas=COCO_SIGMAS
        )
        assert "calibration" not in res_plain


def test_balanced_accuracy_signal_and_chance():
    from probpose_pytorch_tpu.eval.calibration import balanced_accuracy

    rng = np.random.default_rng(0)
    y = (rng.random(4000) < 0.85).astype(np.float64)  # imbalanced positives
    # perfectly separable scores -> 1.0 at any threshold between the bands
    p_sep = np.where(y > 0.5, 0.8, 0.2)
    assert balanced_accuracy(p_sep, y) == 1.0
    # a constant prediction carries no signal -> NaN-safe chance behavior
    p_const = np.full_like(y, 0.5)
    ba = balanced_accuracy(p_const, y)
    assert abs(ba - 0.5) < 0.02
    # random scores -> ~0.5 regardless of the 85% positive rate (the trap
    # plain accuracy falls into)
    p_rand = rng.random(len(y))
    assert abs(balanced_accuracy(p_rand, y) - 0.5) < 0.05


def test_calibration_report_includes_balanced_acc():
    from probpose_pytorch_tpu.eval.calibration import calibration_report

    rng = np.random.default_rng(1)
    y = (rng.random(500) < 0.7).astype(np.float64)
    p = np.clip(0.6 * y + 0.2 + rng.normal(0, 0.1, len(y)), 0.01, 0.99)
    rep = calibration_report(p, y)
    assert 0.5 < rep["balanced_acc"] <= 1.0
