"""COCO loader + AP evaluator tests with a synthetic mini-COCO fixture."""

import json

import numpy as np
import pytest

from probpose_pytorch_tpu.data.coco import (
    COCO_SIGMAS,
    COCOPoseDataset,
    expand_bbox,
    parse_coco_annotations,
)
from probpose_pytorch_tpu.eval.coco_eval import (
    COCOKeypointEvaluator,
    oks_matrix,
)


@pytest.fixture
def mini_coco(tmp_path):
    import PIL.Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        arr = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        images.append(dict(id=i, file_name=f"{i:06d}.jpg", width=160, height=120))
        kps = rng.uniform([30, 30], [120, 100], (17, 2))
        v = rng.integers(0, 3, 17)
        flat = np.concatenate([kps, v[:, None]], 1).reshape(-1).tolist()
        annotations.append(
            dict(
                id=100 + i,
                image_id=i,
                category_id=1,
                keypoints=flat,
                num_keypoints=int((v > 0).sum()),
                bbox=[25.0, 25.0, 100.0, 80.0],
                area=8000.0,
                iscrowd=0,
            )
        )
    # Ignore-region annotations: a crowd on image 0 and a zero-keypoint
    # instance on image 1 — not crop samples, but eval must see them.
    annotations.append(
        dict(
            id=200, image_id=0, category_id=1,
            keypoints=[0.0] * 51, num_keypoints=0,
            bbox=[5.0, 5.0, 40.0, 40.0], area=1600.0, iscrowd=1,
        )
    )
    annotations.append(
        dict(
            id=201, image_id=1, category_id=1,
            keypoints=[0.0] * 51, num_keypoints=0,
            bbox=[100.0, 10.0, 30.0, 30.0], area=900.0, iscrowd=0,
        )
    )
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(dict(images=images, annotations=annotations)))
    return ann_file, img_dir


class TestCOCOData:
    def test_parse_and_dataset(self, mini_coco):
        ann_file, img_dir = mini_coco
        recs = parse_coco_annotations(ann_file, img_dir)
        assert len(recs) == 3
        ds = COCOPoseDataset(ann_file, img_dir, (256, 192))
        s = ds[0]
        assert s["image"].shape == (256, 192, 3)
        assert s["keypoints"].shape == (17, 2)
        assert s["keypoints_visible"].shape == (17,)

    def test_ignore_regions_survive_parsing(self, mini_coco):
        """Crowds and zero-keypoint instances are excluded from crop samples
        but preserved as per-image ignore records for evaluation."""
        ann_file, img_dir = mini_coco
        recs, ignores = parse_coco_annotations(
            ann_file, img_dir, include_ignore=True
        )
        assert len(recs) == 3 and len(ignores) == 2
        ds = COCOPoseDataset(ann_file, img_dir, (64, 48))
        assert len(ds) == 3  # ignore records are not samples
        assert set(ds.ignores_by_image) == {0, 1}
        crowd = ds.ignores_by_image[0][0]
        assert crowd["iscrowd"] and crowd["area"] == 1600.0
        assert not ds.ignores_by_image[1][0]["iscrowd"]
        assert crowd["keypoints"].shape == (17, 3)

    def test_expand_bbox_aspect(self):
        box = expand_bbox(np.array([0, 0, 100, 50], np.float32), 1.25, 0.75)
        # padded to 0.75 aspect then scaled: w=100 -> h=133.3, *1.25
        assert box[2] == pytest.approx(125.0)
        assert box[3] == pytest.approx(100 / 0.75 * 1.25)
        # center preserved
        assert box[0] + box[2] / 2 == pytest.approx(50.0)


class TestOKSMatrix:
    def test_perfect_match_is_one(self):
        rng = np.random.default_rng(1)
        gt = np.concatenate(
            [rng.uniform(0, 100, (2, 17, 2)), np.full((2, 17, 1), 2.0)], -1
        )
        dt = gt.copy()
        m = oks_matrix(dt, gt, np.array([4000.0, 4000.0]), COCO_SIGMAS)
        np.testing.assert_allclose(np.diag(m), 1.0)

    def test_distance_decreases_oks(self):
        gt = np.concatenate(
            [np.full((1, 17, 2), 50.0), np.full((1, 17, 1), 2.0)], -1
        )
        near = gt.copy()
        near[..., :2] += 2.0
        far = gt.copy()
        far[..., :2] += 30.0
        m_near = oks_matrix(near, gt, np.array([4000.0]), COCO_SIGMAS)[0, 0]
        m_far = oks_matrix(far, gt, np.array([4000.0]), COCO_SIGMAS)[0, 0]
        assert m_near > m_far


class TestEvaluator:
    def _gt(self, rng, n):
        kpts = rng.uniform(20, 200, (n, 17, 2))
        v = np.full((n, 17, 1), 2.0)
        return np.concatenate([kpts, v], -1)

    def test_perfect_predictions_ap1(self):
        rng = np.random.default_rng(2)
        ev = COCOKeypointEvaluator(COCO_SIGMAS)
        for _ in range(4):
            gt = self._gt(rng, 3)
            dt = gt.copy()
            dt[..., 2] = 0.9
            ev.add_image(dt, np.full(3, 0.9), gt, np.full(3, 5000.0))
        res = ev.summarize()
        assert res["AP"] == pytest.approx(1.0)
        assert res["AR"] == pytest.approx(1.0)

    def test_garbage_predictions_ap0(self):
        rng = np.random.default_rng(3)
        ev = COCOKeypointEvaluator(COCO_SIGMAS)
        for _ in range(4):
            gt = self._gt(rng, 2)
            dt = gt.copy()
            dt[..., :2] += 500.0
            ev.add_image(dt, np.full(2, 0.9), gt, np.full(2, 5000.0))
        res = ev.summarize()
        assert res["AP"] == pytest.approx(0.0, abs=1e-6)

    def test_half_good_monotonic(self):
        rng = np.random.default_rng(4)
        ev = COCOKeypointEvaluator(COCO_SIGMAS)
        for i in range(6):
            gt = self._gt(rng, 1)
            dt = gt.copy()
            if i % 2:
                dt[..., :2] += 500.0
            # good detections score higher -> clean PR curve
            ev.add_image(dt, np.full(1, 0.9 if i % 2 == 0 else 0.5),
                         gt, np.full(1, 5000.0))
        res = ev.summarize()
        assert 0.4 < res["AP"] <= 0.51
        assert res["AR"] == pytest.approx(0.5)


class TestEvalPipeline:
    def test_oracle_predictor_gets_high_ap(self, mini_coco):
        """A 'predictor' that decodes the GT-encoded heatmaps must score
        AP ~1 through the full streaming pipeline (crop->decode->untransform
        ->match)."""
        import jax.numpy as jnp

        from probpose_pytorch_tpu.codec import ProbMap
        from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown

        ann_file, img_dir = mini_coco
        ds = COCOPoseDataset(ann_file, img_dir, (64, 48), min_keypoints=1)
        pm = ProbMap((48, 64), (48, 64), sigmas=COCO_SIGMAS)

        class OracleRoundTrip:
            input_size = (64, 48)

            def __call__(self, crops, boxes):
                i = getattr(self, "_i", 0)
                samples = [ds[min(i + j, len(ds) - 1)] for j in range(len(crops))]
                self._i = i + len(crops)
                kpts = np.stack([s["keypoints"] for s in samples])
                vis = np.stack([s["keypoints_visible"] for s in samples])
                enc = pm.encode(jnp.asarray(kpts), jnp.asarray(vis))
                dec, scores = pm.decode(enc["heatmaps"])
                return dict(
                    keypoints=np.asarray(dec),
                    scores=np.asarray(scores),
                    probabilities=np.ones((len(crops), 1, kpts.shape[1])),
                )

        res = evaluate_topdown(OracleRoundTrip(), ds, batch_size=2,
                               sigmas=COCO_SIGMAS, per_joint=True)
        assert res["AP"] > 0.95, res
        assert res["AR"] > 0.95, res
        # instance-matched auxiliary metrics: round-tripped keypoints land
        # within a few px (codec quantization), PCK@0.2 is perfect
        assert res["EPE"] < 5.0, res
        assert res["PCK@0.2"] == pytest.approx(1.0), res
        assert res["AUC"] > 0.9, res
        # per-joint breakdown: COCO-17 names, counts sum to the labeled
        # total, and the count-weighted mean EPE reproduces the overall EPE
        pj = res["per_joint"]
        from probpose_pytorch_tpu.data.coco import COCO_KEYPOINT_NAMES

        assert set(pj) <= set(COCO_KEYPOINT_NAMES)
        n_total = sum(r["n"] for r in pj.values())
        w_epe = sum(r["n"] * r["EPE"] for r in pj.values()) / n_total
        assert w_epe == pytest.approx(res["EPE"], rel=1e-6)
        assert all(r["PCK@0.2"] == pytest.approx(1.0) for r in pj.values())


def test_eval_cli_runs(mini_coco, tmp_path, capsys):
    """Full eval CLI path: tiny model checkpoint -> COCO AP JSON line."""
    from probpose_pytorch_tpu.eval.run import main as eval_main
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    ViTConfig.PRESETS.setdefault(
        "vit-tiny-eval", dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0)
    )
    ann_file, img_dir = mini_coco
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=17, backbone="vit-tiny-eval",
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

    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rec) >= {"AP", "AP50", "AR"}
    assert 0.0 <= rec["AP"] <= 1.0 or rec["AP"] == -1.0

    # Data-parallel eval over the 8-device mesh: identical metrics (the
    # batch is rounded up to a device-count multiple and the predictor
    # shards it over the dp mesh).
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--data-parallel",
    ])
    rec_dp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k, v in rec.items():
        assert rec_dp[k] == pytest.approx(v, abs=1e-6), k

    # TTA flags plumb through the CLI (flip + multi-scale compose).
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--flip-test",
        "--scale-test", "0.9,1.1",
    ])
    rec_tta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rec_tta) >= {"AP", "AP50", "AR"}

    # Per-joint breakdown prints named rows after the JSON line.
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--per-joint",
    ])
    pj_out = capsys.readouterr().out.strip().splitlines()
    assert any("left_shoulder" in ln and "EPE=" in ln for ln in pj_out)
    assert any("<- worst" in ln for ln in pj_out)

    # Calibration reporting: branch metrics land in the JSON line and the
    # full reliability report dumps to disk.
    cal_dump = tmp_path / "cal.json"
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--calibration",
        "--calibration-dump", str(cal_dump),
    ])
    cal_out = capsys.readouterr().out.strip().splitlines()
    rec_cal = json.loads([ln for ln in cal_out if ln.startswith("{")][-1])
    assert "ece_presence" in rec_cal and "temperature_presence" in rec_cal
    dumped = json.loads(cal_dump.read_text())
    assert "presence" in dumped and "bins" in dumped["presence"]
    # a reliability diagram PNG per branch lands next to the dump
    assert (tmp_path / "cal_presence.png").stat().st_size > 500

    # Closing the loop: re-evaluate with the fitted temperatures applied
    # in-predictor. The fit minimized NLL on this same split, so the
    # re-measured NLL cannot be worse (to fp tolerance).
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--calibration",
        "--apply-temperature", str(cal_dump),
    ])
    applied_out = capsys.readouterr().out.strip().splitlines()
    rec_applied = json.loads(
        [ln for ln in applied_out if ln.startswith("{")][-1]
    )
    for branch in dumped:
        assert (
            rec_applied[f"nll_{branch}"]
            <= rec_cal[f"nll_{branch}"] + 1e-4
        ), branch

    # Bundle eval: export a StableHLO bundle sized for the eval crops and
    # the same metrics must come out — evaluating exactly what serves.
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.serve import export_predictor_bundle

    predictor = TopDownPredictor(
        model=trainer.model,
        variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )
    bundle_dir = export_predictor_bundle(
        predictor, tmp_path / "bundle", buckets=(2,),
        frame_shape=cfg.model.img_size,
    )
    eval_main([
        "--bundle", str(bundle_dir),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
    ])
    rec_b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k, v in rec.items():
        assert rec_b[k] == pytest.approx(v, abs=1e-6), k

    # COCO-results interchange: dump predictions in the official results
    # format, then re-score the file model-free — same AP numbers.
    preds_json = tmp_path / "preds.json"
    eval_main([
        "--checkpoint", str(out / "checkpoints"),
        "--config", str(out / "config.json"),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
        "--batch-size", "2",
        "--dump-predictions", str(preds_json),
    ])
    dump_out = capsys.readouterr().out.strip().splitlines()
    rec_dump = json.loads([ln for ln in dump_out if ln.startswith("{")][-1])
    dumped_preds = json.loads(preds_json.read_text())
    assert dumped_preds and all(
        set(r) == {"image_id", "category_id", "keypoints", "score"}
        for r in dumped_preds
    )
    eval_main([
        "--score-predictions", str(preds_json),
        "--annotations", str(ann_file),
        "--images", str(img_dir),
    ])
    rec_scored = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    for k in ("AP", "AP50", "AP75", "AR"):
        assert rec_scored[k] == pytest.approx(rec_dump[k], abs=1e-6), k


def test_track_instances_and_dump_worst(mini_coco, tmp_path):
    """track_instances records per-instance OKS/EPE; dump_worst_cases writes
    the triage artifacts (worst.json + red/green overlay PNGs)."""
    import jax.numpy as jnp

    from probpose_pytorch_tpu.codec import ProbMap
    from probpose_pytorch_tpu.eval.analysis import dump_worst_cases
    from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown

    ann_file, img_dir = mini_coco
    ds = COCOPoseDataset(ann_file, img_dir, (64, 48), min_keypoints=1)
    pm = ProbMap((48, 64), (48, 64), sigmas=COCO_SIGMAS)

    class Oracle:
        input_size = (64, 48)

        def __call__(self, crops, boxes):
            i = getattr(self, "_i", 0)
            samples = [ds[min(i + j, len(ds) - 1)] for j in range(len(crops))]
            self._i = i + len(crops)
            kpts = np.stack([s["keypoints"] for s in samples])
            vis = np.stack([s["keypoints_visible"] for s in samples])
            enc = pm.encode(jnp.asarray(kpts), jnp.asarray(vis))
            dec, scores = pm.decode(enc["heatmaps"])
            return dict(
                keypoints=np.asarray(dec),
                scores=np.asarray(scores),
                probabilities=np.ones((len(crops), 1, kpts.shape[1])),
            )

    res = evaluate_topdown(Oracle(), ds, batch_size=2, sigmas=COCO_SIGMAS,
                           track_instances=True)
    inst = res["instances"]
    assert len(inst) == len(ds)
    assert [r["index"] for r in inst] == list(range(len(ds)))
    # oracle round-trip: every instance-matched OKS is near-perfect
    assert all(r["oks"] > 0.9 for r in inst), [r["oks"] for r in inst]
    assert all(r["pred"].shape == (17, 2) for r in inst)

    out = tmp_path / "worst"
    rows = dump_worst_cases(ds, inst, out, n=2)
    assert len(rows) == 2
    # sorted ascending by OKS (worst first)
    assert rows[0]["oks"] <= rows[1]["oks"]
    dumped = json.loads((out / "worst.json").read_text())
    assert [r["rank"] for r in dumped] == [0, 1]
    for r in dumped:
        assert (out / r["png"]).exists()


class TestResultsInterchange:
    """eval/results.py: COCO keypoint-results dump + model-free re-scoring."""

    def _run_with_predictions(self, mini_coco):
        import jax.numpy as jnp

        from probpose_pytorch_tpu.codec import ProbMap
        from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown

        ann_file, img_dir = mini_coco
        ds = COCOPoseDataset(ann_file, img_dir, (64, 48), min_keypoints=1)
        pm = ProbMap((48, 64), (48, 64), sigmas=COCO_SIGMAS)

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
                return dict(
                    keypoints=np.asarray(dec),
                    scores=np.asarray(scores),
                    probabilities=np.ones((len(crops), 1, kpts.shape[1])),
                )

        res = evaluate_topdown(
            Oracle(), ds, batch_size=2, sigmas=COCO_SIGMAS,
            collect_predictions=True,
        )
        return res, ds

    def test_rescoring_matches_live_eval(self, mini_coco, tmp_path):
        from probpose_pytorch_tpu.eval.results import (
            load_results,
            save_results,
            score_results,
        )

        res, ds = self._run_with_predictions(mini_coco)
        preds = res["predictions"]
        assert len(preds) == len(ds)
        path = tmp_path / "preds.json"
        save_results(preds, path)
        scored = score_results(load_results(path), ds)
        for k in ("AP", "AP50", "AP75", "AP_medium", "AP_large", "AR"):
            assert scored[k] == pytest.approx(res[k], abs=1e-6), k
        assert scored["n_results"] == len(preds)

    def test_missing_results_count_false_negatives(self, mini_coco):
        from probpose_pytorch_tpu.eval.results import score_results

        res, ds = self._run_with_predictions(mini_coco)
        # Drop every detection: AR must collapse, but every GT image still
        # participates (false negatives counted).
        scored = score_results([], ds)
        assert scored["AR"] == pytest.approx(0.0) or scored["AR"] == -1.0
        assert scored["n_images"] >= 3

    def test_unknown_image_results_dropped(self, mini_coco):
        from probpose_pytorch_tpu.eval.results import score_results

        res, ds = self._run_with_predictions(mini_coco)
        alien = dict(res["predictions"][0], image_id=999_999)
        scored = score_results(res["predictions"] + [alien], ds)
        assert scored["n_results"] == len(res["predictions"])
        for k in ("AP", "AR"):
            assert scored[k] == pytest.approx(res[k], abs=1e-6), k

    def test_malformed_results_rejected(self, tmp_path):
        from probpose_pytorch_tpu.eval.results import load_results

        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"not": "a list"}))
        with pytest.raises(ValueError):
            load_results(p)
        p.write_text(json.dumps([{"image_id": 1}]))
        with pytest.raises(ValueError):
            load_results(p)
