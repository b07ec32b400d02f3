"""Regression lock for the pycocotools cross-check fixture
(scripts/cross_check_pycocotools.py): the committed (GT, results) pair must
keep scoring to the committed expected stats on all ten COCO keypoint
metrics, so the pair stays a valid portable arbiter for environments where
pycocotools exists (it is not installed here; see docs/PARITY.md)."""

import json
from pathlib import Path

import numpy as np

DATA = Path(__file__).parent / "data"


def test_committed_fixture_reproduces_expected_stats():
    from probpose_pytorch_tpu.data.coco import parse_coco_annotations
    from probpose_pytorch_tpu.eval.results import load_results, score_results

    records, ignores = parse_coco_annotations(
        DATA / "cross_check_gt.json",
        image_root="/nonexistent",
        min_keypoints=1,
        include_ignore=True,
    )

    class _DS:
        pass

    ds = _DS()
    ds.records = records
    ds.ignores_by_image = {}
    for rec in ignores:
        ds.ignores_by_image.setdefault(int(rec["image_id"]), []).append(rec)
    stats = score_results(load_results(DATA / "cross_check_results.json"), ds)
    expected = json.loads((DATA / "cross_check_expected.json").read_text())
    assert set(expected) <= set(stats)
    for k, v in expected.items():
        np.testing.assert_allclose(float(stats[k]), v, atol=1e-9, err_msg=k)


def test_summarize_emits_all_ten_pycocotools_stats():
    from probpose_pytorch_tpu.eval.coco_eval import COCOKeypointEvaluator

    ev = COCOKeypointEvaluator(np.full(17, 0.05))
    rng = np.random.default_rng(0)
    gt = rng.uniform(10, 90, (2, 17, 3))
    gt[:, :, 2] = 2
    ev.add_image(
        gt + rng.normal(0, 1, gt.shape) * [1, 1, 0],
        np.asarray([0.9, 0.8]),
        gt,
        np.asarray([1500.0, 12000.0]),
    )
    out = ev.summarize()
    for k in [
        "AP", "AP50", "AP75", "AP_medium", "AP_large",
        "AR", "AR50", "AR75", "AR_medium", "AR_large",
    ]:
        assert k in out, k
