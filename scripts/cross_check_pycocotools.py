#!/usr/bin/env python
"""One-shot cross-check of the in-repo COCO keypoint evaluator against the
official pycocotools COCOeval.

The repo's AP numbers come from `eval/coco_eval.py`, which is validated
against an independent in-repo transcription of the protocol
(tests/test_coco_protocol.py) — but both sides share an author. This script
is the portable arbiter: a committed, deterministic (ground-truth, results)
JSON pair in the exact COCO interchange formats, scored by BOTH
implementations, with equality asserted to 1e-6 on all ten keypoint stats
(AP, AP50, AP75, AP_medium, AP_large, AR, AR50, AR75, AR_medium, AR_large).

pycocotools is not installed in the build environment (no network, installs
forbidden), so the committed artifact records the in-repo side and marks the
pycocotools side pending. Wherever pycocotools exists, the check is one
command with no other setup:

    python scripts/cross_check_pycocotools.py

Modes:
    (default)    score the committed fixture with the in-repo evaluator,
                 verify against the committed expected stats, then — if
                 pycocotools imports — run the official COCOeval and assert
                 equality; write docs/cross_check_pycocotools.json.
    --generate   regenerate the fixture pair + expected stats (deterministic
                 seed; only needed if the fixture schema changes).

Fixture corner coverage: crowds (iscrowd=1), zero-keypoint ignore
annotations, images with GT but no detections, false positives on
empty-GT images, duplicate detections per GT, and area bins straddling the
medium/large boundary.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURE_DIR = REPO / "tests" / "data"
GT_PATH = FIXTURE_DIR / "cross_check_gt.json"
RES_PATH = FIXTURE_DIR / "cross_check_results.json"
EXPECTED_PATH = FIXTURE_DIR / "cross_check_expected.json"
ARTIFACT_PATH = REPO / "docs" / "cross_check_pycocotools.json"

# The ten stats, in pycocotools' COCOeval.stats vector order.
STAT_KEYS = [
    "AP", "AP50", "AP75", "AP_medium", "AP_large",
    "AR", "AR50", "AR75", "AR_medium", "AR_large",
]


def _simulate_keypoints(rng, cx, cy, w, h, k=17):
    """GT keypoints scattered in a box, most labeled-visible."""
    xs = cx + (rng.random(k) - 0.5) * w
    ys = cy + (rng.random(k) - 0.5) * h
    v = rng.choice([0, 1, 2], size=k, p=[0.15, 0.25, 0.6]).astype(float)
    xs = np.where(v > 0, xs, 0.0)
    ys = np.where(v > 0, ys, 0.0)
    return np.stack([xs, ys, v], axis=1)


def generate_fixture(seed: int = 0, n_images: int = 60) -> None:
    rng = np.random.default_rng(seed)
    images, annotations, results = [], [], []
    ann_id = 1
    det_id = 0  # uniquifies scores: ties make sort order library-defined
    W = H = 640
    for img_id in range(n_images):
        images.append(
            dict(id=img_id, file_name=f"{img_id:012d}.jpg", width=W, height=H)
        )
        n_people = int(rng.integers(0, 4))
        for _ in range(n_people):
            # areas spanning the medium (32^2..96^2) / large boundary
            side = float(rng.uniform(24, 220))
            w, h = side * rng.uniform(0.7, 1.3), side * rng.uniform(0.9, 1.6)
            cx = float(rng.uniform(0.25 * W, 0.75 * W))
            cy = float(rng.uniform(0.25 * H, 0.75 * H))
            kpts = _simulate_keypoints(rng, cx, cy, w, h)
            num_kpts = int((kpts[:, 2] > 0).sum())
            is_crowd = bool(rng.random() < 0.10)
            if rng.random() < 0.08:  # zero-keypoint ignore annotation
                kpts[:, :] = 0.0
                num_kpts = 0
            annotations.append(
                dict(
                    id=ann_id,
                    image_id=img_id,
                    category_id=1,
                    keypoints=[round(float(v), 2) for v in kpts.reshape(-1)],
                    num_keypoints=num_kpts,
                    bbox=[
                        round(cx - w / 2, 2), round(cy - h / 2, 2),
                        round(w, 2), round(h, 2),
                    ],
                    area=round(w * h * 0.55, 2),
                    iscrowd=int(is_crowd),
                )
            )
            ann_id += 1
            # detections: usually one per GT (noised), sometimes a
            # duplicate, sometimes a miss
            n_det = int(rng.choice([0, 1, 2], p=[0.12, 0.70, 0.18]))
            for _ in range(n_det):
                noise = rng.normal(0, 0.04 * np.sqrt(w * h), (17, 2))
                dt = kpts[:, :2] + noise
                score = float(
                    np.clip(rng.normal(0.75, 0.15), 0.05, 0.999)
                )
                results.append(
                    dict(
                        image_id=img_id,
                        category_id=1,
                        keypoints=[
                            round(float(v), 2)
                            for v in np.concatenate(
                                [dt, np.full((17, 1), 1.0)], axis=1
                            ).reshape(-1)
                        ],
                        score=round(score + 1e-6 * det_id, 8),
                    )
                )
                det_id += 1
        # occasional false positive on an image (possibly with no GT)
        if rng.random() < 0.25:
            dt = rng.uniform(50, 590, (17, 2))
            results.append(
                dict(
                    image_id=img_id,
                    category_id=1,
                    keypoints=[
                        round(float(v), 2)
                        for v in np.concatenate(
                            [dt, np.full((17, 1), 1.0)], axis=1
                        ).reshape(-1)
                    ],
                    score=round(
                        float(rng.uniform(0.05, 0.5)) + 1e-6 * det_id, 8
                    ),
                )
            )
            det_id += 1
    gt = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=1, name="person", keypoints=[], skeleton=[])],
    )
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    GT_PATH.write_text(json.dumps(gt))
    RES_PATH.write_text(json.dumps(results))
    stats = score_in_repo()
    EXPECTED_PATH.write_text(json.dumps(stats, indent=1))
    print(f"fixture: {len(images)} images, {len(annotations)} anns, "
          f"{len(results)} results")
    print("in-repo stats:", json.dumps(stats, indent=1))


def score_in_repo() -> dict:
    from probpose_pytorch_tpu.data.coco import parse_coco_annotations
    from probpose_pytorch_tpu.eval.results import load_results, score_results

    records, ignores = parse_coco_annotations(
        GT_PATH, image_root="/nonexistent", min_keypoints=1,
        include_ignore=True,
    )

    class _DS:
        pass

    ds = _DS()
    ds.records = records
    ds.ignores_by_image = {}
    for rec in ignores:
        ds.ignores_by_image.setdefault(int(rec["image_id"]), []).append(rec)
    stats = score_results(load_results(RES_PATH), ds)
    return {k: round(float(stats[k]), 10) for k in STAT_KEYS}


def score_pycocotools() -> dict | None:
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        return None
    coco_gt = COCO(str(GT_PATH))
    coco_dt = coco_gt.loadRes(str(RES_PATH))
    ev = COCOeval(coco_gt, coco_dt, iouType="keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return {k: round(float(v), 10) for k, v in zip(STAT_KEYS, ev.stats)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()
    if args.generate:
        generate_fixture()
        return 0

    ours = score_in_repo()
    expected = json.loads(EXPECTED_PATH.read_text())
    for k in STAT_KEYS:
        if abs(ours[k] - expected[k]) > 1e-9:
            print(f"REGRESSION: in-repo {k}={ours[k]} != committed "
                  f"expected {expected[k]}")
            return 1
    print("in-repo evaluator matches committed expected stats.")

    official = score_pycocotools()
    artifact = dict(
        fixture=dict(
            gt=str(GT_PATH.relative_to(REPO)),
            results=str(RES_PATH.relative_to(REPO)),
        ),
        in_repo=ours,
        pycocotools=official,
        tol=args.tol,
    )
    if official is None:
        artifact["status"] = (
            "pycocotools not importable in this environment; in-repo side "
            "recorded. Run this script wherever pycocotools is installed "
            "to complete the cross-check."
        )
        print(artifact["status"])
        ARTIFACT_PATH.write_text(json.dumps(artifact, indent=1))
        return 0

    bad = {
        k: (ours[k], official[k])
        for k in STAT_KEYS
        if abs(ours[k] - official[k]) > args.tol
    }
    artifact["status"] = "MATCH" if not bad else f"MISMATCH: {bad}"
    ARTIFACT_PATH.write_text(json.dumps(artifact, indent=1))
    if bad:
        print("MISMATCH vs pycocotools:", bad)
        return 1
    print(f"all {len(STAT_KEYS)} stats match pycocotools within {args.tol}.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
