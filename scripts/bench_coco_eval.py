"""Host-side COCO evaluator scale benchmark (VERDICT r4 weak #5).

Synthesizes a real-COCO-val-scale workload — 5k images, 20 detections and
~7 ground truths each, K=17 — and times COCOKeypointEvaluator end to end
(add_image incl. oks_matrix + summarize incl. the greedy matching over 10
thresholds x 3 area ranges). Run before/after vectorization to record the
speedup; correctness is pinned separately by tests/test_coco_protocol.py
and the committed pycocotools fixture cross-check.

Usage: python scripts/bench_coco_eval.py [n_images]
Emits one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from probpose_pytorch_tpu.data.coco import COCO_SIGMAS
from probpose_pytorch_tpu.eval.coco_eval import COCOKeypointEvaluator


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    K = 17
    rng = np.random.default_rng(0)
    images = []
    for _ in range(n_images):
        G = int(rng.integers(2, 12))
        D = 20
        gt = np.zeros((G, K, 3))
        gt[..., :2] = rng.uniform(0, 640, (G, K, 2))
        gt[..., 2] = (rng.random((G, K)) > 0.3) * 2
        # a zero-keypoint GT per image exercises the box-fallback OKS
        gt[0, :, 2] = 0
        areas = rng.uniform(800, 90000, G)
        boxes = np.concatenate(
            [rng.uniform(0, 500, (G, 2)), rng.uniform(30, 300, (G, 2))], 1
        )
        # detections near GTs (plus noise) so matching actually happens
        base = gt[rng.integers(0, G, D), :, :2]
        dt = np.zeros((D, K, 3))
        dt[..., :2] = base + rng.normal(0, 12, (D, K, 2))
        dt[..., 2] = rng.random((D, K))
        scores = rng.random(D)
        crowd = np.zeros(G, bool)
        crowd[0] = True
        images.append((dt, scores, gt, areas, boxes, crowd))

    ev = COCOKeypointEvaluator(sigmas=np.asarray(COCO_SIGMAS))
    t0 = time.perf_counter()
    for dt, scores, gt, areas, boxes, crowd in images:
        ev.add_image(dt, scores, gt, areas, gt_boxes=boxes, gt_crowd=crowd)
    t_add = time.perf_counter() - t0
    t0 = time.perf_counter()
    stats = ev.summarize()
    t_sum = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_images": n_images,
                "dets_per_image": 20,
                "add_image_seconds": round(t_add, 2),
                "summarize_seconds": round(t_sum, 2),
                "total_seconds": round(t_add + t_sum, 2),
                "images_per_sec": round(n_images / (t_add + t_sum), 1),
                "AP": round(stats["AP"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
