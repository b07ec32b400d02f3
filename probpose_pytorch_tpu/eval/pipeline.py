"""Streaming COCO val evaluation pipeline (BASELINE config #4):
detector/GT boxes -> bucketed crop batches -> batched pose decode ->
frame-space keypoints -> streaming AP.

Greenfield subsystem (SURVEY.md §2.4: the reference has no val-AP path).
The device side (crop -> forward -> decode -> untransform) is one jitted
program per batch shape; the AP accumulation stays on host, outside the step.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Iterable

import numpy as np

from probpose_pytorch_tpu.data.coco import COCO_SIGMAS
from probpose_pytorch_tpu.eval.coco_eval import COCOKeypointEvaluator

__all__ = ["evaluate_topdown"]


def evaluate_topdown(
    predictor: Any,
    dataset: Any,
    batch_size: int = 32,
    sigmas: np.ndarray = COCO_SIGMAS,
    score_key: str = "scores",
    max_samples: int | None = None,
) -> dict[str, float]:
    """Run top-down evaluation over a COCO-style crop dataset.

    The dataset must yield samples with `image` (crop), `bbox` (frame-space
    xywh used for the crop), `image_id`, `area`, and frame-space GT implied by
    the crop keypoints. Detections for each image_id are pooled, then fed to
    the streaming evaluator.

    Returns the COCO keypoint summary (AP, AP50, AP75, AP_medium, AP_large,
    AR).
    """
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    per_image: dict[int, dict[str, list]] = defaultdict(
        lambda: dict(dt=[], scores=[], gt=[], areas=[], boxes=[])
    )

    H, W = predictor.input_size
    for start in range(0, n, batch_size):
        idxs = range(start, min(start + batch_size, n))
        samples = [dataset[i] for i in idxs]
        # Pad the tail batch so the jitted shape stays constant.
        pad = batch_size - len(samples)
        batch = samples + [samples[-1]] * pad
        crops = np.stack([s["image"] for s in batch])
        boxes = np.stack([s["bbox"] for s in batch])
        # The predictor re-crops from frames; here samples are already crops,
        # so feed identity boxes and un-map with the true boxes.
        ident = np.tile(
            np.array([0, 0, W, H], np.float32), (len(batch), 1)
        )
        out = predictor(crops, ident)
        kpts = out["keypoints"][: len(samples)]  # crop space
        scores = out[score_key][: len(samples)]
        probs = out["probabilities"][: len(samples), 0]

        for s, kp, sc, pr in zip(samples, kpts, scores, probs):
            x0, y0, bw, bh = s["bbox"]
            frame_kp = np.empty_like(kp)
            frame_kp[:, 0] = kp[:, 0] / W * bw + x0
            frame_kp[:, 1] = kp[:, 1] / H * bh + y0
            dt = np.concatenate([frame_kp, sc.reshape(-1, 1)], axis=1)
            if "keypoints_frame" in s:
                # Score against the original annotation: crop-clipped
                # keypoints and the raw 0/1/2 visibility levels intact.
                gt = np.asarray(s["keypoints_frame"], np.float64)
            else:
                gt_xy = np.empty_like(s["keypoints"])
                gt_xy[:, 0] = s["keypoints"][:, 0] / W * bw + x0
                gt_xy[:, 1] = s["keypoints"][:, 1] / H * bh + y0
                gt = np.concatenate(
                    [gt_xy, s["keypoints_visible"].reshape(-1, 1) * 2], axis=1
                )
            rec = per_image[int(s["image_id"])]
            rec["dt"].append(dt)
            # Standard top-down instance score: detector/box confidence is
            # unavailable here, so use mean keypoint score weighted by
            # predicted presence (validated against the COCOeval-protocol
            # oracle in tests/test_coco_protocol.py).
            rec["scores"].append(float(np.mean(sc * pr)))
            rec["gt"].append(gt)
            rec["areas"].append(float(s["area"]))
            rec["boxes"].append(
                np.asarray(s.get("bbox_frame", s["bbox"]), np.float64)
            )

    # Ignore-regions the dataset excluded from crop sampling (crowds,
    # zero-keypoint instances) still participate in evaluation: the protocol
    # uses them to absorb detections (a detection on a crowd is not a false
    # positive). COCOPoseDataset exposes them grouped by image.
    ignores_by_image = getattr(dataset, "ignores_by_image", {})

    evaluator = COCOKeypointEvaluator(np.asarray(sigmas))
    for image_id, rec in per_image.items():
        gt = np.stack(rec["gt"])
        areas = list(rec["areas"])
        boxes = list(rec["boxes"])
        # Live instances with no labeled keypoints are themselves
        # ignore-regions, not targets.
        ignore = list((gt[:, :, 2] > 0).sum(axis=1) == 0)
        crowd = [False] * len(ignore)
        extra = ignores_by_image.get(image_id, [])
        if extra:
            K = gt.shape[1]
            pads = []
            for ig in extra:
                kp = np.asarray(ig["keypoints"], np.float64)
                if kp.shape[0] != K:  # category mismatch; pad/trim
                    kp = np.zeros((K, 3), np.float64)
                pads.append(kp)
                areas.append(float(ig["area"]))
                boxes.append(np.asarray(ig["bbox"], np.float64))
                ignore.append(True)
                crowd.append(bool(ig["iscrowd"]))
            gt = np.concatenate([gt, np.stack(pads)], axis=0)
        evaluator.add_image(
            np.stack(rec["dt"]),
            np.asarray(rec["scores"]),
            gt,
            np.asarray(areas),
            np.stack(boxes),
            gt_ignore=np.asarray(ignore, bool),
            gt_crowd=np.asarray(crowd, bool),
        )
    return evaluator.summarize()
