"""COCO-protocol keypoint AP/AR evaluation (pure NumPy).

Greenfield subsystem (SURVEY.md §2.4: the reference has no AP evaluation,
only training-time PCK/OKS metrics). Implements the standard COCO keypoint
evaluation: per-image greedy matching of score-sorted detections to ground
truths by OKS, AP/AR averaged over OKS thresholds 0.50:0.05:0.95, with the
medium/large area-range splits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

__all__ = ["oks_matrix", "COCOKeypointEvaluator"]

_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
_AREA_RANGES = {
    "all": (0.0, np.inf),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, np.inf),
}


def oks_matrix(
    dt_kpts: np.ndarray,
    gt_kpts: np.ndarray,
    gt_areas: np.ndarray,
    sigmas: np.ndarray,
    gt_boxes: np.ndarray | None = None,
) -> np.ndarray:
    """(D, G) OKS between D detections and G ground truths.

    dt_kpts: (D, K, 3) [x, y, score]; gt_kpts: (G, K, 3) [x, y, v].
    For GTs with no labeled keypoints, the COCO protocol falls back to a
    distance-to-expanded-box measure; that requires gt_boxes (G, 4) xywh.
    """
    D, G = len(dt_kpts), len(gt_kpts)
    out = np.zeros((D, G), np.float64)
    var = (2.0 * np.asarray(sigmas, np.float64)) ** 2
    for g in range(G):
        xg, yg, vg = gt_kpts[g, :, 0], gt_kpts[g, :, 1], gt_kpts[g, :, 2]
        k1 = int((vg > 0).sum())
        for d in range(D):
            xd, yd = dt_kpts[d, :, 0], dt_kpts[d, :, 1]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            elif gt_boxes is not None:
                x0, y0, w, h = gt_boxes[g]
                z = np.zeros(len(sigmas))
                dx = np.maximum(z, (x0 - w) - xd) + np.maximum(z, xd - (x0 + 2 * w))
                dy = np.maximum(z, (y0 - h) - yd) + np.maximum(z, yd - (y0 + 2 * h))
            else:
                out[d, g] = 0.0
                continue
            e = (dx**2 + dy**2) / var / (gt_areas[g] + np.spacing(1)) / 2.0
            if k1 > 0:
                e = e[vg > 0]
            out[d, g] = np.mean(np.exp(-e)) if len(e) else 0.0
    return out


@dataclass
class COCOKeypointEvaluator:
    """Streaming evaluator: feed per-image (detections, ground truths) as the
    val set is processed; `summarize()` yields AP / AP50 / AP75 / AP-m / AP-l
    / AR (the COCO keypoint headline numbers)."""

    sigmas: np.ndarray
    max_dets: int = 20
    _matches: list = field(default_factory=list)

    def add_image(
        self,
        dt_kpts: np.ndarray,
        dt_scores: np.ndarray,
        gt_kpts: np.ndarray,
        gt_areas: np.ndarray,
        gt_boxes: np.ndarray | None = None,
        gt_ignore: np.ndarray | None = None,
    ) -> None:
        """dt_kpts (D, K, 3), dt_scores (D,), gt_kpts (G, K, 3),
        gt_areas (G,)."""
        D, G = len(dt_kpts), len(gt_kpts)
        order = np.argsort(-np.asarray(dt_scores))[: self.max_dets]
        dt_kpts = np.asarray(dt_kpts)[order]
        dt_scores = np.asarray(dt_scores)[order]
        if gt_ignore is None:
            gt_ignore = np.zeros(G, bool)
        ious = (
            oks_matrix(dt_kpts, gt_kpts, gt_areas, self.sigmas, gt_boxes)
            if D and G
            else np.zeros((len(dt_kpts), G))
        )
        self._matches.append(
            dict(
                ious=ious,
                dt_scores=dt_scores,
                gt_areas=np.asarray(gt_areas, np.float64),
                gt_ignore=np.asarray(gt_ignore, bool),
            )
        )

    def _evaluate_range(self, area_range: tuple[float, float]) -> dict[str, float]:
        T = len(_THRESHOLDS)
        per_thr_scores: list[list[np.ndarray]] = [[] for _ in range(T)]
        per_thr_tp: list[list[np.ndarray]] = [[] for _ in range(T)]
        n_gt = 0
        lo, hi = area_range
        for m in self._matches:
            ious, scores = m["ious"], m["dt_scores"]
            in_range = (m["gt_areas"] >= lo) & (m["gt_areas"] < hi)
            use = in_range & ~m["gt_ignore"]
            n_gt += int(use.sum())
            D, G = ious.shape
            for t, thr in enumerate(_THRESHOLDS):
                taken = np.zeros(G, bool)
                tp = np.zeros(D, bool)
                ignore_dt = np.zeros(D, bool)
                for d in range(D):  # detections already score-sorted
                    best, best_g = thr, -1
                    for g in range(G):
                        if taken[g] or not use[g]:
                            continue
                        if ious[d, g] >= best:
                            best, best_g = ious[d, g], g
                    if best_g >= 0:
                        taken[best_g] = True
                        tp[d] = True
                    else:
                        # unmatched detections could still match ignored /
                        # out-of-range gts -> ignore rather than count FP
                        for g in range(G):
                            if not use[g] and ious[d, g] >= thr:
                                ignore_dt[d] = True
                                break
                keep = ~ignore_dt
                per_thr_scores[t].append(scores[keep])
                per_thr_tp[t].append(tp[keep])
        if n_gt == 0:
            return {"AP": -1.0, "AR": -1.0}

        # Accumulate PR per threshold over the whole dataset.
        aps, ars = [], []
        for t in range(T):
            scores_t = (
                np.concatenate(per_thr_scores[t])
                if per_thr_scores[t]
                else np.zeros(0)
            )
            tps_t = (
                np.concatenate(per_thr_tp[t])
                if per_thr_tp[t]
                else np.zeros(0, bool)
            )
            order = np.argsort(-scores_t)
            tps_t = tps_t[order]
            tp_cum = np.cumsum(tps_t)
            fp_cum = np.cumsum(~tps_t)
            recall = tp_cum / n_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
            # 101-point interpolated AP
            prec_interp = np.zeros(101)
            if len(precision):
                pr = precision.copy()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                idx = np.searchsorted(recall, np.linspace(0, 1, 101), side="left")
                valid = idx < len(pr)
                prec_interp[valid] = pr[idx[valid]]
            aps.append(prec_interp.mean())
            ars.append(recall[-1] if len(recall) else 0.0)
        return {
            "AP": float(np.mean(aps)),
            "AP50": float(aps[0]),
            "AP75": float(aps[5]),
            "AR": float(np.mean(ars)),
        }

    def summarize(self) -> dict[str, float]:
        out = self._evaluate_range(_AREA_RANGES["all"])
        out["AP_medium"] = self._evaluate_range(_AREA_RANGES["medium"])["AP"]
        out["AP_large"] = self._evaluate_range(_AREA_RANGES["large"])["AP"]
        return out
