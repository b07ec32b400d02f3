"""Validate COCOKeypointEvaluator against an independent transcription of the
COCO keypoint evaluation protocol (pycocotools' COCOeval algorithm), written
here in pycocotools' own image-major dict/loop style so the two
implementations share no code or structure (VERDICT r1 item #6; pycocotools
itself is not installed in this environment, so the protocol is the oracle).
"""

import numpy as np
import pytest

from probpose_pytorch_tpu.eval.coco_eval import (
    COCOKeypointEvaluator,
    detection_areas,
)

REC_THRS = np.linspace(0.0, 1.0, 101)
IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
AREA_RNGS = [
    ("all", [0.0, 1e5**2]),
    ("medium", [32.0**2, 96.0**2]),
    ("large", [96.0**2, 1e5**2]),
]


def compute_oks_oracle(dts, gts, sigmas):
    """computeOks as published with pycocotools (per-pair loops, box
    fallback for unlabeled GTs)."""
    ious = np.zeros((len(dts), len(gts)))
    vars_ = (np.asarray(sigmas) * 2) ** 2
    k = len(sigmas)
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], np.float64)
        xg, yg, vg = g[:, 0], g[:, 1], g[:, 2]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], np.float64)
            xd, yd = d[:, 0], d[:, 1]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros(k)
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
            e = (dx**2 + dy**2) / vars_ / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0] if len(e) else 0.0
    return ious


def evaluate_img_oracle(dts, gts, ious_full, a_rng, max_dets):
    """evaluateImg as published: greedy per-threshold matching with the
    ignored-GT fallthrough, the iscrowd re-match exception
    (`if gtm>0 and not iscrowd: continue`), and dt-area ignoring."""
    for g in gts:
        g["_ignore"] = (
            g.get("ignore", 0)
            or g.get("iscrowd", 0)
            or g["area"] < a_rng[0]
            or g["area"] > a_rng[1]
        )
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:max_dets]]
    ious = (
        ious_full[:, gtind][: len(dts)]
        if len(ious_full) > 0
        else ious_full
    )

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious):
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1
                gtm[tind, m] = 1 + dind
    a = np.array(
        [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dts]
    ).reshape((1, len(dts)))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def accumulate_oracle(eval_imgs):
    """accumulate as published: dataset-wide mergesort by score, cumulative
    TP/FP with ignore masks, 101-point interpolated precision."""
    T = len(IOU_THRS)
    ap = np.zeros(T)
    recall = np.zeros(T)
    dt_scores = np.concatenate([e["dtScores"] for e in eval_imgs])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in eval_imgs], axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in eval_imgs], axis=1)[:, inds]
    gt_ig = np.concatenate([e["gtIgnore"] for e in eval_imgs])
    npig = np.count_nonzero(gt_ig == 0)
    if npig == 0:
        return None
    for t in range(T):
        tps = np.logical_and(dtm[t], np.logical_not(dt_ig[t]))
        fps = np.logical_and(np.logical_not(dtm[t]), np.logical_not(dt_ig[t]))
        tp_sum = np.cumsum(tps).astype(float)
        fp_sum = np.cumsum(fps).astype(float)
        rc = tp_sum / npig
        pr = tp_sum / (fp_sum + tp_sum + np.spacing(1))
        recall[t] = rc[-1] if len(rc) else 0.0
        q = np.zeros(101)
        pr = pr.tolist()
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, REC_THRS, side="left")
        for ri, pi in enumerate(inds2):
            if pi < len(pr):
                q[ri] = pr[pi]
        ap[t] = np.mean(q)
    return {
        "AP": float(np.mean(ap)),
        "AP50": float(ap[0]),
        "AP75": float(ap[5]),
        "AR": float(np.mean(recall)),
        "AR50": float(recall[0]),
        "AR75": float(recall[5]),
    }


def cocoeval_oracle(images, sigmas, max_dets=20):
    """Full protocol: per-(image, areaRng) evaluateImg then accumulate."""
    out = {}
    for name, a_rng in AREA_RNGS:
        eval_imgs = []
        for img in images:
            dts = [dict(d) for d in img["dts"]]
            gts = [dict(g) for g in img["gts"]]
            # ious are computed once per image on score-sorted dts
            dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
            dts_sorted = [dts[i] for i in dtind[:max_dets]]
            ious = compute_oks_oracle(dts_sorted, gts, sigmas)
            eval_imgs.append(
                evaluate_img_oracle(dts_sorted, gts, ious, a_rng, max_dets)
            )
        res = accumulate_oracle(eval_imgs)
        if name == "all":
            if res is None:
                return None
            out.update(res)
        else:
            out[f"AP_{name}"] = res["AP"] if res else -1.0
            out[f"AR_{name}"] = res["AR"] if res else -1.0
    return out


def _random_dataset(seed, n_images=20, k=17):
    """Synthetic detections/GTs covering the protocol's edge cases: ignored
    GTs, zero-keypoint GTs (box-fallback OKS), areas straddling the
    medium/large boundary (incl. exactly 96^2), score ties, empty images."""
    rng = np.random.default_rng(seed)
    sigmas = rng.uniform(0.025, 0.1, k)
    images = []
    for _ in range(n_images):
        n_gt = rng.integers(0, 4)
        gts, dts = [], []
        for g in range(n_gt):
            c = rng.uniform(50, 400, 2)
            spread = rng.choice([20.0, 50.0, 120.0])
            kpts = np.concatenate(
                [
                    rng.normal(c, spread, (k, 2)),
                    rng.choice([0, 1, 2], (k, 1), p=[0.2, 0.2, 0.6]),
                ],
                axis=1,
            )
            if rng.random() < 0.15:
                kpts[:, 2] = 0  # unlabeled -> box-fallback OKS path
            iscrowd = int(rng.random() < 0.15)
            if iscrowd:
                kpts[:, 2] = 0  # crowd annotations carry no labeled kpts
            area = float(
                rng.choice(
                    [500.0, 1024.0, 5000.0, 9216.0, 20000.0, 1e5, 96.0**2]
                )
            )
            gts.append(
                dict(
                    keypoints=kpts,
                    area=area,
                    bbox=[c[0] - spread, c[1] - spread, 2 * spread, 2 * spread],
                    ignore=int(rng.random() < 0.15),
                    iscrowd=iscrowd,
                )
            )
            # detections near this GT
            for _ in range(rng.integers(0, 3)):
                noise = rng.choice([1.0, 5.0, 30.0])
                dkpts = kpts.copy()
                dkpts[:, :2] += rng.normal(0, noise, (k, 2))
                dkpts[:, 2] = rng.uniform(0.2, 1.0, k)
                dts.append(
                    dict(
                        keypoints=dkpts,
                        score=float(
                            rng.choice([0.3, 0.5, 0.5, 0.7, rng.random()])
                        ),
                        area=float(detection_areas(dkpts[None, :, :])[0]),
                    )
                )
        # spurious detections
        for _ in range(rng.integers(0, 3)):
            dkpts = np.concatenate(
                [rng.uniform(0, 500, (k, 2)), rng.uniform(0, 1, (k, 1))],
                axis=1,
            )
            dts.append(
                dict(
                    keypoints=dkpts,
                    score=float(rng.choice([0.3, 0.5, rng.random()])),
                    area=float(detection_areas(dkpts[None, :, :])[0]),
                )
            )
        images.append(dict(gts=gts, dts=dts))
    return images, sigmas


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_evaluator_matches_protocol_oracle(seed):
    images, sigmas = _random_dataset(seed)
    want = cocoeval_oracle(images, sigmas)
    if want is None:
        pytest.skip("degenerate draw: no live ground truths")

    ev = COCOKeypointEvaluator(sigmas)
    for img in images:
        if not img["dts"] and not img["gts"]:
            continue
        D = len(img["dts"])
        K = len(sigmas)
        dt_kpts = (
            np.stack([d["keypoints"] for d in img["dts"]])
            if D
            else np.zeros((0, K, 3))
        )
        dt_scores = np.array([d["score"] for d in img["dts"]])
        G = len(img["gts"])
        gt_kpts = (
            np.stack([g["keypoints"] for g in img["gts"]])
            if G
            else np.zeros((0, K, 3))
        )
        ev.add_image(
            dt_kpts,
            dt_scores,
            gt_kpts,
            np.array([g["area"] for g in img["gts"]]),
            np.array([g["bbox"] for g in img["gts"]]).reshape(G, 4),
            gt_ignore=np.array([g["ignore"] for g in img["gts"]], bool),
            gt_crowd=np.array(
                [g.get("iscrowd", 0) for g in img["gts"]], bool
            ),
        )
    got = ev.summarize()
    # all ten stats of pycocotools' keypoint stats vector
    for key in ("AP", "AP50", "AP75", "AP_medium", "AP_large",
                "AR", "AR50", "AR75", "AR_medium", "AR_large"):
        assert got[key] == pytest.approx(want[key], abs=1e-9), (
            key,
            got,
            want,
        )


def test_crowd_absorbs_multiple_detections():
    """pycocotools' iscrowd exception: a crowd region can be matched by any
    number of detections, all of them ignored. A single-match ignore region
    would let the second detection fall through to a false positive."""
    k = 17
    sigmas = np.full(k, 0.05)
    live = np.concatenate(
        [np.full((k, 2), 300.0), np.full((k, 1), 2.0)], axis=1
    )
    crowd = np.zeros((k, 3))  # unlabeled -> box-fallback OKS
    crowd_box = np.array([40.0, 40.0, 60.0, 60.0])
    # two detections inside the crowd box (box-fallback OKS = 1) scoring
    # ABOVE the live detection, so an unabsorbed one would be a false
    # positive ahead of the true positive in the PR sweep
    dt_live = np.concatenate([live[:, :2], np.ones((k, 1))], axis=1)
    dt_crowd1 = np.concatenate(
        [np.full((k, 2), 60.0), np.ones((k, 1))], axis=1
    )
    dt_crowd2 = np.concatenate(
        [np.full((k, 2), 75.0), np.ones((k, 1))], axis=1
    )

    def run(gt_crowd_flag):
        ev = COCOKeypointEvaluator(sigmas)
        ev.add_image(
            np.stack([dt_live, dt_crowd1, dt_crowd2]),
            np.array([0.8, 0.9, 0.85]),
            np.stack([live, crowd]),
            np.array([5000.0, 3600.0]),
            np.array([[250.0, 250.0, 100.0, 100.0], crowd_box]),
            gt_ignore=np.array([False, True]),
            gt_crowd=np.array([False, gt_crowd_flag]),
        )
        return ev.summarize()

    with_crowd = run(True)
    assert with_crowd["AP"] == pytest.approx(1.0), with_crowd
    # same fixture with a single-match ignore region: the second crowd
    # detection becomes a false positive and drags AP below 1
    without_crowd = run(False)
    assert without_crowd["AP"] < 1.0, without_crowd

    # the oracle transcription agrees on the crowd fixture
    images = [
        dict(
            gts=[
                dict(
                    keypoints=live,
                    area=5000.0,
                    bbox=[250.0, 250.0, 100.0, 100.0],
                    ignore=0,
                    iscrowd=0,
                ),
                dict(
                    keypoints=crowd,
                    area=3600.0,
                    bbox=crowd_box.tolist(),
                    ignore=0,
                    iscrowd=1,
                ),
            ],
            dts=[
                dict(
                    keypoints=d,
                    score=s,
                    area=float(detection_areas(d[None, :, :])[0]),
                )
                for d, s in [
                    (dt_live, 0.8),
                    (dt_crowd1, 0.9),
                    (dt_crowd2, 0.85),
                ]
            ],
        )
    ]
    want = cocoeval_oracle(images, sigmas)
    assert want["AP"] == pytest.approx(with_crowd["AP"])


def test_perfect_predictions_ap_one():
    rng = np.random.default_rng(7)
    k = 17
    sigmas = np.full(k, 0.05)
    ev = COCOKeypointEvaluator(sigmas)
    for i in range(5):
        kpts = np.concatenate(
            [rng.uniform(50, 300, (k, 2)), np.full((k, 1), 2.0)], axis=1
        )
        ev.add_image(
            np.concatenate([kpts[None, :, :2], np.ones((1, k, 1))], -1),
            np.array([0.9]),
            kpts[None],
            np.array([5000.0]),
            np.array([[50.0, 50.0, 250.0, 250.0]]),
        )
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR"] == pytest.approx(1.0)
