#!/usr/bin/env python
"""Aggregate completed multi-seed rehearsal runs into
docs/rehearsal_multiseed_r5.json (same schema as
scripts/rehearsal_multiseed_r5.py's in-process aggregation — this
standalone form works from whatever <base>/runs/*/rehearsal.json exist,
so an interrupted sweep still yields an honest artifact with the seeds
that finished).

Usage:
    python scripts/aggregate_multiseed.py [--base /tmp/probpose_ms]
        [--flip] [--out docs/rehearsal_multiseed_r5.json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ARMS = ["probmap_w0", "probmap_w1", "simcc"]


def stats(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    return {
        "mean": round(statistics.mean(vals), 4),
        "spread": round(max(vals) - min(vals), 4),
        "min": round(min(vals), 4),
        "max": round(max(vals), 4),
        "per_seed": [round(v, 4) for v in vals],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/probpose_ms")
    ap.add_argument("--flip", action="store_true",
                    help="also run flip-TTA evals on probmap_w0 runs "
                    "(needs the TPU free)")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out",
                    default=str(REPO / "docs/rehearsal_multiseed_r5.json"))
    args = ap.parse_args()
    runs = sorted(Path(args.base, "runs").glob("*/rehearsal.json"))
    rows = []
    for rj in runs:
        name = rj.parent.name  # e.g. probmap_w0_s1
        arm, seed = name.rsplit("_s", 1)
        rec = json.loads(rj.read_text())
        vis = rec.get("calibration", {}).get("visibility", {})
        rows.append({
            "arm": arm, "seed": int(seed),
            "AP": rec["eval"]["AP"], "AP50": rec["eval"]["AP50"],
            "AP75": rec["eval"]["AP75"], "AR": rec["eval"]["AR"],
            "visibility_balanced_acc": vis.get("balanced_acc"),
            "visibility_ece": vis.get("ece"),
            "train_seconds": rec.get("train", {}).get("seconds"),
            "out": str(rj.parent),
        })
    rows.sort(key=lambda r: (r["arm"], r["seed"]))

    flip_rows = []
    if args.flip:
        from probpose_pytorch_tpu.data.coco import COCOPoseDataset
        from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown
        from probpose_pytorch_tpu.inference import load_predictor

        root = Path(args.base) / "data"
        for row in [r for r in rows if r["arm"] == "probmap_w0"]:
            out = Path(row["out"])
            predictor = load_predictor(
                out / "checkpoints", out / "config.json", ema=True,
                flip_test=True,
            )
            val_ds = COCOPoseDataset(
                root / "annotations/person_keypoints_val2017.json",
                root / "val2017",
                predictor.input_size,
            )
            summary = evaluate_topdown(predictor, val_ds, batch_size=128)
            ap_flip = round(float(summary["AP"]), 4)
            flip_rows.append(
                {"seed": row["seed"], "AP_no_flip": row["AP"],
                 "AP_flip": ap_flip,
                 "delta": round(ap_flip - row["AP"], 4)}
            )
            print(f"[aggregate] flip-TTA s{row['seed']}: "
                  f"{row['AP']} -> {ap_flip}", flush=True)

    by_arm = {
        a: stats([r["AP"] for r in rows if r["arm"] == a]) for a in ARMS
    }
    by_arm = {k: v for k, v in by_arm.items() if v}
    vis_acc = stats(
        [r["visibility_balanced_acc"] for r in rows
         if r["arm"] == "probmap_w1"]
    )
    spread = max(a["spread"] for a in by_arm.values())
    deltas = {}
    if "probmap_w1" in by_arm and "probmap_w0" in by_arm:
        deltas["visibility_1_vs_0"] = round(
            by_arm["probmap_w1"]["mean"] - by_arm["probmap_w0"]["mean"], 4
        )
    if "simcc" in by_arm and "probmap_w0" in by_arm:
        deltas["simcc_vs_probmap"] = round(
            by_arm["simcc"]["mean"] - by_arm["probmap_w0"]["mean"], 4
        )
    if flip_rows:
        deltas["flip_tta"] = stats([f["delta"] for f in flip_rows])

    def verdict(delta: float, label: str) -> str:
        if abs(delta) <= spread:
            return (f"{label}: mean dAP {delta:+.4f} is within the max "
                    f"per-arm seed spread ({spread:.4f}) - statistically "
                    "indistinguishable at these seed counts")
        return (f"{label}: mean dAP {delta:+.4f} EXCEEDS the max per-arm "
                f"seed spread ({spread:.4f}) - treat as a real effect")

    conclusions = [
        verdict(d, label)
        for label, d in (
            ("visibility weight 1.0 vs 0.0",
             deltas.get("visibility_1_vs_0")),
            ("SimCC vs probmap", deltas.get("simcc_vs_probmap")),
        )
        if d is not None
    ]
    if deltas.get("flip_tta"):
        # flip-TTA is PAIRED (same checkpoint, eval-only), so its own
        # per-seed deltas — not the between-run arm spread — are the
        # yardstick: same-sign deltas across seeds are a real effect even
        # when tiny relative to seed noise.
        ft = deltas["flip_tta"]
        same_sign = all(d < 0 for d in ft["per_seed"]) or all(
            d > 0 for d in ft["per_seed"]
        )
        if same_sign:
            conclusions.append(
                f"flip-TTA (paired per-seed): dAP "
                f"{ft['per_seed']} - consistently "
                f"{'negative' if ft['mean'] < 0 else 'positive'} across "
                f"seeds (mean {ft['mean']:+.4f}); a real "
                f"{'cost' if ft['mean'] < 0 else 'gain'} at this recipe"
            )
        else:
            conclusions.append(
                f"flip-TTA (paired per-seed): dAP {ft['per_seed']} - "
                f"mixed sign, mean {ft['mean']:+.4f}; no consistent effect"
            )
    if vis_acc:
        conclusions.append(
            f"visibility branch balanced accuracy at w=1.0: "
            f"{vis_acc['mean']} +- {vis_acc['spread']} (vs ~0.5 untrained)"
        )
    record = {
        "config": {
            "steps": args.steps,
            "seeds_per_arm": {
                a: sorted(r["seed"] for r in rows if r["arm"] == a)
                for a in by_arm
            },
            "recipe": "dress_rehearsal flagship (ViT-S 256x192 bf16, "
                      "fused attention), shared seed-0 dataset + cache; "
                      "arms differ only in TrainConfig.seed",
        },
        "rows": [
            {k: v for k, v in r.items() if k != "out"} for r in rows
        ],
        "flip_tta": flip_rows,
        "AP_by_arm": by_arm,
        "visibility_balanced_acc_w1": vis_acc,
        "max_seed_spread": spread,
        "deltas": deltas,
        "power_note": (
            None
            if spread <= 0.05
            else (
                f"max per-arm seed spread {spread:.3f} AP at "
                f"{args.steps}-step runs: seed noise DOMINATES every "
                "measured delta, so 'within spread' verdicts are "
                "low-power (absence of evidence, not evidence of "
                "absence). Longer runs (>=2400 steps) or more seeds are "
                "needed to resolve effects smaller than the spread."
            )
        ),
        "conclusions": conclusions,
    }
    Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps(conclusions, indent=1))
    print(f"[aggregate] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
