#!/usr/bin/env python
"""Visibility-branch A/B (round-3 verdict item #6): does training the
visibility branch (loss weight > 0 — the reference's own dormant knob,
reference train.py:29 LOSS_WEIGHTS visibility: 0) make it earn its
parameters, and at what cost to AP?

Runs the dress rehearsal twice on the SAME generated dataset — visibility
weight 0.0 (flagship/reference default) and 1.0 — and records, per arm:
COCO AP/AR, the visibility branch's balanced accuracy (0.5 = no signal),
and ECE/NLL before and after temperature scaling. Writes
docs/rehearsal_visibility_r4.json with a computed recommendation.

Usage:
    python scripts/rehearsal_visibility_ab.py [--steps 1200]
        [--resume-steps 1200] [--quick]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_arm(weight: float, args) -> dict:
    out = Path(args.out_base + f"_w{weight:g}")
    cmd = [
        sys.executable, "scripts/dress_rehearsal.py",
        "--root", args.root,
        "--out", str(out),
        "--steps", str(args.steps),
        "--resume-steps", str(args.resume_steps),
        "--visibility-weight", str(weight),
    ]
    if args.quick:
        cmd.append("--quick")
    if args.epochs is not None:
        cmd += ["--epochs", str(args.epochs)]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        raise RuntimeError(f"arm w={weight} failed rc={proc.returncode}")
    rec = json.loads((out / "rehearsal.json").read_text())
    vis = rec.get("calibration", {}).get("visibility", {})
    return {
        "visibility_weight": weight,
        "eval": {
            k: rec["eval"][k]
            for k in ("AP", "AP50", "AP75", "AR")
            if k in rec.get("eval", {})
        },
        "visibility_branch": {
            k: vis.get(k)
            for k in ("n", "positive_rate", "balanced_acc", "ece", "nll",
                      "temperature", "ece_scaled", "nll_scaled")
        },
        "train_seconds": rec.get("train", {}).get("seconds"),
        "wall_seconds": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/probpose_rehearsal_data")
    ap.add_argument("--out-base", default="/tmp/probpose_vis_ab")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--resume-steps", type=int, default=1200)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    arms = [run_arm(0.0, args), run_arm(1.0, args)]
    base, trained = arms
    d_ap = None
    if base["eval"].get("AP") is not None:
        d_ap = round(trained["eval"]["AP"] - base["eval"]["AP"], 4)
    ba = trained["visibility_branch"].get("balanced_acc")
    learned = ba is not None and ba > 0.55
    hurt = d_ap is not None and d_ap < -0.005
    if learned and not hurt:
        rec_text = (
            "visibility=1.0 recommended: the branch learns real signal "
            f"(balanced_acc {ba}) at no material AP cost (dAP {d_ap})."
        )
        recommended = 1.0
    elif learned and hurt:
        rec_text = (
            f"trade-off: branch learns (balanced_acc {ba}) but costs "
            f"AP ({d_ap}); keep 0.0 for leaderboard AP, use 1.0 when "
            "visibility estimates matter."
        )
        recommended = 0.0
    else:
        rec_text = (
            f"visibility=0.0 stays the default: training the branch did "
            f"not produce usable signal (balanced_acc {ba}, dAP {d_ap})."
        )
        recommended = 0.0
    out = {
        "arms": arms,
        "delta_AP": d_ap,
        "recommended_weight": recommended,
        "recommendation": rec_text,
        "config": {
            "steps": args.steps + args.resume_steps,
            "quick": args.quick,
        },
    }
    print(json.dumps(out, indent=1))
    if args.record:
        path = REPO / "docs" / "rehearsal_visibility_r4.json"
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
