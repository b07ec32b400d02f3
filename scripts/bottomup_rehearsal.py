"""Single-stage (bottom-up) pose family rehearsal: train the
objects-as-points model on the on-disk synth COCO set, then score the
one-forward-per-frame protocol.

Mirrors scripts/detector_rehearsal.py for the third keypoint family:

  1. generate — the same on-disk COCO-format synth set (reused if present)
  2. train    — detect.train --keypoints 17 (CenterNet pose: center + size
                + offset + joint-offset heads, in-jit targets, focal + L1)
  3. eval     — evaluate_bottomup on val2017: COCO keypoint AP under the
                full ignore protocol + the center head's box AP@0.5
  4. serve    — BottomUpPredictor frames/s on the real chip (batched,
                chained differencing like bench.py)

Usage:
    python scripts/bottomup_rehearsal.py --root /tmp/probpose_rehearsal_data \
        --out /tmp/probpose_bottomup_run [--steps 1500] [--quick]

Writes <out>/bottomup_rehearsal.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/probpose_rehearsal_data")
    ap.add_argument("--out", default="/tmp/probpose_bottomup_run")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=384)
    ap.add_argument("--preset", default="conv-t",
                    choices=("conv-t", "conv-s"))
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--score-threshold", type=float, default=0.3)
    ap.add_argument("--kpt-heatmaps", action="store_true",
                    help="train with per-joint heatmap refinement heads "
                    "(detect.train --kpt-heatmaps) — the A/B against the "
                    "pure-regression decode")
    ap.add_argument("--max-val-images", type=int, default=None)
    ap.add_argument("--quick", action="store_true",
                    help="tiny dataset + tiny model (CI smoke)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing checkpoint in --out")
    args = ap.parse_args()

    from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    root, out = Path(args.root), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    record: dict = {}

    # ---- 1. generate (reuses the dress-rehearsal set when present) ----
    t0 = time.perf_counter()
    if args.quick:
        generate_coco_synth(root, n_train_images=40, n_val_images=16,
                            seed=0)
    else:
        generate_coco_synth(root, n_train_images=900, n_val_images=160,
                            seed=0)
    record["generate_seconds"] = round(time.perf_counter() - t0, 1)

    # ---- 2. train -------------------------------------------------------
    from probpose_pytorch_tpu.detect.train import load_bottomup
    from probpose_pytorch_tpu.detect.train import main as detect_train_main

    steps = 150 if args.quick else args.steps
    img_size = 128 if args.quick else args.img_size
    if not args.skip_train:
        t0 = time.perf_counter()
        argv = [
            "--data-root", str(root),
            "--out", str(out),
            "--steps", str(steps),
            "--batch-size", str(args.batch_size),
            "--img-size", str(img_size),
            "--preset", args.preset,
            "--lr", str(args.lr),
            "--keypoints", "17",
        ]
        if args.kpt_heatmaps:
            argv.append("--kpt-heatmaps")
        detect_train_main(argv)
        record["train"] = dict(
            steps=steps, img_size=img_size, preset=args.preset,
            kpt_heatmaps=bool(args.kpt_heatmaps),
            seconds=round(time.perf_counter() - t0, 1),
        )
        print(f"[bottomup-rehearsal] train: {record['train']}", flush=True)

    predictor = load_bottomup(out, score_threshold=args.score_threshold)

    # ---- 3. eval ---------------------------------------------------------
    from probpose_pytorch_tpu.detect.pipeline import evaluate_bottomup

    ann_val = root / "annotations/person_keypoints_val2017.json"
    img_val = root / "val2017"
    t0 = time.perf_counter()
    summary = evaluate_bottomup(
        predictor, ann_val, img_val,
        max_images=args.max_val_images, verbose=True,
    )
    record["eval"] = {
        k: round(float(v), 4)
        for k, v in summary.items()
        if isinstance(v, (int, float))
    }
    record["eval_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"[bottomup-rehearsal] eval: {record['eval']}", flush=True)

    # ---- 4. serving throughput (frames/s; the predictor materializes its
    # outputs to numpy, so each call is a synced wall measurement) --------
    B = 4 if args.quick else 16
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (B, 480, 480, 3), dtype=np.uint8)
    predictor(frames)  # compile
    reps = 3 if args.quick else 5
    iters = 5 if args.quick else 20
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            predictor(frames)
        dt = time.perf_counter() - t0
        rates.append(B * iters / dt)
    record["serving"] = dict(
        batch=B,
        frame_hw=[480, 480],
        frames_per_s=round(float(np.median(rates)), 1),
        spread=[round(min(rates), 1), round(max(rates), 1)],
    )
    print(f"[bottomup-rehearsal] serving: {record['serving']}", flush=True)

    (out / "bottomup_rehearsal.json").write_text(
        json.dumps(record, indent=2)
    )
    print(f"[bottomup-rehearsal] wrote {out / 'bottomup_rehearsal.json'}")


if __name__ == "__main__":
    main()
