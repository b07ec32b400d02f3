"""Standalone-pipeline rehearsal: train the person detector, then run the
REAL end-to-end protocol — the framework finds its own people.

The dress rehearsal (scripts/dress_rehearsal.py) evaluates pose with GT
boxes, isolating pose quality. This rehearsal closes the loop the reference
never had (it has no detector at all):

  1. generate  — the same on-disk COCO-format synth set (reused if present)
  2. train     — detect.train CLI (CenterNet-style conv detector,
                 in-jit target encode, focal+L1)
  3. detect    — detection AP@0.5 / recall on val2017
  4. e2e       — detector boxes -> expand -> bucketed pose predict ->
                 COCO keypoint AP (evaluate_detector_topdown), next to the
                 GT-box AP of the same pose checkpoint: the gap IS the
                 detector's cost.

Usage:
    python scripts/detector_rehearsal.py --root /tmp/probpose_rehearsal_data \
        --pose-run /tmp/probpose_rehearsal_run [--steps 1500] [--quick]

--pose-run points at a dress-rehearsal output dir (config.json +
checkpoints/); omit it with --quick to train a tiny pose model inline.
Writes <out>/detector_rehearsal.json.
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
    ap.add_argument("--out", default="/tmp/probpose_detector_run")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=384,
                    help="detector input size (synth frames are 480x480)")
    ap.add_argument("--preset", default="conv-t",
                    choices=("conv-t", "conv-s"))
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--score-threshold", type=float, default=0.3)
    ap.add_argument("--pose-run", type=Path, default=None,
                    help="dress-rehearsal run dir (config.json + "
                    "checkpoints/) for the e2e phase")
    ap.add_argument("--pose-ema", action="store_true",
                    help="use the pose checkpoint's EMA params")
    ap.add_argument("--max-val-images", type=int, default=None)
    ap.add_argument("--quick", action="store_true",
                    help="tiny dataset + tiny models (CI smoke)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing detector checkpoint in --out")
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
        generate_coco_synth(
            root, n_train_images=40, n_val_images=16, seed=0
        )
    else:
        generate_coco_synth(root, n_train_images=900, n_val_images=160,
                            seed=0)
    record["generate_seconds"] = round(time.perf_counter() - t0, 1)

    # ---- 2. train the detector ----------------------------------------
    from probpose_pytorch_tpu.detect.train import load_detector
    from probpose_pytorch_tpu.detect.train import main as detect_train_main

    steps = 150 if args.quick else args.steps
    img_size = 128 if args.quick else args.img_size
    if not args.skip_train:
        t0 = time.perf_counter()
        detect_train_main(
            [
                "--data-root", str(root),
                "--out", str(out),
                "--steps", str(steps),
                "--batch-size", str(args.batch_size),
                "--img-size", str(img_size),
                "--preset", args.preset,
                "--lr", str(args.lr),
            ]
        )
        record["train"] = dict(
            steps=steps, img_size=img_size, preset=args.preset,
            seconds=round(time.perf_counter() - t0, 1),
        )
        print(f"[detector-rehearsal] train: {record['train']}", flush=True)

    detector = load_detector(
        out / "checkpoints", score_threshold=args.score_threshold
    )

    # ---- 3 + 4. detection AP and end-to-end pose AP -------------------
    ann_val = root / "annotations/person_keypoints_val2017.json"
    img_val = root / "val2017"

    if args.pose_run is not None:
        from probpose_pytorch_tpu.inference import load_predictor

        pose = load_predictor(
            args.pose_run / "checkpoints",
            args.pose_run / "config.json",
            ema=args.pose_ema,
        )
    else:
        if not args.quick:
            ap.error("--pose-run is required without --quick")
        # tiny inline pose model: plumbing-grade only
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        ViTConfig.PRESETS.setdefault(
            "vit-rehearsal-quick",
            dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=17,
                backbone="vit-rehearsal-quick", compute_dtype="float32",
                deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        pose = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )

    from probpose_pytorch_tpu.detect.pipeline import (
        evaluate_detector_topdown,
    )

    t0 = time.perf_counter()
    e2e = evaluate_detector_topdown(
        pose, detector, ann_val, img_val,
        max_images=args.max_val_images,
        verbose=True,
    )
    record["detection"] = dict(
        ap50=round(e2e["det_ap50"], 4),
        recall50=round(e2e["det_recall50"], 4),
        dets_per_image=round(e2e["det_per_image"], 2),
    )
    record["e2e_pose"] = {
        k: round(float(v), 4)
        for k, v in e2e.items()
        if isinstance(v, (int, float)) and not k.startswith("det_")
    }
    record["e2e_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"[detector-rehearsal] detection: {record['detection']}",
          flush=True)
    print(f"[detector-rehearsal] e2e pose: {record['e2e_pose']}",
          flush=True)

    # GT-box pose AP on the same checkpoint: the detector-cost baseline.
    from probpose_pytorch_tpu.data.coco import COCOPoseDataset
    from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown

    ds = COCOPoseDataset(
        ann_val, img_val, input_size=pose.input_size,
    )
    t0 = time.perf_counter()
    gt_summary = evaluate_topdown(
        pose, ds,
        max_samples=(
            None if args.max_val_images is None
            else args.max_val_images * 4
        ),
    )
    record["gtbox_pose"] = {
        k: round(float(v), 4)
        for k, v in gt_summary.items()
        if isinstance(v, (int, float))
    }
    record["gtbox_seconds"] = round(time.perf_counter() - t0, 1)
    record["ap_gap_detector_vs_gtbox"] = round(
        record["gtbox_pose"].get("AP", 0.0)
        - record["e2e_pose"].get("AP", 0.0),
        4,
    )
    print(f"[detector-rehearsal] gt-box pose: {record['gtbox_pose']}",
          flush=True)
    print(
        "[detector-rehearsal] detector cost: "
        f"{record['ap_gap_detector_vs_gtbox']} AP",
        flush=True,
    )

    (out / "detector_rehearsal.json").write_text(
        json.dumps(record, indent=2)
    )
    print(f"[detector-rehearsal] wrote {out / 'detector_rehearsal.json'}")


if __name__ == "__main__":
    main()
