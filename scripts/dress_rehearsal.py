"""Full-pipeline dress rehearsal at realistic scale (VERDICT r2 item #2).

Drives the flagship stack end-to-end on a generated on-disk COCO-format
dataset (multi-person frames, crowds, zero-keypoint instances —
data/synth_coco.py):

  1. generate  — ~2k-instance train set + val set written to disk
  2. train     — flagship CLI (ViT-S 256x192, fused Pallas attention, bf16,
                 augmentation, EMA, crop cache) for N steps
  3. resume    — the CLI again: must pick up the checkpoint mid-run
  4. eval      — eval/run.py streaming COCO AP from the CLI's checkpoint,
                 with eval-stream throughput reported
  5. oracle    — GT-fed round-trip predictor through the same eval pipeline
                 (must score AP ~= 1.0: validates the eval plumbing)

Writes a JSON record to <out>/rehearsal.json and prints one summary line
per phase.

Usage:
    python scripts/dress_rehearsal.py --root /tmp/probpose_rehearsal \
        [--steps 1200] [--resume-steps 1200] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root


def make_config(root: Path, out_dir: Path, quick: bool,
                head_type: str = "probmap", rotation_deg: float = 0.0,
                visibility_weight: float = 0.0, epochs: int | None = None,
                seed: int = 0, cache_dir: str | None = None):
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.ops.augment import AugmentConfig
    from probpose_pytorch_tpu.train.config import (
        LossWeights,
        OptimConfig,
        TrainConfig,
    )

    if quick:
        from probpose_pytorch_tpu.models.vit import ViTConfig

        ViTConfig.PRESETS.setdefault(
            "vit-rehearsal-quick",
            dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0),
        )
        model = ModelConfig(
            img_size=(64, 48),
            num_keypoints=17,
            backbone="vit-rehearsal-quick",
            head_type=head_type,
            compute_dtype="float32",
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        )
        batch, epochs = 16, (8 if epochs is None else epochs)
    else:
        model = ModelConfig(
            img_size=(256, 192),
            num_keypoints=17,
            backbone="vit-s",
            head_type=head_type,
            compute_dtype="bfloat16",
            deconv_out_channels=(256, 256),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((4, 3), (2, 2), (2, 2)),
            normalize=1.0,
            attn_impl="fused",
        )
        batch, epochs = 128, (250 if epochs is None else epochs)
    return TrainConfig(
        model=model,
        optim=OptimConfig(ema_decay=0.999, max_nonfinite_skips=5),
        loss_weights=LossWeights(visibility=visibility_weight),
        augment=AugmentConfig(
            flip_prob=0.5,
            scale_jitter=0.15,
            shift_jitter=0.05,
            rotation_deg=rotation_deg,
            brightness=0.2,
            contrast=0.2,
            flip_pairs=(
                (1, 2), (3, 4), (5, 6), (7, 8), (9, 10),
                (11, 12), (13, 14), (15, 16),
            ),
        ),
        epochs=epochs,
        train_batch_size=batch,
        val_batch_size=batch,
        val_every=200,
        log_every=50,
        checkpoint_every_epochs=5,
        seed=seed,
        data_root=str(root),
        dataset_format="coco",
        cache_dir=cache_dir or str(out_dir / "cache"),
        num_workers=4,
        out_dir=str(out_dir),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/probpose_rehearsal_data")
    ap.add_argument("--out", default="/tmp/probpose_rehearsal_run")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--resume-steps", type=int, default=1200)
    ap.add_argument("--train-images", type=int, default=900,
                    help="train2017 frame count (~2.3 live instances each)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + tiny dataset smoke (CI)")
    ap.add_argument("--head-type", default="probmap",
                    choices=["probmap", "simcc"],
                    help="keypoint head family (models/model.py)")
    ap.add_argument("--rotation-deg", type=float, default=0.0,
                    help="random in-crop rotation augmentation "
                    "(ops/augment.py rotation_deg; 0 disables)")
    ap.add_argument("--visibility-weight", type=float, default=0.0,
                    help="loss weight for the visibility branch (the "
                    "flagship recipe and the reference's train.py:29 both "
                    "use 0.0 — the branch stays untrained and "
                    "uncalibrated; >0 trains it)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override TrainConfig.epochs — the OneCycle "
                    "schedule anneals over steps_per_epoch*epochs total "
                    "steps, so set this to make --steps+--resume-steps "
                    "cover the FULL schedule (the r3 baseline runs "
                    "covered only 60%% of theirs)")
    ap.add_argument("--skip-train", action="store_true",
                    help="only run eval phases on an existing checkpoint")
    ap.add_argument("--seed", type=int, default=0,
                    help="TrainConfig.seed (init + augmentation + data "
                    "order); the generated DATASET stays seed-0 so "
                    "multi-seed A/B arms train on identical data")
    ap.add_argument("--cache-dir", default=None,
                    help="crop-cache directory to share across runs of "
                    "the same dataset/geometry (default: <out>/cache)")
    args = ap.parse_args()

    from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    root, out = Path(args.root), Path(args.out)
    record: dict = {}

    # ---- 1. generate -------------------------------------------------
    t0 = time.perf_counter()
    n_train, n_val = (40, 16) if args.quick else (args.train_images, 160)
    generate_coco_synth(
        root, n_train_images=n_train, n_val_images=n_val, seed=0
    )
    ann_train = json.loads(
        (root / "annotations/person_keypoints_train2017.json").read_text()
    )
    ann_val = json.loads(
        (root / "annotations/person_keypoints_val2017.json").read_text()
    )
    n_inst = sum(
        1
        for a in ann_train["annotations"]
        if not a["iscrowd"] and a["num_keypoints"] > 0
    )
    n_ignore = len(ann_train["annotations"]) - n_inst
    record["generate"] = dict(
        train_images=len(ann_train["images"]),
        train_instances=n_inst,
        train_ignores=n_ignore,
        val_images=len(ann_val["images"]),
        val_annotations=len(ann_val["annotations"]),
        seconds=round(time.perf_counter() - t0, 1),
    )
    print(f"[rehearsal] generate: {record['generate']}", flush=True)

    out.mkdir(parents=True, exist_ok=True)
    cfg = make_config(root, out, args.quick, head_type=args.head_type,
                      rotation_deg=args.rotation_deg,
                      visibility_weight=args.visibility_weight,
                      epochs=args.epochs, seed=args.seed,
                      cache_dir=args.cache_dir)
    cfg.save(out / "config.json")

    from probpose_pytorch_tpu.train.cli import main as train_main

    if not args.skip_train:
        # ---- 2. train ------------------------------------------------
        t0 = time.perf_counter()
        train_main(
            [
                str(out),
                "--config", str(out / "config.json"),
                "--max-steps", str(args.steps),
            ]
        )
        record["train"] = dict(
            steps=args.steps, seconds=round(time.perf_counter() - t0, 1)
        )
        print(f"[rehearsal] train: {record['train']}", flush=True)

        # ---- 3. resume (skipped when --resume-steps <= 0) ------------
        if args.resume_steps > 0:
            t0 = time.perf_counter()
            train_main(
                [
                    str(out),
                    "--config", str(out / "config.json"),
                    "--max-steps", str(args.resume_steps),
                ]
            )
            record["resume"] = dict(
                steps=args.resume_steps,
                seconds=round(time.perf_counter() - t0, 1),
            )
            print(f"[rehearsal] resume: {record['resume']}", flush=True)

    # ---- 4. eval -----------------------------------------------------
    from probpose_pytorch_tpu.data.coco import (
        COCO_SIGMAS,
        COCOPoseDataset,
    )
    from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown
    from probpose_pytorch_tpu.inference import load_predictor

    predictor = load_predictor(
        out / "checkpoints", out / "config.json", ema=True
    )
    val_ds = COCOPoseDataset(
        root / "annotations/person_keypoints_val2017.json",
        root / "val2017",
        predictor.input_size,
    )
    t0 = time.perf_counter()
    summary = evaluate_topdown(
        predictor, val_ds, batch_size=cfg.val_batch_size, verbose=True,
        calibration=True,
    )
    eval_s = time.perf_counter() - t0
    cal = summary.pop("calibration", {})
    record["eval"] = dict(
        **{k: round(v, 4) for k, v in summary.items()},
        crops=len(val_ds),
        seconds=round(eval_s, 1),
        crops_per_sec=round(len(val_ds) / eval_s, 1),
    )
    record["calibration"] = {
        branch: {
            # balanced_acc is None (strict-JSON null) on degenerate labels
            k: None if rep[k] is None else round(rep[k], 4)
            for k in ("n", "positive_rate", "balanced_acc", "ece", "mce",
                      "brier", "nll", "temperature", "ece_scaled",
                      "nll_scaled")
        }
        for branch, rep in cal.items()
    }
    print(f"[rehearsal] eval: {record['eval']}", flush=True)
    print(f"[rehearsal] calibration: {record['calibration']}", flush=True)

    # ---- 5. oracle sanity (GT-fed round trip -> AP ~= 1) -------------
    import jax.numpy as jnp

    from probpose_pytorch_tpu.codec import ProbMap

    H, W = predictor.input_size
    # full-res round trip in quick mode (a 12x16 heatmap would quantize the
    # oracle's decode); flagship uses the model's own img/4 heatmap grid
    hw = (W, H) if args.quick else (W // 4, H // 4)
    pm = ProbMap((W, H), hw, sigmas=COCO_SIGMAS)

    class OracleRoundTrip:
        input_size = predictor.input_size

        def __init__(self):
            self._i = 0

        def __call__(self, crops, boxes):
            samples = [
                val_ds[min(self._i + j, len(val_ds) - 1)]
                for j in range(len(crops))
            ]
            self._i += len(crops)
            kpts = np.stack([s["keypoints"] for s in samples])
            vis = np.stack([s["keypoints_visible"] for s in samples])
            enc = pm.encode(jnp.asarray(kpts), jnp.asarray(vis))
            dec, scores = pm.decode(enc["heatmaps"])
            return dict(
                keypoints=np.asarray(dec),
                scores=np.asarray(scores),
                probabilities=np.ones((len(crops), 1, kpts.shape[1])),
            )

    oracle = evaluate_topdown(
        OracleRoundTrip(), val_ds, batch_size=cfg.val_batch_size
    )
    record["oracle"] = {k: round(v, 4) for k, v in oracle.items()}
    print(f"[rehearsal] oracle: {record['oracle']}", flush=True)
    assert oracle["AP"] > 0.9, f"oracle AP {oracle['AP']} — eval plumbing broken"

    (out / "rehearsal.json").write_text(json.dumps(record, indent=2))
    print(f"[rehearsal] record -> {out / 'rehearsal.json'}", flush=True)


if __name__ == "__main__":
    main()
