"""Evaluation CLI: checkpoint (or deployed bundle) -> COCO keypoint AP.

    python -m probpose_pytorch_tpu.eval.run \
        --checkpoint runs/x/checkpoints [--config runs/x/config.json] \
        --annotations person_keypoints_val2017.json --images val2017/ \
        [--batch-size 64] [--max-samples N] [--ema]
    # or evaluate exactly what production serves (no model code needed):
    #   --bundle export_dir/   (batch size snaps to an exported bucket)

Streams the val set through the fused top-down pipeline and prints the COCO
keypoint summary as one JSON line.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _parse_temperatures(spec: str) -> dict[str, float]:
    """--apply-temperature value: a --calibration-dump JSON path (each
    branch's fitted `temperature` is used) or 'presence=T,visibility=T'."""
    path = Path(spec)
    if path.suffix == ".json" or path.exists():
        dumped = json.loads(path.read_text())
        return {
            branch: float(rep["temperature"])
            for branch, rep in dumped.items()
        }
    out: dict[str, float] = {}
    for part in spec.split(","):
        branch, sep, t = part.partition("=")
        if not sep:
            raise SystemExit(
                f"--apply-temperature: bad spec {part!r} (want branch=T "
                "or a calibration-dump JSON path)"
            )
        out[branch.strip()] = float(t)
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="ProbPose-TPU COCO eval")
    src = parser.add_mutually_exclusive_group(required=False)
    src.add_argument("--checkpoint", type=Path,
                     help="Orbax checkpoint directory (live predictor)")
    src.add_argument("--bundle", type=Path,
                     help="exported StableHLO bundle directory")
    src.add_argument(
        "--score-predictions", type=Path, metavar="RESULTS_JSON",
        help="model-free: re-score a COCO keypoint-results file "
        "(--dump-predictions output, or any pycocotools-format results "
        "list) against the annotations",
    )
    src.add_argument(
        "--bottomup", type=Path, metavar="RUN_DIR",
        help="single-stage pose run directory (detect.train --keypoints K "
        "output): one forward per frame yields every pose — no boxes, no "
        "crops",
    )
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--annotations", type=Path, required=True)
    parser.add_argument("--images", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--bbox-scale", type=float, default=1.25)
    parser.add_argument("--ema", action="store_true")
    parser.add_argument(
        "--flip-test",
        action="store_true",
        help="flip-test TTA (average with the mirrored forward; COCO-17 "
        "left/right pairs)",
    )
    parser.add_argument(
        "--scale-test", type=str, default="",
        help="multi-scale TTA: comma-separated box scales "
        "(e.g. '0.9,1.0,1.1'); decode per scale, average in frame space",
    )
    parser.add_argument(
        "--scale-test-scores", choices=["unit", "mean"], default="unit",
        help="confidence fields under multi-scale TTA: 'unit' keeps the "
        "unit-scale forward's scores (off-scale confidences scramble AP "
        "ranking); 'mean' averages them",
    )
    parser.add_argument(
        "--calibration",
        action="store_true",
        help="report confidence calibration (ECE/MCE/Brier/NLL + fitted "
        "temperature) for the presence and visibility probability branches",
    )
    parser.add_argument(
        "--calibration-dump", type=Path, default=None,
        help="with --calibration: write the full per-branch reliability "
        "histograms + metrics to this JSON file",
    )
    parser.add_argument(
        "--per-joint",
        action="store_true",
        help="report per-keypoint EPE / PCK@0.2 (which joints hurt)",
    )
    parser.add_argument(
        "--dump-worst", type=int, default=0, metavar="N",
        help="write the N lowest-OKS instances (crop overlays: prediction "
        "red, GT green + worst.json index) for error triage",
    )
    parser.add_argument(
        "--dump-worst-dir", type=Path, default=Path("worst_cases"),
        help="output directory for --dump-worst (default: worst_cases/)",
    )
    parser.add_argument(
        "--apply-temperature", type=str, default=None,
        help="apply fitted per-branch temperature scaling to the "
        "probability outputs before scoring: either a --calibration-dump "
        "JSON from a prior run (uses each branch's fitted temperature) or "
        "an inline spec like 'presence=1.8,visibility=1.2'",
    )
    parser.add_argument(
        "--detector", type=Path, default=None,
        help="person-detector run directory (detect.train CLI output): "
        "evaluate END TO END with the framework's own detections instead "
        "of GT boxes (the real COCO protocol; reports the detector's box "
        "AP@0.5 alongside the keypoint summary)",
    )
    parser.add_argument(
        "--detector-threshold", type=float, default=0.3,
        help="with --detector: detection score threshold",
    )
    parser.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard eval batches over all devices (dp mesh); the batch "
        "size is rounded up to a device-count multiple",
    )
    parser.add_argument(
        "--model-parallel",
        type=int,
        default=1,
        help="with --data-parallel: shard attention heads over a model "
        "axis of this size (tensor-parallel serving for big backbones)",
    )
    parser.add_argument(
        "--dump-predictions", type=Path, default=None, metavar="OUT_JSON",
        help="write predictions in the official COCO keypoint-results "
        "format (pycocotools loadRes / COCO-server compatible; re-score "
        "offline with --score-predictions)",
    )
    args = parser.parse_args(argv)

    from probpose_pytorch_tpu.data.coco import COCOPoseDataset
    from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown
    from probpose_pytorch_tpu.inference import load_predictor

    if args.score_predictions is not None:
        from probpose_pytorch_tpu.eval.results import (
            load_results,
            score_results,
        )

        dataset = COCOPoseDataset(
            args.annotations, args.images, (256, 192),
            bbox_scale=args.bbox_scale,
        )
        summary = score_results(load_results(args.score_predictions), dataset)
        print(json.dumps({k: round(float(v), 4) for k, v in summary.items()}))
        return
    if args.bottomup is not None:
        from probpose_pytorch_tpu.detect.pipeline import evaluate_bottomup
        from probpose_pytorch_tpu.detect.train import load_bottomup

        bu_mesh = None
        if args.data_parallel:
            import jax

            from probpose_pytorch_tpu.parallel import make_mesh

            if len(jax.devices()) > 1:
                bu_mesh = make_mesh(len(jax.devices()))
        predictor = load_bottomup(
            args.bottomup,
            score_threshold=args.detector_threshold,
            mesh=bu_mesh,
        )
        summary = evaluate_bottomup(
            predictor,
            args.annotations,
            args.images,
            max_images=args.max_samples,
            verbose=True,
        )
        print(json.dumps({k: round(float(v), 4) for k, v in summary.items()}))
        return
    if args.checkpoint is None and args.bundle is None:
        parser.error(
            "one of --checkpoint / --bundle / --score-predictions / "
            "--bottomup is required"
        )

    if args.bundle and (
        args.ema or args.flip_test or args.scale_test or args.data_parallel
        or args.apply_temperature
    ):
        parser.error(
            "--ema/--flip-test/--scale-test/--apply-temperature are baked "
            "into bundles at export; --data-parallel needs a live predictor"
        )
    calibration = (
        _parse_temperatures(args.apply_temperature)
        if args.apply_temperature
        else None
    )
    mesh = None
    if args.data_parallel:
        import jax

        from probpose_pytorch_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        if n_dev > 1:
            mesh = make_mesh(n_dev, model_parallel=args.model_parallel)
            dp = n_dev // args.model_parallel
            args.batch_size = -(-args.batch_size // dp) * dp
    if args.bundle:
        from probpose_pytorch_tpu.serve import ServingBundle

        predictor = ServingBundle.load(args.bundle)
        # the bundle only compiled its bucket ladder: snap the batch size
        if args.batch_size not in predictor.buckets:
            snapped = max(
                (b for b in predictor.buckets if b <= args.batch_size),
                default=predictor.buckets[0],
            )
            print(f"[eval] batch {args.batch_size} -> bucket {snapped}")
            args.batch_size = snapped
    else:
        predictor = load_predictor(
            args.checkpoint,
            args.config,
            ema=args.ema,
            mesh=mesh,
            flip_test=args.flip_test,
            scale_test=tuple(
                float(s) for s in args.scale_test.split(",") if s.strip()
            ),
            scale_test_scores=args.scale_test_scores,
            calibration=calibration,
        )
    if args.detector is not None:
        if args.calibration or args.per_joint or args.dump_worst:
            parser.error(
                "--detector reports the end-to-end AP summary; "
                "--calibration/--per-joint/--dump-worst need the GT-box "
                "crop stream (instance-matched GT)"
            )
        from probpose_pytorch_tpu.detect.pipeline import (
            evaluate_detector_topdown,
        )
        from probpose_pytorch_tpu.detect.train import load_detector

        det_dir = args.detector
        if (det_dir / "checkpoints").exists():
            det_dir = det_dir / "checkpoints"
        detector = load_detector(
            det_dir, score_threshold=args.detector_threshold, mesh=mesh
        )
        summary = evaluate_detector_topdown(
            predictor,
            detector,
            args.annotations,
            args.images,
            bbox_scale=args.bbox_scale,
            max_images=args.max_samples,
            verbose=True,
        )
        print(json.dumps({k: round(float(v), 4) for k, v in summary.items()}))
        return
    dataset = COCOPoseDataset(
        args.annotations,
        args.images,
        predictor.input_size,
        bbox_scale=args.bbox_scale,
    )
    summary = evaluate_topdown(
        predictor,
        dataset,
        batch_size=args.batch_size,
        max_samples=args.max_samples,
        calibration=args.calibration,
        per_joint=args.per_joint,
        track_instances=args.dump_worst > 0,
        collect_predictions=args.dump_predictions is not None,
    )
    cal = summary.pop("calibration", {})
    joints = summary.pop("per_joint", {})
    instances = summary.pop("instances", [])
    preds = summary.pop("predictions", [])
    if args.dump_predictions is not None:
        from probpose_pytorch_tpu.eval.results import save_results

        args.dump_predictions.parent.mkdir(parents=True, exist_ok=True)
        save_results(preds, args.dump_predictions)
        print(
            f"[eval] {len(preds)} COCO-format results -> "
            f"{args.dump_predictions}"
        )
    line = {k: round(v, 4) for k, v in summary.items()}
    for branch, rep in cal.items():
        for key in ("ece", "mce", "brier", "nll", "temperature"):
            line[f"{key}_{branch}"] = round(rep[key], 4)
    print(json.dumps(line))
    if joints:
        worst = sorted(joints, key=lambda n: -joints[n]["EPE"])[:3]
        for name, rep in joints.items():
            mark = "  <- worst" if name in worst else ""
            print(
                f"[eval] {name:>16s}  n={rep['n']:>6d}  "
                f"EPE={rep['EPE']:7.2f}px  "
                f"PCK@0.2={rep['PCK@0.2']:.4f}{mark}"
            )
    if args.dump_worst > 0 and instances:
        from probpose_pytorch_tpu.eval.analysis import dump_worst_cases

        rows = dump_worst_cases(
            dataset, instances, args.dump_worst_dir, n=args.dump_worst
        )
        print(
            f"[eval] {len(rows)} worst instances (OKS "
            f"{rows[0]['oks']:.3f}..{rows[-1]['oks']:.3f}) -> "
            f"{args.dump_worst_dir}/"
        )
    if args.calibration_dump is not None and cal:
        args.calibration_dump.parent.mkdir(parents=True, exist_ok=True)
        args.calibration_dump.write_text(json.dumps(cal, indent=1))
        print(f"[eval] calibration report -> {args.calibration_dump}")
        from probpose_pytorch_tpu.viz import reliability_diagram

        for branch, rep in cal.items():
            png = args.calibration_dump.with_name(
                f"{args.calibration_dump.stem}_{branch}.png"
            )
            reliability_diagram(
                rep["bins"],
                title=f"{branch}: ECE {rep['ece']:.3f} T {rep['temperature']:.2f}",
            ).save(png)
            print(f"[eval] reliability diagram -> {png}")


if __name__ == "__main__":
    main()
