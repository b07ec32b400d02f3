#!/usr/bin/env python
"""Round-4 re-measurement of the frame-pipeline numbers with tight spread.

Round-3 recorded bottom-up serving as 22.5 frames/s with a 10.1-36.4
spread (+/-60%) — wall-clock samples on the tunneled link with too few
repeats. This script re-measures the three frame pipelines with the
repo's measurement bar (median of N warm samples, percentile spread
committed, target IQR/median < 5%):

  1. bottom-up serving  — BottomUpPredictor (conv-t @ 384, the rehearsal
     geometry), plain and --kpt-heatmaps variants, B=16 frames of 480x480;
  2. fused two-stage    — one jitted detect->pose program vs the
     two-dispatch path at frames=1 and frames=8 (the round-3 A/B);
  3. stream serving     — predict_stream overlap vs sequential batches
     (the video/stream mode), repeated mode-interleaved.

Weights are random inits: throughput does not depend on weight values.
Writes docs/frame_pipelines_r4.json with --record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def walltime(fn, warmup: int = 4, iters: int = 30) -> dict:
    """Median-of-N wall time per call with percentile spread."""
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1e3)
    s = np.sort(np.asarray(samples))
    med = float(np.median(s))
    p25, p75 = float(np.percentile(s, 25)), float(np.percentile(s, 75))
    return {
        "median_ms": round(med, 2),
        "p25_ms": round(p25, 2),
        "p75_ms": round(p75, 2),
        "min_ms": round(float(s[0]), 2),
        "max_ms": round(float(s[-1]), 2),
        "iqr_over_median_pct": round(100 * (p75 - p25) / med, 2),
        "iters": iters,
    }


def bench_bottomup(record: dict, iters: int) -> None:
    import jax.numpy as jnp

    from probpose_pytorch_tpu.detect.pipeline import BottomUpPredictor
    from probpose_pytorch_tpu.detect.train import DetectorTrainer
    from probpose_pytorch_tpu.utils.profiling import measure_fn_time

    rng = np.random.default_rng(0)
    B = 16
    frames = rng.integers(0, 256, (B, 480, 480, 3), dtype=np.uint8)
    for label, kpt_heatmaps in [("plain", False), ("kpt_heatmaps", True)]:
        trainer = DetectorTrainer.create(
            img_size=(384, 384), preset="conv-t", num_keypoints=17,
            kpt_heatmaps=kpt_heatmaps,
        )
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        predictor = BottomUpPredictor(
            model=trainer.model,
            variables=variables,
            score_threshold=0.3,
            max_detections=32,
        )
        # Chip-side throughput: chained differencing through the predictor's
        # own jitted program — the quantity the chip delivers, with the
        # tunnel's bandwidth jitter excluded (bench.py's methodology).
        run = predictor._fn()
        fr32 = jnp.asarray(frames, jnp.float32)
        sec = measure_fn_time(
            lambda fr: run(variables, fr)[2], fr32
        )
        t = walltime(lambda: predictor(frames), iters=iters)
        t["batch"] = B
        t["frame_hw"] = [480, 480]
        t["frames_per_s_median"] = round(B / t["median_ms"] * 1e3, 1)
        t["frames_per_s_p25_p75"] = [
            round(B / t["p75_ms"] * 1e3, 1),
            round(B / t["p25_ms"] * 1e3, 1),
        ]
        t["chip_ms_per_batch"] = round(sec * 1e3, 2)
        t["chip_frames_per_s"] = round(B / sec, 1)
        record[f"bottomup_{label}"] = t
        print(f"bottomup_{label}: {json.dumps(t)}", flush=True)
        del trainer, predictor


def bench_fused(record: dict, iters: int) -> None:
    import jax.numpy as jnp

    from bench_fused_two_stage import _build, _two_stage_call
    from probpose_pytorch_tpu.utils.profiling import measure_fn_time

    detector, pose, fused = _build(people=8)
    rng = np.random.default_rng(0)
    for n_frames in (1, 8):
        frames = rng.integers(
            0, 256, (n_frames, 480, 640, 3), dtype=np.uint8
        )
        two = walltime(
            lambda: _two_stage_call(detector, pose, frames, 8), iters=iters
        )
        fus = walltime(lambda: fused(frames), iters=iters)
        # Chip-side cost of the fused program (tunnel excluded)
        run = fused._fn()
        sec = measure_fn_time(
            lambda fr: run(
                detector.variables, pose.variables, fr
            )["keypoints"],
            jnp.asarray(frames, jnp.float32),
        )
        entry = {
            "frames": n_frames,
            "people": 8,
            "two_stage": two,
            "fused": fus,
            "fused_chip_ms": round(sec * 1e3, 2),
            "fused_chip_frames_per_s": round(n_frames / sec, 1),
            "speedup_median": round(two["median_ms"] / fus["median_ms"], 3),
        }
        record[f"fused_two_stage_f{n_frames}"] = entry
        print(f"fused f{n_frames}: speedup {entry['speedup_median']} "
              f"(two {two['median_ms']}ms iqr {two['iqr_over_median_pct']}%"
              f" / fused {fus['median_ms']}ms iqr "
              f"{fus['iqr_over_median_pct']}%; chip {entry['fused_chip_ms']}"
              f"ms)", flush=True)


def bench_stream_mode(record: dict, repeats: int) -> None:
    from probpose_pytorch_tpu.inference import (
        TopDownPredictor,
        tuned_serving_batch,
    )
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    B = tuned_serving_batch(default=256)
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(256, 192), num_keypoints=17, backbone="vit-s",
            compute_dtype="bfloat16", deconv_out_channels=(256, 256),
            deconv_kernel_sizes=(4, 4), pool_sizes=((4, 3), (2, 2), (2, 2)),
            normalize=1.0, attn_impl="fused",
        ),
        out_dir="/tmp/bench_frame_pipelines",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    predictor = TopDownPredictor(
        model=trainer.model,
        variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )
    rng = np.random.default_rng(0)
    n_batches = 6
    batches = []
    for _ in range(n_batches):
        frames = rng.integers(0, 256, (B, 320, 256, 3), dtype=np.uint8)
        boxes = rng.uniform(
            [0, 0, 120, 180], [60, 60, 196, 260], (B, 4)
        ).astype(np.float32)
        batches.append((frames, boxes))
    predictor(*batches[0])
    list(predictor.predict_stream(iter(batches[:2]), depth=2))

    seq_s, stream_s = [], []
    for _ in range(repeats):  # interleave modes so drift hits both equally
        t0 = time.perf_counter()
        for frames, boxes in batches:
            predictor(frames, boxes)
        seq_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in predictor.predict_stream(iter(batches), depth=2):
            pass
        stream_s.append(time.perf_counter() - t0)
    total = n_batches * B
    seq = np.sort(seq_s)
    stm = np.sort(stream_s)
    record["stream_mode"] = {
        "batch": B,
        "batches": n_batches,
        "repeats": repeats,
        "sequential_crops_per_sec_median": round(total / float(np.median(seq)), 1),
        "stream_crops_per_sec_median": round(total / float(np.median(stm)), 1),
        "sequential_spread_s": [round(float(seq[0]), 3), round(float(seq[-1]), 3)],
        "stream_spread_s": [round(float(stm[0]), 3), round(float(stm[-1]), 3)],
        "speedup_median": round(float(np.median(seq)) / float(np.median(stm)), 3),
    }
    print(f"stream_mode: {json.dumps(record['stream_mode'])}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stream-repeats", type=int, default=5)
    ap.add_argument("--only", choices=("bottomup", "fused", "stream"),
                    default=None)
    args = ap.parse_args()

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    record: dict = {"methodology": (
        "chip-side cost via chained differencing (measure_fn_time — the "
        "tunnel's bandwidth jitter excluded, bench.py's methodology) PLUS "
        "median-of-N warm wall-clock with p25/p75 committed for the "
        "transfer-inclusive path; wall-clock spread on this tunneled link "
        "is bandwidth-bound (tens of MB per call), so the chip-side number "
        "is the production-comparable one; modes interleaved where "
        "comparative"
    )}
    if args.only in (None, "bottomup"):
        bench_bottomup(record, args.iters)
    if args.only in (None, "fused"):
        bench_fused(record, args.iters)
    if args.only in (None, "stream"):
        bench_stream_mode(record, args.stream_repeats)
    if args.record:
        out = REPO / "docs" / "frame_pipelines_r4.json"
        out.write_text(json.dumps(record, indent=1) + "\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
