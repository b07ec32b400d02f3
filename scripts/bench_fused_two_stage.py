"""Fused two-stage serving A/B: one jitted program (detect/fused.py) vs
the two-dispatch standalone path (detector program -> host box round-trip
-> pose program) at the flagship geometry.

Wall-clock methodology (NOT chained differencing): the quantity under
test IS the dispatch/host-sync overhead between the stages, which
chaining-inside-jit would define away. Each sample times a full
blocking frame->poses call; the tunneled link's per-dispatch latency is
part of both paths' honest cost, and the fused path pays it once.

Usage:
    python scripts/bench_fused_two_stage.py [--frames 1|8] [--people 8]

Writes docs/bench_fused_r3.json when --record is passed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root


def _build(people: int):
    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.detect import (
        DetectorPredictor,
        FusedTwoStagePredictor,
        PersonDetector,
    )
    import functools

    from probpose_pytorch_tpu.codec import Codec, ProbMap
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig, build_model
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    det_model = PersonDetector(img_size=(512, 512), preset="conv-t")
    det_vars = det_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)), train=False
    )
    detector = DetectorPredictor(
        model=det_model, variables=det_vars, max_detections=people
    )
    cfg = ModelConfig(
        img_size=(256, 192), num_keypoints=17, backbone="vit-s",
        compute_dtype="bfloat16", deconv_out_channels=(256, 256),
        deconv_kernel_sizes=(4, 4), pool_sizes=((4, 3), (2, 2), (2, 2)),
        normalize=1.0, attn_impl="fused",
    )
    pose_model = build_model(cfg)
    W, H = cfg.heatmap_size
    codec = Codec(
        ProbMap(
            (cfg.img_size[1], cfg.img_size[0]), (W, H),
            sigmas=np.full(cfg.num_keypoints, 0.05, np.float32),
            sigma=2.0,
        )
    )
    pose_vars = jax.jit(functools.partial(pose_model.init, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 192, 3))
    )
    pose = TopDownPredictor(
        model=pose_model, variables=pose_vars, codec=codec,
        input_size=cfg.img_size,
    )
    fused = FusedTwoStagePredictor(
        detector=detector, pose=pose, max_people=people
    )
    return detector, pose, fused


def _two_stage_call(detector, pose, frames: np.ndarray, people: int):
    """The standalone path's work per batch: detector dispatch, host
    box readback + expansion, pose dispatch (all boxes at the static
    people-count, like the fused program — the comparison isolates the
    program count and host round-trip, not the padding policy)."""
    from probpose_pytorch_tpu.detect.pipeline import expand_detections

    det_boxes, det_scores = detector(frames)  # blocks: host needs boxes
    B = len(frames)
    crop_boxes = np.stack(
        [
            expand_detections(det_boxes[i, :people], pose.input_size, 1.25)
            for i in range(B)
        ]
    ).reshape(B * people, 4)
    ids = np.repeat(np.arange(B, dtype=np.int32), people)
    return pose(frames, crop_boxes, frame_ids=ids)


def _time(fn, warmup: int = 5, iters: int = 40) -> dict:
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    return {
        "median_ms": round(samples[len(samples) // 2], 3),
        "min_ms": round(samples[0], 3),
        "max_ms": round(samples[-1], 3),
        "iters": iters,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--people", type=int, default=8)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--record", action="store_true",
                    help="write docs/bench_fused_r3.json")
    args = ap.parse_args()

    detector, pose, fused = _build(args.people)
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 256, (args.frames, 480, 640, 3), dtype=np.uint8
    )

    rec = {
        "frames": args.frames,
        "people": args.people,
        "frame_hw": [480, 640],
        "two_stage": _time(
            lambda: _two_stage_call(detector, pose, frames, args.people),
            iters=args.iters,
        ),
        "fused": _time(lambda: fused(frames), iters=args.iters),
    }
    rec["speedup_median"] = round(
        rec["two_stage"]["median_ms"] / rec["fused"]["median_ms"], 3
    )
    print(json.dumps(rec))
    if args.record:
        out = Path(__file__).parents[1] / "docs" / "bench_fused_r3.json"
        out.write_text(json.dumps(rec, indent=2) + "\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
