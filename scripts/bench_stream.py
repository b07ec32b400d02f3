"""Wall-clock stream serving: sequential per-batch calls vs predict_stream.

Unlike bench.py (chained-in-jit differencing, which deliberately EXCLUDES
host<->device transfers to measure chip throughput), this measures the
production stream path WITH transfers: a sequence of (frames, boxes) batches
served back to back. `predict_stream(depth=2)` keeps one batch in flight so
the upload/download of batch i+1 overlaps batch i's compute; the sequential
loop serializes upload -> compute -> download per batch.

Caveat for this environment: the test device tunnels through a relay, so
transfer latency here is far above production interconnect — the overlap win
reported is therefore an upper bound for tunnel-like links and a lower bound
on chip utilization. The chip-throughput headline remains bench.py's.

Usage: python scripts/bench_stream.py [--batches 6] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, default=6)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--depth", type=int, default=2)
    args = parser.parse_args()

    import jax

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from probpose_pytorch_tpu.inference import (
        TopDownPredictor,
        tuned_serving_batch,
    )
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    B = args.batch or tuned_serving_batch(default=256)
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(256, 192),
            num_keypoints=17,
            backbone="vit-s",
            compute_dtype="bfloat16",
            deconv_out_channels=(256, 256),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((4, 3), (2, 2), (2, 2)),
            normalize=1.0,
            attn_impl="fused",
        ),
        out_dir="/tmp/probpose_tpu_bench_stream",
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
    batches = []
    for _ in range(args.batches):
        frames = rng.integers(0, 256, (B, 320, 256, 3), dtype=np.uint8)
        boxes = rng.uniform(
            [0, 0, 120, 180], [60, 60, 196, 260], (B, 4)
        ).astype(np.float32)
        batches.append((frames, boxes))

    # Warm both paths (compile + tunnel handshake).
    predictor(*batches[0])
    list(predictor.predict_stream(iter(batches[:2]), depth=args.depth))

    t0 = time.perf_counter()
    for frames, boxes in batches:
        predictor(frames, boxes)
    dt_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in predictor.predict_stream(iter(batches), depth=args.depth):
        pass
    dt_stream = time.perf_counter() - t0

    total = args.batches * B
    print(
        json.dumps(
            {
                "batch": B,
                "batches": args.batches,
                "depth": args.depth,
                "sequential_s": round(dt_seq, 3),
                "stream_s": round(dt_stream, 3),
                "sequential_crops_per_sec": round(total / dt_seq, 1),
                "stream_crops_per_sec": round(total / dt_stream, 1),
                "speedup": round(dt_seq / dt_stream, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
