"""A/B: SimCC head vs ProbMap head serving throughput at flagship geometry.

Same harness as bench.py (chained-differencing inside one jit, median of
repeats): fused crop -> ViT-S bf16 forward -> decode, batch = the tuned
serving batch. Only the head family differs — ProbMap's deconv pyramid +
2-D expected-value decode vs SimCC's two dense projections + two 1-D
argmax decodes. Records the speed side of the family tradeoff for
docs/PERF.md (accuracy is dataset-dependent and needs a real training
run).

Usage: python scripts/bench_simcc.py
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPEATS = 5


def _pipeline(head_type: str):
    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from probpose_pytorch_tpu.codec import ProbMap
    from probpose_pytorch_tpu.codec_simcc import SimCCLabel
    from probpose_pytorch_tpu.models.model import ModelConfig, build_model
    from probpose_pytorch_tpu.ops.preprocess import crop_resize

    cfg = ModelConfig(
        img_size=(256, 192),
        num_keypoints=17,
        backbone="vit-s",
        head_type=head_type,
        compute_dtype="bfloat16",
        deconv_out_channels=(256, 256),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((4, 3), (2, 2), (2, 2)),
        normalize=1.0,
        softmax_dtype="bfloat16",
        attn_impl="fused",
    )
    model = build_model(cfg)
    if head_type == "simcc":
        label = SimCCLabel(
            (cfg.img_size[1], cfg.img_size[0]),
            split_ratio=cfg.simcc_split_ratio,
            sigmas=np.full(cfg.num_keypoints, 0.05, np.float32),
        )

        def decode(loc):
            return label.decode_axis_pair(*loc)
    else:
        W, H = cfg.heatmap_size
        probmap = ProbMap(
            (cfg.img_size[1], cfg.img_size[0]),
            (W, H),
            sigmas=np.full(cfg.num_keypoints, 0.05, np.float32),
            sigma=2.0,
        )

        def decode(loc):
            return probmap.decode(loc)

    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.img_size, 3))
    )

    def pipeline(variables, frames, boxes):
        crops = crop_resize(frames, boxes, cfg.img_size, "bilinear_matmul")
        loc, probs, *_ = model.apply(variables, crops, train=False)
        coords, scores = decode(loc)
        return coords, scores, probs

    return pipeline, variables


def _rate(head_type: str, batch: int) -> tuple[float, float, float]:
    import jax
    import jax.numpy as jnp
    from functools import partial

    pipeline, variables = _pipeline(head_type)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, 320, 256, 3), dtype=np.uint8)
    )
    boxes = jnp.asarray(
        rng.uniform([0, 0, 120, 180], [60, 60, 196, 260], (batch, 4)).astype(
            np.float32
        )
    )

    @partial(jax.jit, static_argnums=(3,))
    def chained(variables, frames, boxes, n_iters):
        def body(_, carry):
            b = boxes + carry * 1e-6
            coords, scores, probs = pipeline(variables, frames, b)
            return jnp.mean(coords) * 1e-6

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    def timed(n):
        t0 = time.perf_counter()
        float(chained(variables, frames, boxes, n))
        return time.perf_counter() - t0

    short_n, long_n = 2, 22
    timed(short_n)
    timed(long_n)
    samples = []
    for _ in range(REPEATS):
        t_short = timed(short_n)
        t_long = timed(long_n)
        samples.append((t_long - t_short) / (long_n - short_n))
    rates = sorted(batch / s for s in samples)
    return float(np.median(rates)), rates[0], rates[-1]


def _train_rate(head_type: str, B: int = 128) -> tuple[float, float]:
    """(ms/step, crops/s) for the fused flagship train step (bench.py's
    harness with the head family swapped)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from probpose_pytorch_tpu.data import (
        SyntheticPoseDataset,
        batch_iterator,
    )
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.train.loop import make_train_step

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(256, 192), num_keypoints=17, backbone="vit-s",
            head_type=head_type, compute_dtype="bfloat16",
            deconv_out_channels=(256, 256), deconv_kernel_sizes=(4, 4),
            pool_sizes=((4, 3), (2, 2), (2, 2)), normalize=1.0,
            attn_impl="fused",
        ),
        train_batch_size=B,
        out_dir=f"/tmp/probpose_bench_train_{head_type}",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1000)
    ds = SyntheticPoseDataset(B, cfg.model.img_size, 17)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, B, num_workers=1))).items()
    }
    step = make_train_step(
        trainer.model, trainer.encode_codec, trainer.loss_fn, trainer.tx, cfg
    )

    @partial(jax.jit, static_argnums=(2,))
    def chained(state, batch, n):
        def body(_, s):
            s2, _ = step(s, batch)
            return s2

        final = jax.lax.fori_loop(0, n, body, state)
        return sum(
            jnp.sum(jnp.abs(l).astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(final.params)
        )

    def timed(n):
        t0 = time.perf_counter()
        float(chained(trainer.state, batch, n))
        return time.perf_counter() - t0

    timed(1)
    timed(5)
    samples = sorted((timed(5) - timed(1)) / 4 for _ in range(REPEATS))
    med = float(np.median(samples))
    return med * 1e3, B / med


def main() -> None:
    from probpose_pytorch_tpu.inference import tuned_serving_batch

    batch = tuned_serving_batch(default=256)
    out = {"batch": batch, "repeats": REPEATS}
    for head in ("probmap", "simcc"):
        med, lo, hi = _rate(head, batch)
        train_ms, train_cps = _train_rate(head)
        out[head] = {
            "crops_per_sec": round(med, 1),
            "min": round(lo, 1),
            "max": round(hi, 1),
            "train_step_ms": round(train_ms, 1),
            "train_crops_per_sec": round(train_cps, 1),
        }
    out["simcc_speedup"] = round(
        out["simcc"]["crops_per_sec"] / out["probmap"]["crops_per_sec"], 3
    )
    out["simcc_train_speedup"] = round(
        out["simcc"]["train_crops_per_sec"]
        / out["probmap"]["train_crops_per_sec"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
