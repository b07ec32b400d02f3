"""Component-level timing of the serving pipeline on the real chip, using the
same chained-loop differencing methodology as bench.py."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.codec import ProbMap
from probpose_pytorch_tpu.models.model import ModelConfig, build_model
from probpose_pytorch_tpu.ops.preprocess import crop_resize
from probpose_pytorch_tpu.ops.sparsemax import sparsemax

BATCH = 256

cfg = ModelConfig(
    img_size=(256, 192), num_keypoints=17, backbone="vit-s",
    compute_dtype="bfloat16", deconv_out_channels=(256, 256),
    deconv_kernel_sizes=(4, 4), pool_sizes=((4, 3), (2, 2), (2, 2)),
    normalize=1.0,
)
model = build_model(cfg)
W, H = cfg.heatmap_size
codec = ProbMap((192, 256), (W, H), sigmas=np.full(17, 0.05, np.float32), sigma=2.0)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)), train=False)

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (BATCH, 320, 256, 3), dtype=np.uint8))
boxes = jnp.asarray(rng.uniform([0, 0, 120, 180], [60, 60, 196, 260], (BATCH, 4)).astype(np.float32))
crops_const = jnp.asarray(rng.random((BATCH, 256, 192, 3), np.float32))
heatmaps_const = jnp.asarray(rng.random((BATCH, 17, H, W), np.float32))
feats_const = jnp.asarray(rng.random((BATCH, 16, 12, 384), np.float32).astype(np.float32))


def timeit(name, fn, dep_in, short_n=2, long_n=12):
    @partial(jax.jit, static_argnums=(1,))
    def chained(dep, n):
        def body(_, carry):
            out = fn(dep + carry * 1e-6)
            return jnp.mean(out) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    float(chained(dep_in, short_n))
    float(chained(dep_in, long_n))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(chained(dep_in, short_n)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chained(dep_in, long_n)); tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (long_n - short_n))
    print(f"{name:28s} {best*1e3:8.2f} ms/iter  ({BATCH/best:9.0f} crops/s)")
    return best


timeit("preprocess(crop_resize)", lambda b: crop_resize(frames, boxes + b[..., :1] * 0 if False else boxes * (1 + 0 * jnp.mean(b)), cfg.img_size, "bilinear_gather").mean(axis=(1, 2, 3)), boxes)
timeit("backbone(vit-s bf16)", lambda c: model.backbone.apply({"params": variables["params"]["backbone"]}, c, train=False).mean(axis=(1, 2, 3)), crops_const)


def head_fn(f):
    out = model.head.apply({"params": variables["params"]["head"], "batch_stats": variables["batch_stats"]["head"]}, f, train=False)
    return out[0].mean(axis=(1, 2, 3))


timeit("head(full, sparsemax)", head_fn, feats_const)
timeit("sparsemax only", lambda h: sparsemax(h.reshape(BATCH, 17, H * W) / 0.5).mean(axis=-1), heatmaps_const)
timeit("decode(expected-value)", lambda h: codec.decode(h)[0].mean(axis=(1, 2)), heatmaps_const)
