"""Serving throughput across model families (conv-s / vit-s / vit-b) at
256x192, same pipeline as bench.py."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.codec import ProbMap
from probpose_pytorch_tpu.models.model import ModelConfig, build_model
from probpose_pytorch_tpu.ops.preprocess import crop_resize

B = 256
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (B, 320, 256, 3), dtype=np.uint8))
boxes = jnp.asarray(
    rng.uniform([0, 0, 120, 180], [60, 60, 196, 260], (B, 4)).astype(np.float32)
)

for name in ["conv-t", "conv-s", "vit-s", "vit-b"]:
    cfg = ModelConfig(
        img_size=(256, 192), num_keypoints=17, backbone=name,
        compute_dtype="bfloat16", softmax_dtype="bfloat16",
        deconv_out_channels=(256, 256), deconv_kernel_sizes=(4, 4),
        pool_sizes=((4, 3), (2, 2), (2, 2)), normalize=1.0,
    )
    model = build_model(cfg)
    W, H = cfg.heatmap_size
    codec = ProbMap((192, 256), (W, H), sigmas=np.full(17, 0.05, np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)), train=False
    )

    def pipeline(variables, frames, boxes):
        crops = crop_resize(frames, boxes, cfg.img_size, "bilinear_matmul")
        hm, probs, *_ = model.apply(variables, crops, train=False)
        coords, scores = codec.decode(hm)
        return coords, scores, probs

    @partial(jax.jit, static_argnums=(3,))
    def chained(variables, frames, boxes, n):
        def body(_, carry):
            out = pipeline(variables, frames, boxes + carry * 1e-6)
            return jnp.mean(out[0]) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def timed(n):
        t0 = time.perf_counter()
        float(chained(variables, frames, boxes, n))
        return time.perf_counter() - t0

    timed(2); timed(12)
    best = min((timed(12) - timed(2)) / 10 for _ in range(3))
    print(f"{name:8s} {best*1e3:7.2f} ms/batch  {B/best:8.0f} crops/s")
