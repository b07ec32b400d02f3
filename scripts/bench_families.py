"""Serving throughput across model families at 256x192, same pipeline as
bench.py (fused preprocess -> forward -> expected-value decode).

ViT families run the packed Pallas attention (`attn_impl="fused"`); the
`vit-b-fusedmlp` row additionally enables the VMEM LN+MLP kernel
(`mlp_impl="fused"`) to probe the geometry where the kernel's HBM savings
should beat XLA's fusion (docs/PERF.md: e2e-negative at ViT-S).

Usage: python -u scripts/bench_families.py [--families vit-b,vit-b-fusedmlp]
(one or two families per invocation fits this host's compile budget; results
append to the table in docs/PERF.md by hand).
"""

import argparse
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
from probpose_pytorch_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)

FAMILIES = {
    "conv-t": dict(backbone="conv-t"),
    "conv-s": dict(backbone="conv-s"),
    "vit-s": dict(backbone="vit-s", attn_impl="fused"),
    "vit-b": dict(backbone="vit-b", attn_impl="fused"),
    "vit-b-fusedmlp": dict(
        backbone="vit-b", attn_impl="fused", mlp_impl="fused"
    ),
    "vit-l": dict(backbone="vit-l", attn_impl="fused"),
    "vit-h": dict(backbone="vit-h", attn_impl="fused"),
}

B = 256


def bench_family(name: str, overrides: dict) -> None:
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (B, 320, 256, 3), dtype=np.uint8)
    )
    boxes = jnp.asarray(
        rng.uniform(
            [0, 0, 120, 180], [60, 60, 196, 260], (B, 4)
        ).astype(np.float32)
    )
    cfg = ModelConfig(
        img_size=(256, 192), num_keypoints=17,
        compute_dtype="bfloat16", softmax_dtype="bfloat16",
        deconv_out_channels=(256, 256), deconv_kernel_sizes=(4, 4),
        pool_sizes=((4, 3), (2, 2), (2, 2)), normalize=1.0,
        **overrides,
    )
    model = build_model(cfg)
    W, H = cfg.heatmap_size
    codec = ProbMap((192, 256), (W, H), sigmas=np.full(17, 0.05, np.float32))
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3))
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

    timed(2)
    timed(12)
    best = min((timed(12) - timed(2)) / 10 for _ in range(3))
    print(
        f"{name:16s} {best * 1e3:7.2f} ms/batch  {B / best:8.0f} crops/s",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    enable_compilation_cache()
    for name in args.families.split(","):
        bench_family(name, FAMILIES[name])
