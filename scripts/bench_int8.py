"""int8 backbone forward vs bf16 at ViT-S and ViT-B geometry.

docs/PERF.md recorded int8 as HBM-bound-unprofitable at ViT-S (the
quantize/dequantize elementwise passes outweigh the MXU savings) and
predicted the trade flips at larger width. This measures that prediction:
backbone-only forward, batch 256, dynamic row quantization.

Usage: python -u scripts/bench_int8.py [vit-s|vit-b]
"""

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.models.vit import ViTBackbone, ViTConfig
from probpose_pytorch_tpu.models.vit_int8 import (
    quantize_vit_params,
    vit_forward_int8,
)
from probpose_pytorch_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)
from probpose_pytorch_tpu.utils.profiling import measure_fn_time

enable_compilation_cache()

name = sys.argv[1] if len(sys.argv) > 1 else "vit-b"
preset = ViTConfig.PRESETS[name]
B = 256
images = jnp.asarray(
    np.random.default_rng(0).normal(size=(B, 256, 192, 3)), jnp.float32
)

backbone = ViTBackbone(
    img_size=(256, 192),
    patch_size=16,
    dtype=jnp.bfloat16,
    softmax_dtype=jnp.bfloat16,
    **preset,
)
variables = jax.jit(partial(backbone.init, train=False))(
    jax.random.PRNGKey(0), images[:1]
)

t_bf16 = measure_fn_time(
    lambda d: backbone.apply(d[0], d[1], train=False),
    (variables, images),
    short_n=1,
    long_n=5,
)
print(f"{name} bf16 fwd: {t_bf16 * 1e3:7.2f} ms", flush=True)

qp = quantize_vit_params(variables["params"], preset["depth"])
fwd8 = partial(
    vit_forward_int8,
    patch_size=16,
    depth=preset["depth"],
    num_heads=preset["num_heads"],
)
t_int8 = measure_fn_time(
    lambda d: fwd8(d[0], d[1]), (qp, images), short_n=1, long_n=5
)
print(
    f"{name} int8 fwd: {t_int8 * 1e3:7.2f} ms "
    f"({t_bf16 / t_int8:.2f}x vs bf16)",
    flush=True,
)
