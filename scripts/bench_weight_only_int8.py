"""Weight-only int8: does halving weight HBM bytes cut weight-bound latency?

Hypothesis: at tiny token counts a wide Dense layer is weight-bandwidth-
bound (e.g. ViT-H fc1 at one 192-token crop: 13.1 MB of bf16 weights vs
2.5 GF of compute — ~16 µs of bytes vs ~13 µs of FLOPs at v5e peak), so
storing int8 weights (+per-channel scales) and dequantizing on the fly
should approach 2× on the weight-read time IF XLA fuses the
convert-and-scale into the matmul's weight load instead of materializing a
bf16 scratch copy. At throughput batches the matmul is FLOP-bound and the
answer should be parity-at-best.

Measures a ViT-H-geometry fc1 (C=1280 -> 5120) at token counts spanning one
crop to a throughput batch, bf16 weights vs weight-only int8
(ops/quant.py:weight_only_matmul), chained-differencing methodology.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, *args, iters=200):
    import jax

    @partial(jax.jit, static_argnums=(len(args),))
    def chained(*a):
        *xs, n = a
        x = xs[0]
        # output-shaped carry feeds a sub-noise perturbation back into the
        # input so XLA cannot hoist iterations out of the loop
        y0 = fn(x, *xs[1:])

        def body(_, acc):
            return fn(x + acc[..., :1] * 1e-9, *xs[1:])

        import jax.lax as lax

        return lax.fori_loop(0, n, body, y0).sum()

    def timed(n):
        t0 = time.perf_counter()
        float(chained(*args, n))
        return time.perf_counter() - t0

    short, long_ = 10, 10 + iters
    timed(short)
    timed(long_)
    samples = sorted(
        (timed(long_) - timed(short)) / (long_ - short) for _ in range(5)
    )
    return samples[2]  # median


def main() -> None:
    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.ops.quant import (
        quantize_weight,
        weight_only_matmul,
    )
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    C, H = 1280, 5120  # ViT-H fc1 geometry
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (C, H)).astype(np.float32))
    w_bf = w.astype(jnp.bfloat16)
    w_q, w_scale = quantize_weight(w)
    bias = jnp.zeros((H,), jnp.float32)

    rows = []
    for tokens in (192, 768, 3072, 12288):
        x = jnp.asarray(
            rng.normal(0, 1, (tokens, C)).astype(np.float32)
        ).astype(jnp.bfloat16)

        t_bf = measure(lambda a, wm=w_bf: a @ wm, x)
        t_wo = measure(
            lambda a, q=w_q, s=w_scale, b=bias: weight_only_matmul(a, q, s, b),
            x,
        )
        rows.append(
            {
                "tokens": tokens,
                "bf16_us": round(t_bf * 1e6, 2),
                "weight_only_int8_us": round(t_wo * 1e6, 2),
                "speedup": round(t_bf / t_wo, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # numeric sanity
    y_ref = (x @ w.astype(jnp.bfloat16)).astype(np.float32)
    y_q = np.asarray(weight_only_matmul(x, w_q, w_scale, bias), np.float32)
    corr = float(
        np.corrcoef(y_ref.reshape(-1), y_q.reshape(-1))[0, 1]
    )
    print(json.dumps({"feature_correlation": round(corr, 6)}))


if __name__ == "__main__":
    main()
