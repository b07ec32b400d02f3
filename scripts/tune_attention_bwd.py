"""Backward-pass levers for the packed Pallas attention (VERDICT r2 item #5).

Three experiments at training geometries, all paired in-process A/Bs with the
chained-differencing methodology:

  1. backward group-size sweep (the production bwd group is a halved-forward
     heuristic — measure whether another size wins per geometry);
  2. bf16 score/probability accumulation in the backward's dV/dP matmuls
     (f32 accumulation is the current default; scores stay f32 either way);
  3. forward group re-check at the training batch (the serving tune picked
     4 at B=256 — confirm at B=128).

Usage: python scripts/tune_attention_bwd.py [--batch 128] [--preset vit-s]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root


def bwd_kernel_variant(accum_bf16: bool):
    """Copy of the production backward kernel with switchable accumulation
    dtype for the dV/dP matmuls (experiment #2; the production kernel is
    ops/pallas/attention_kernel.py:_packed_bwd_kernel)."""
    import jax
    import jax.numpy as jnp

    acc = jnp.bfloat16 if accum_bf16 else jnp.float32

    def kernel(qkv_ref, do_ref, dqkv_ref, *, heads: int, scale: float):
        G, N, C3 = qkv_ref.shape
        C = C3 // 3
        d = C // heads
        for g in range(G):
            x = qkv_ref[g]
            for h in range(heads):
                q = x[:, h * d:(h + 1) * d]
                k = x[:, C + h * d:C + (h + 1) * d]
                v = x[:, 2 * C + h * d:2 * C + (h + 1) * d]
                do = do_ref[g][:, h * d:(h + 1) * d]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                pb = p.astype(do.dtype)
                dv = jax.lax.dot_general(
                    pb, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc,
                )
                dsum = jnp.sum(
                    dp.astype(jnp.float32) * p, axis=-1, keepdims=True
                )
                ds = (p * (dp - dsum) * scale).astype(do.dtype)
                dq = jax.lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                dk = jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                dqkv_ref[g, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
                dqkv_ref[g, :, C + h * d:C + (h + 1) * d] = dk.astype(
                    dqkv_ref.dtype
                )
                dqkv_ref[g, :, 2 * C + h * d:2 * C + (h + 1) * d] = dv.astype(
                    dqkv_ref.dtype
                )

    return kernel


def run_bwd(qkv, do, heads, group, accum_bf16=False, vmem_limit_bytes=None):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C3 = qkv.shape
    C = C3 // 3
    scale = 1.0 / np.sqrt(C // heads)
    qkv_spec = pl.BlockSpec((group, N, C3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((group, N, C), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    kw = {}
    if vmem_limit_bytes is not None:
        # Per-kernel scoped-VMEM ceiling (scripts/tune_vmem_limit.py):
        # lets groups the default ~16 MB limit rejects compile.
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
        )
    return pl.pallas_call(
        functools.partial(
            bwd_kernel_variant(accum_bf16), heads=heads, scale=scale
        ),
        grid=(pl.cdiv(B, group),),
        in_specs=[qkv_spec, do_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        **kw,
    )(qkv, do)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="vit-s")
    ap.add_argument("--groups", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.ops.pallas.attention_kernel import (
        _auto_group,
        _packed_fwd,
    )
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )
    from probpose_pytorch_tpu.utils.profiling import measure_fn_time

    enable_compilation_cache()
    geo = ViTConfig.PRESETS[args.preset]
    C, heads = geo["embed_dim"], geo["num_heads"]
    B, N = args.batch, 192  # flagship 256x192/p16 token count

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * C)).astype(np.float32), jnp.bfloat16
    )
    do = jnp.asarray(
        rng.normal(size=(B, N, C)).astype(np.float32), jnp.bfloat16
    )

    auto_fwd = _auto_group(qkv.shape, None)
    auto_bwd = max(_auto_group(qkv.shape, None, cap=8) // 2, 1)
    print(f"{args.preset} B={B} N={N} C={C}: auto fwd group {auto_fwd}, "
          f"auto bwd group {auto_bwd}", flush=True)

    groups = [int(g) for g in args.groups.split(",")]
    print("-- backward group sweep (f32 accumulation) --", flush=True)
    ref = None
    for g in groups:
        try:
            fn = lambda inp, g=g: run_bwd(inp[0], inp[1], heads, g).astype(
                jnp.float32
            ).sum(axis=(1, 2))
            sec = measure_fn_time(fn, (qkv, do), short_n=2, long_n=12)
            out = run_bwd(qkv, do, heads, g)
        except Exception as e:
            print(f"  group {g}: infeasible ({str(e).splitlines()[0][:90]})",
                  flush=True)
            continue
        if ref is None:
            ref = out
        dmax = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"  group {g}: {sec * 1e3:7.3f} ms  (maxdiff vs g{groups[0]}: "
              f"{dmax:.1e})", flush=True)

    print("-- backward bf16 accumulation (at auto group) --", flush=True)
    for accum_bf16 in (False, True):
        fn = lambda inp, a=accum_bf16: run_bwd(
            inp[0], inp[1], heads, auto_bwd, a
        ).astype(jnp.float32).sum(axis=(1, 2))
        sec = measure_fn_time(fn, (qkv, do), short_n=2, long_n=12)
        out = run_bwd(qkv, do, heads, auto_bwd, accum_bf16)
        dmax = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        print(f"  accum {'bf16' if accum_bf16 else 'f32 '}: {sec * 1e3:7.3f} ms"
              f"  (maxdiff vs f32/g{groups[0]}: {dmax:.1e})", flush=True)

    print("-- forward group sweep --", flush=True)
    for g in groups:
        try:
            fn = lambda inp, g=g: _packed_fwd(inp, heads, g, False).astype(
                jnp.float32
            ).sum(axis=(1, 2))
            sec = measure_fn_time(fn, qkv, short_n=2, long_n=12)
        except Exception as e:
            print(f"  group {g}: infeasible ({str(e).splitlines()[0][:90]})",
                  flush=True)
            continue
        print(f"  group {g}: {sec * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
