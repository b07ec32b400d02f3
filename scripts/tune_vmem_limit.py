"""Raised scoped-VMEM-limit experiment for the packed attention kernels
(ROADMAP #3's "terminal-controlled XLA flags" leftover, resolved per-kernel).

The Mosaic compiler rejects backward groups 6/8 at ViT-S (21.9 MB scoped
allocation vs the default ~16 MB ceiling; docs/PERF.md round-3 levers), so
the backward group sweep could never measure them. `XLA_FLAGS=
--xla_tpu_scoped_vmem_limit_kib` is NOT usable here — the CPU XLA client
parses XLA_FLAGS first and fatals on TPU-only flags — but Pallas exposes the
same ceiling per kernel via
`pltpu.CompilerParams(vmem_limit_bytes=...)`, which rides the remote TPU
compile unchanged. This script verifies the raised ceiling actually admits
group 8 (rejected at the default), then runs paired in-process sweeps:

  1. backward groups (e.g. 4, 6, 8) under the raised ceiling;
  2. forward groups under the raised ceiling (group 8 was feasible but
     slower at the default — re-check in case the ceiling, not the group,
     was the limiter via compiler spilling).

Interpretation discipline: rankings *within* this process are conclusive
(paired chained-differencing); absolute ms across processes carry the
device's ±7% session noise.

Usage: python scripts/tune_vmem_limit.py [--limit-mib 64]
       [--batch 128] [--preset vit-s] [--groups 4,6,8]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root
sys.path.insert(0, str(Path(__file__).parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit-mib", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="vit-s")
    ap.add_argument("--groups", default="4,6,8")
    ap.add_argument("--chain", default="20,220",
                    help="short_n,long_n differencing chain lengths; "
                         "sub-ms kernels need ~200 differenced iterations "
                         "(12 once measured NEGATIVE ms)")
    args = ap.parse_args()
    limit = args.limit_mib << 20
    short_n, long_n = (int(x) for x in args.chain.split(","))

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.ops.pallas.attention_kernel import (
        _packed_fwd_kernel,
    )
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )
    from probpose_pytorch_tpu.utils.profiling import measure_fn_time
    from tune_attention_bwd import run_bwd

    enable_compilation_cache()
    geo = ViTConfig.PRESETS[args.preset]
    C, heads = geo["embed_dim"], geo["num_heads"]
    B, N = args.batch, 192

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * C)).astype(np.float32), jnp.bfloat16
    )
    do = jnp.asarray(
        rng.normal(size=(B, N, C)).astype(np.float32), jnp.bfloat16
    )

    def fwd(x, group, vmem_limit_bytes=None):
        Bx, Nx, C3 = x.shape
        Cx = C3 // 3
        scale = 1.0 / np.sqrt(Cx // heads)
        spec = pl.BlockSpec((group, Nx, C3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((group, Nx, Cx), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        kw = {}
        if vmem_limit_bytes is not None:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes
            )
        return pl.pallas_call(
            functools.partial(
                _packed_fwd_kernel, heads=heads, scale=scale,
                layout="qkv_major",
            ),
            grid=(pl.cdiv(Bx, group),),
            in_specs=[spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bx, Nx, Cx), x.dtype),
            **kw,
        )(x)

    # Probe: backward group 8 at ViT-S is Mosaic-rejected at the default
    # ceiling; if it compiles with the raised per-kernel ceiling, the knob
    # is live on this backend.
    try:
        jax.block_until_ready(run_bwd(qkv, do, heads, 8))
        print("[probe] UNEXPECTED: bwd group 8 compiled at the DEFAULT "
              "ceiling — sweep results may not be ceiling-limited",
              flush=True)
    except Exception:
        print("[probe] bwd group 8 rejected at default ceiling (expected)",
              flush=True)
    try:
        jax.block_until_ready(
            run_bwd(qkv, do, heads, 8, vmem_limit_bytes=limit)
        )
        print(f"[probe] bwd group 8 compiles at {args.limit_mib} MiB — "
              "per-kernel ceiling is LIVE", flush=True)
    except Exception as e:
        print(f"[probe] bwd group 8 still rejected at {args.limit_mib} MiB "
              f"({str(e).splitlines()[0][:120]})", flush=True)
        return

    groups = [int(g) for g in args.groups.split(",")]
    print(f"-- backward group sweep at {args.limit_mib} MiB ceiling "
          f"({args.preset} B={B} N={N}) --", flush=True)
    ref = None
    for g in groups:
        try:
            fn = lambda inp, g=g: run_bwd(
                inp[0], inp[1], heads, g, vmem_limit_bytes=limit
            ).astype(jnp.float32).sum(axis=(1, 2))
            sec = measure_fn_time(fn, (qkv, do), short_n=short_n, long_n=long_n)
            out = run_bwd(qkv, do, heads, g, vmem_limit_bytes=limit)
        except Exception as e:
            print(f"  group {g}: infeasible ({str(e).splitlines()[0][:90]})",
                  flush=True)
            continue
        if ref is None:
            ref = out
        dmax = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        print(f"  group {g}: {sec * 1e3:7.3f} ms  (maxdiff vs g{groups[0]}: "
              f"{dmax:.1e})", flush=True)

    print("-- forward group sweep --", flush=True)
    for g in groups:
        for lim in (None, limit):
            tag = "default" if lim is None else f"{args.limit_mib} MiB"
            try:
                fn = lambda x, g=g, lim=lim: fwd(x, g, lim).astype(
                    jnp.float32
                ).sum(axis=(1, 2))
                sec = measure_fn_time(fn, qkv, short_n=short_n, long_n=long_n)
            except Exception as e:
                print(f"  group {g} ({tag}): infeasible "
                      f"({str(e).splitlines()[0][:90]})", flush=True)
                continue
            print(f"  group {g} ({tag}): {sec * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
