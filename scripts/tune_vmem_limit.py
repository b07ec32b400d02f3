"""Scoped-VMEM-limit experiment for the packed attention kernels (ROADMAP #3's
"terminal-controlled XLA flags" leftover).

The Mosaic compiler rejects backward groups 6/8 at ViT-S (21.9 MB scoped
allocation vs the default ~16 MB limit; docs/PERF.md round-3 levers), so the
group sweep could never measure them. `--xla_tpu_scoped_vmem_limit_kib` lifts
that ceiling: this script sets it BEFORE the first backend touch, verifies it
actually took effect (by compiling a backward group that the default limit
rejects), then runs the same paired in-process group sweeps as
scripts/tune_attention_bwd.py under the raised limit.

Interpretation discipline: rankings *within* this process are conclusive
(paired chained-differencing); absolute ms across processes carry the
device's ±7% session noise. A raised limit also shrinks the VMEM XLA's own
fusions can use, so any kernel-level win must be confirmed e2e before
production use.

Usage: python scripts/tune_vmem_limit.py [--limit-kib 65536]
       [--batch 128] [--preset vit-s] [--groups 4,6,8]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit-kib", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="vit-s")
    ap.add_argument("--groups", default="4,6,8")
    args = ap.parse_args()

    # Must land before the first backend initialization. sitecustomize
    # imports jax at interpreter start but the backend (where XLA flags are
    # consumed) initializes lazily on first device use, so appending here
    # still works — the probe below verifies rather than assumes.
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_tpu_scoped_vmem_limit_kib={args.limit_kib}".strip()
    )

    import numpy as np
    import jax
    import jax.numpy as jnp

    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.utils.profiling import measure_fn_time
    from tune_attention_bwd import run_bwd

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

    # Probe: backward group 8 at ViT-S is Mosaic-rejected at the default
    # limit. If it compiles now, the flag is live in this backend.
    try:
        jax.block_until_ready(run_bwd(qkv, do, heads, 8))
        print(f"[probe] bwd group 8 compiled under limit "
              f"{args.limit_kib} KiB — flag is LIVE", flush=True)
    except Exception as e:
        print(f"[probe] bwd group 8 still rejected — flag NOT live "
              f"({str(e).splitlines()[0][:120]})", flush=True)
        return

    groups = [int(g) for g in args.groups.split(",")]
    print(f"-- backward group sweep at limit {args.limit_kib} KiB "
          f"({args.preset} B={B}) --", flush=True)
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
        dmax = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        print(f"  group {g}: {sec * 1e3:7.3f} ms  (maxdiff vs g{groups[0]}: "
              f"{dmax:.1e})", flush=True)

    from probpose_pytorch_tpu.ops.pallas.attention_kernel import _packed_fwd

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
