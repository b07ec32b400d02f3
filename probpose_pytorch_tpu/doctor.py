"""Environment self-check: `python -m probpose_pytorch_tpu.doctor`.

One command a new user (or a broken deployment) runs to see what this host
can do: JAX backend and devices, a compile smoke test, Pallas kernel
availability, the C++ data plane, the packaged serving-autotune record,
and optional dependencies. Prints one line per check and a final verdict;
exit code 1 if any REQUIRED check fails (optional ones only warn).
"""

from __future__ import annotations

import sys
import time


def _check(name: str, fn, required: bool = True) -> tuple[bool, str]:
    try:
        detail = fn() or "ok"
        return True, f"  [ok]   {name}: {detail}"
    except Exception as e:  # noqa: BLE001 — diagnostics surface everything
        tag = "FAIL" if required else "warn"
        return not required, f"  [{tag}] {name}: {e}"


def main(argv=None) -> None:
    checks = []

    def jax_devices():
        import jax

        devs = jax.devices()
        return f"{jax.default_backend()} x{len(devs)} ({devs[0].device_kind})"

    checks.append(("jax devices", jax_devices, True))

    def compile_smoke():
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        out = jax.jit(lambda x: (x @ x.T).sum())(
            jnp.ones((128, 128), jnp.bfloat16)
        )
        jax.block_until_ready(out)
        return f"matmul jit in {time.perf_counter() - t0:.2f}s"

    checks.append(("XLA compile smoke", compile_smoke, True))

    def model_forward():
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.models.model import (
            ModelConfig,
            build_model,
        )
        from probpose_pytorch_tpu.models.vit import ViTConfig

        ViTConfig.PRESETS.setdefault(
            "vit-doctor",
            dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-doctor",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        )
        model = build_model(cfg)
        x = jnp.zeros((1, 64, 48, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        jax.block_until_ready(out)
        return f"heatmaps {tuple(out[0].shape)}"

    checks.append(("model forward (tiny ViT + head)", model_forward, True))

    def detector_forward():
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.detect.codec import decode_boxes
        from probpose_pytorch_tpu.detect.model import PersonDetector

        model = PersonDetector(img_size=(64, 64), preset="conv-t")
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        boxes, scores = decode_boxes(
            out["center"], out["size"], out["offset"], k=4
        )
        jax.block_until_ready(boxes)
        return f"boxes {tuple(boxes.shape)}"

    checks.append(("person detector forward + decode", detector_forward,
                   True))

    def pallas():
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.sparsemax import sparsemax_tpu

        p = sparsemax_tpu(jnp.array([[1.0, 2.0, 3.0]]))
        jax.block_until_ready(p)
        mode = (
            "compiled" if jax.default_backend() == "tpu" else "interpret"
        )
        return f"sparsemax kernel ({mode} mode)"

    checks.append(("Pallas kernels", pallas, False))

    def native():
        from probpose_pytorch_tpu import native as n

        if not n.native_available():
            raise RuntimeError(
                "C++ data plane unavailable (build failed or "
                "PROBPOSE_NO_NATIVE set) — loaders fall back to PIL"
            )
        return "dataplane library loaded"

    checks.append(("native data plane", native, False))

    def autotune():
        from probpose_pytorch_tpu.inference import (
            tuned_bucket_ladder,
            tuned_serving_batch,
        )

        ladder = tuned_bucket_ladder()
        return (
            f"batch {tuned_serving_batch()}, ladder {ladder}"
            if ladder
            else f"batch {tuned_serving_batch()} (no ladder recorded)"
        )

    checks.append(("serving autotune record", autotune, False))

    def optional_deps():
        have = []
        for mod in ("PIL", "matplotlib", "torch", "tensorboard"):
            try:
                __import__(mod)
                have.append(mod)
            except ImportError:
                pass
        return ", ".join(have) or "none"

    checks.append(("optional deps", optional_deps, False))

    print("probpose-tpu doctor")
    ok = True
    for name, fn, required in checks:
        good, line = _check(name, fn, required)
        print(line, flush=True)
        ok &= good
    print("verdict:", "healthy" if ok else "REQUIRED CHECKS FAILED")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
