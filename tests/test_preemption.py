"""Preemption-safe shutdown (TrainConfig.handle_preemption).

TPU-pod / spot-VM eviction arrives as SIGTERM with a grace window. The
trainer must finish the in-flight step, write a checkpoint, and exit 0 so
`resume: true` continues on the replacement VM. The reference has no
preemption story (SURVEY.md §5.3: no failure handling of any kind); this is
new infrastructure for the scale-out requirement.

Uses a real subprocess running the training CLI on synthetic data: SIGTERM
lands mid-run, the exit must be clean, and a second invocation must resume
from the saved step.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Both CLI invocations share the repo-local persistent compile cache
    # (the CLI enables it itself; the env var pins the dir explicitly), so
    # the resume process loads the train-step executable the first process
    # compiled instead of recompiling under full-suite load — the round-3
    # flake was this cold-start landing inside the timed window.
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".cache", "jax")
    return env


def _tiny_cli_config(out_dir) -> dict:
    return {
        "model": {
            "img_size": [64, 48], "patch_size": 16, "num_keypoints": 5,
            "backbone": "vit-nano", "compute_dtype": "float32",
            "deconv_out_channels": [16, 16], "deconv_kernel_sizes": [4, 4],
            "pool_sizes": [[2, 2], [2, 2]], "normalize": 1.0,
        },
        "optim": {"peak_lr": 1e-4},
        "augment": None,
        "epochs": 50, "train_batch_size": 4, "val_batch_size": 4,
        "val_every": 10_000, "log_every": 1,
        "checkpoint_every_epochs": 1000, "keep_checkpoints": 2,
        "dataset_format": "synthetic", "num_workers": 1,
        "out_dir": str(out_dir), "resume": True,
    }


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    out_dir = tmp_path / "run"
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(_tiny_cli_config(out_dir)))

    proc = subprocess.Popen(
        [sys.executable, "-m", "probpose_pytorch_tpu.train.cli",
         str(out_dir), "--config", str(cfg_path)],
        env=_child_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    metrics = out_dir / "metrics.jsonl"
    try:
        # Wait until a few steps have actually run (compile included; the
        # deadline is generous because this 1-core host runs the suite and
        # compiles concurrently).
        deadline = time.time() + 900
        while time.time() < deadline:
            if metrics.exists() and len(metrics.read_text().splitlines()) >= 2:
                break
            if proc.poll() is not None:
                pytest.fail(
                    f"trainer exited early ({proc.returncode}):\n"
                    + proc.stdout.read()
                )
            time.sleep(0.5)
        else:
            pytest.fail("trainer never reached step 2 within 900s")

        # Compile and warm-up are done (steps have run); the timed window
        # from here on measures only shutdown behavior: finish the
        # in-flight step + write one checkpoint.
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, f"non-zero exit after SIGTERM:\n{out}"
    assert "SIGTERM: checkpointing" in out
    assert "preempted: latest checkpoint at step" in out

    ckpts = out_dir / "checkpoints"
    steps = sorted(
        int(p.name) for p in ckpts.iterdir() if p.name.isdigit()
    )
    assert steps and steps[-1] >= 2, f"no post-SIGTERM checkpoint: {steps}"

    # The replacement process resumes from the saved step. Its train-step
    # compile is a persistent-cache hit from the first process, so the
    # generous timeout only guards import + restore + one cached step.
    res = subprocess.run(
        [sys.executable, "-m", "probpose_pytorch_tpu.train.cli",
         str(out_dir), "--config", str(cfg_path), "--max-steps", "1"],
        env=_child_env(), capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert f"resumed from step {steps[-1]}" in res.stdout
