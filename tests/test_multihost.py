"""Multi-host (multi-process) execution parity.

Proves the greenfield multi-host layer (parallel/distributed.py +
batch_iterator process sharding + Trainer._device_batch's
make_array_from_process_local_data path + make_hybrid_mesh process-granule
DCN axis) produces the SAME loss as single-process whole-batch feeding on the
same 8-device (data=4, model=2) mesh. The reference has nothing to mirror
(SURVEY.md §2.3); this is the build brief's scaling requirement.

Uses real subprocesses: 1×8-device vs 2×4-device joined via jax.distributed
over localhost (gloo CPU collectives).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _child_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _extract_loss(out: str) -> float:
    m = re.search(r"^LOSS ([-\d.naninf]+)$", out, re.MULTILINE)
    assert m, f"no LOSS line in worker output:\n{out}"
    return float(m.group(1))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_feeding_matches_single_process(tmp_path):
    single = subprocess.run(
        [sys.executable, WORKER, "single"],
        env=_child_env(8),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert single.returncode == 0, single.stderr[-3000:]
    loss_single = _extract_loss(single.stdout)

    port = _free_port()
    ckdir = str(tmp_path / "mp_ckpt")  # shared by both processes
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "multi", str(port), str(pid), ckdir],
            env=_child_env(4),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses_multi = [_extract_loss(o) for o in outs]

    # Both processes see the same (replicated) global loss scalar...
    assert losses_multi[0] == pytest.approx(losses_multi[1], abs=1e-7)
    # ...and it equals the single-process whole-batch result.
    assert np.isfinite(loss_single)
    assert loss_single == pytest.approx(losses_multi[0], rel=2e-5, abs=2e-6)

    # Phase 2: the 2-process Orbax save + restore round trip is exact, keeps
    # mesh shardings, and the restored state steps again on both processes.
    for out in outs:
        m = re.search(r"^RESTORED_DIFF ([\d.e+-]+)$", out, re.MULTILINE)
        assert m, f"no RESTORED_DIFF in worker output:\n{out}"
        assert float(m.group(1)) == 0.0
        assert re.search(r"^RESTORED_SHARDINGS ok$", out, re.MULTILINE), out
        m = re.search(
            r"^RESTORED_STEP_LOSS ([-\d.naninf]+)$", out, re.MULTILINE
        )
        assert m and np.isfinite(float(m.group(1))), out
