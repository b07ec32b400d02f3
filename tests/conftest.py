"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py, the driver's compile checks,
and the ON-CHIP lane (`PROBPOSE_TPU_TESTS=1 pytest -m tpu`, see
tests/test_tpu_lane.py and scripts/run_tpu_suite.py): with the env var set
this conftest leaves the real TPU platform alone instead of forcing CPU,
and only `tpu`-marked tests are meant to run. CPU unit tests validate
numerics and sharding on host CPU as the build brief prescribes.

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the TPU plugin before conftest runs, so we must force the platform through
jax.config (env-var edits alone are too late).
"""

import os
import sys

_TPU_LANE = bool(os.environ.get("PROBPOSE_TPU_TESTS"))

if not _TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent XLA compilation cache: this host has one CPU core and the suite
# is compile-dominated (tiny-model init 10.2s cold -> 0.96s warm). The cache
# dir lives in the repo so it survives across runs. Env vars propagate it to
# the multihost subprocess workers (which start fresh interpreters); for
# THIS process jax is already imported by sitecustomize, so the env defaults
# were already read — jax.config.update below actually activates it here.
# The CPU AOT loader logs a benign machine-feature pseudo-mismatch
# (+prefer-no-scatter) on every cache load — TF_CPP_MIN_LOG_LEVEL=3
# silences it in subprocesses; in-process loads land in pytest's captured
# stderr.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".cache", "jax")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    """`tpu`-marked tests only run on a real TPU backend (the on-chip lane);
    everywhere else they skip so the CPU suite stays green unchanged."""
    import pytest

    on_tpu = _TPU_LANE and jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(
        reason="on-chip lane: needs PROBPOSE_TPU_TESTS=1 and a TPU backend"
    )
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
