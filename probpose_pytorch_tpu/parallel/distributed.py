"""Multi-host (multi-process) runtime wiring.

The reference is strictly single-process (SURVEY.md §2.3) — this layer is
greenfield TPU design. One JAX process runs per host; `jax.distributed`
connects them through the coordination service, after which `jax.devices()`
is the GLOBAL device list and GSPMD collectives span hosts (ICI within a
slice, DCN across slices via `make_hybrid_mesh`).

Data feeding model: every process loads only its local shard of each global
batch (`local_batch_slice` below pairs with `batch_iterator(process_index=,
process_count=)`), and `Trainer._device_batch` assembles the global array via
`jax.make_array_from_process_local_data` — no cross-host data movement on the
input path.
"""

from __future__ import annotations

import os

import jax

__all__ = [
    "maybe_initialize_distributed",
    "process_info",
    "local_batch_size",
]


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize `jax.distributed` when a multi-process launch is detected.

    Detection order:
      1. explicit arguments;
      2. ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
         ``JAX_PROCESS_ID`` environment variables (our launcher contract);
      3. cluster auto-detection (TPU pod metadata, SLURM, ...) — in that
         case ``jax.distributed.initialize()`` with no args succeeds on its
         own and we call it only when ``JAX_AUTO_DISTRIBUTED=1`` opts in,
         because on a single host it would fail.

    Returns True iff the distributed runtime is active after the call.
    Idempotent: a second call is a no-op.
    """
    if jax.distributed.is_initialized():
        return True
    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if env.get("JAX_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        return True
    return False


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch size; the global batch must divide evenly so every
    host feeds the same number of rows to `make_array_from_process_local_data`."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process_count {n}"
        )
    return global_batch_size // n
