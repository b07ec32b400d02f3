"""Persistent XLA compilation cache for entry points.

This environment's host has a single CPU core, so XLA compiles dominate
wall-clock for every entry point (bench, autotune, CLI smoke runs): the
flagship serving program takes minutes to compile cold and milliseconds to
load from the cache. The cache lives in `<repo>/.cache/jax` (gitignored) so
it survives across invocations and driver rounds; entries are keyed on the
full HLO + compile options + backend, so stale hits are impossible.

tests/conftest.py applies the same setup for the CPU test mesh; this module
is for on-hardware entry points (bench.py, __graft_entry__.py, scripts/).
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Idempotently point jax at the repo-local persistent compile cache."""
    import jax

    if cache_dir is None:
        cache_dir = Path(__file__).parents[2] / ".cache" / "jax"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Older jax without these config names: cold compiles still work.
        pass
