"""Profiling & timing utilities (SURVEY.md §5.1: the reference has only a
timeit micro-benchmark; here: jax.profiler traces + throughput counters +
tunnel-safe timing).
"""

from __future__ import annotations

import contextlib
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "StepTimer", "measure_fn_time"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state steps/sec + items/sec counter with warmup discard."""

    def __init__(self, warmup_steps: int = 3):
        self.warmup = warmup_steps
        self._count = 0
        self._items = 0
        self._t0: float | None = None

    def tick(self, n_items: int = 0) -> None:
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._count > self.warmup:
            self._items += n_items

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._count <= self.warmup:
            return 0.0
        return (self._count - self.warmup) / (time.perf_counter() - self._t0)

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None:
            return 0.0
        return self._items / (time.perf_counter() - self._t0)


def measure_fn_time(
    fn: Callable[[Any], jax.Array],
    dep_input: Any,
    short_n: int = 2,
    long_n: int = 12,
    repeats: int = 3,
) -> float:
    """Seconds per invocation of `fn`, measured on-device.

    Chains `n` invocations inside one jit through a scalar data dependency
    (so XLA cannot elide or hoist the work) and differences a long and a short
    loop — robust against async dispatch, lazy remote execution, and
    host<->device transfer latency. `fn` must map a pytree-perturbable input
    to an array; its mean feeds the next iteration's perturbation.
    """

    @partial(jax.jit, static_argnums=(1,))
    def chained(dep, n):
        def body(_, carry):
            # Perturb float leaves only — integer leaves (e.g. int8 serving
            # weights) ride through unchanged. Pass large params inside
            # `dep` rather than closing over them: closed-over arrays are
            # baked into the HLO as constants (a ViT-B's 344 MB of params
            # exceeds the remote-compile payload limit).
            out = fn(
                jax.tree_util.tree_map(
                    lambda x: x + carry * 1e-6
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                    else x,
                    dep,
                )
            )
            return jnp.mean(out) * 1e-6

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(chained(dep_input, short_n))
    float(chained(dep_input, long_n))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(dep_input, short_n))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(dep_input, long_n))
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (long_n - short_n))
    return best
