"""Metrics logging: JSONL always; TensorBoard when available.

Replaces the reference's SummaryWriter+print logging
(/root/reference/probpose/train.py:104-123) with a dependency-gated version
(torch's SummaryWriter is optional — the core framework never requires torch).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, out_dir: str | Path, tensorboard: bool = True):
        # Multi-host: only process 0 writes (every process computes the same
        # replicated metric scalars; duplicate writers would clobber/duplicate
        # records on a shared filesystem).
        import jax

        self._primary = jax.process_index() == 0
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = (
            open(self.out_dir / "metrics.jsonl", "a") if self._primary else None
        )
        self._tb = None
        if tensorboard and self._primary:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.out_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Mapping[str, Any], prefix: str = "") -> None:
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in scalars.items()
        }
        rec = {"step": int(step), "time": time.time(), **flat}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
