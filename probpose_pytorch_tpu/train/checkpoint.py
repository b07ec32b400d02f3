"""Checkpointing with resume (Orbax).

Strict superset of the reference, which pickles the whole nn.Module every 10
epochs with no optimizer/scheduler state and no resume path
(/root/reference/probpose/train.py:171-180; SURVEY.md §5.4): here the full
TrainState (params + BN stats + optimizer state + step [+ EMA]) is saved
atomically and restorable onto any mesh layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(
        self,
        directory: str | Path,
        keep: int = 3,
        async_save: bool = False,
    ):
        """`async_save=True` returns from `save()` as soon as the state is
        snapshotted off the device (Orbax's async checkpointer then writes
        to disk in a background thread) — training continues during the
        write instead of stalling for it. `restore`/`close` (and Orbax's
        own next-save barrier) wait for any in-flight write, so the
        trade-off is purely latency-hiding, never torn reads."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        state: Any,
        force: bool = True,
        metadata: dict | None = None,
    ) -> None:
        """`force=True` (default) overwrites an existing checkpoint at
        `step` (delete-then-save). Orbax's bare save at an existing step
        either silently SKIPS or raises StepAlreadyExistsError depending
        on `force` — both leave a stale checkpoint from a previous run in
        place while the caller believes it saved (a fresh run into a
        reused out-dir then restores the wrong params)."""
        if force and step in self._mgr.all_steps():
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self._mgr.wait_until_finished()
        if metadata is not None and jax.process_index() == 0:
            import json

            (self.directory / f"meta_{step}.json").write_text(
                json.dumps(metadata)
            )

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk."""
        self._mgr.wait_until_finished()

    def read_metadata(self, step: int | None = None) -> dict:
        """Sidecar metadata saved with `save(..., metadata=...)`; {} when the
        checkpoint predates metadata (all such checkpoints are qkv-major)."""
        if step is None:
            step = self.latest_step()
        path = self.directory / f"meta_{step}.json"
        if step is None or not path.exists():
            return {}
        import json

        return json.loads(path.read_text())

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, target_state: Any, step: int | None = None) -> Any:
        """Restore into the structure/shardings of `target_state` (an
        initialized TrainState — shapes/dtypes/shardings are taken from it).

        Mesh targets: leaves the caller never explicitly sharded (the step
        scalar, optimizer state, BN stats) restore REPLICATED over the same
        mesh as the explicitly-sharded params, not committed to one device —
        a mixed committed placement would make the next jitted step fail
        with 'incompatible devices' (covered by
        tests/test_parallel.py::test_checkpoint_restore_onto_mesh)."""
        self._mgr.wait_until_finished()  # async saves commit before reads
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        mesh = None
        for leaf in jax.tree_util.tree_leaves(target_state):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh.size > 1:
                mesh = sh.mesh
                break

        def to_abstract(leaf):
            s = ocp.utils.to_shape_dtype_struct(leaf)
            if (
                mesh is not None
                and isinstance(leaf, jax.Array)
                and not isinstance(leaf.sharding, NamedSharding)
            ):
                s = jax.ShapeDtypeStruct(
                    s.shape,
                    s.dtype,
                    sharding=NamedSharding(mesh, PartitionSpec()),
                )
            return s

        abstract = jax.tree_util.tree_map(to_abstract, target_state)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )

    def close(self) -> None:
        self._mgr.close()
