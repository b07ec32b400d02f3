"""Host-side batching with threaded prefetch.

The reference parallelizes its (expensive, encode-in-worker) data path with 4
DataLoader processes (/root/reference/probpose/train.py:58,69). Our samples
are cheap (decode + crop only — encoding moved on-device), so a thread pool
with double-buffered prefetch keeps the accelerator fed without process
overhead.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from queue import Queue
from typing import Any, Callable, Iterator, Sequence

import numpy as np

__all__ = ["SyntheticPoseDataset", "batch_iterator", "Prefetcher"]


class SyntheticPoseDataset:
    """Procedural pose dataset: random blob "limbs" rendered at keypoint
    locations. Deterministic per (seed, index); used by tests, the training
    smoke path, and bench.py (the reference trains a private synthetic set,
    train.py:51, which is not shipped)."""

    def __init__(
        self,
        size: int,
        input_size: tuple[int, int] = (256, 192),
        num_keypoints: int = 17,
        seed: int = 0,
    ):
        self.size = size
        self.input_size = input_size
        self.num_keypoints = num_keypoints
        self.seed = seed

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        H, W = self.input_size
        K = self.num_keypoints
        rng = np.random.default_rng((self.seed, idx))
        kpts = rng.uniform([-0.1 * W, -0.1 * H], [1.1 * W, 1.1 * H], (K, 2))
        visible = (rng.random(K) > 0.15).astype(np.float32)
        visibility = np.where(
            visible > 0, (rng.random(K) > 0.3).astype(np.float32), 0.0
        )
        img = (rng.random((H, W, 3)) * 60).astype(np.float32)
        ys, xs = np.mgrid[0:H, 0:W]
        for k in range(K):
            if visible[k] < 0.5:
                continue
            d2 = (xs - kpts[k, 0]) ** 2 + (ys - kpts[k, 1]) ** 2
            img += (
                rng.random(3)[None, None]
                * 195.0
                * np.exp(-d2 / (2 * 16.0))[..., None]
            )
        return dict(
            image=np.clip(img, 0, 255).astype(np.uint8),
            keypoints=kpts.astype(np.float32),
            keypoints_visible=visible,
            keypoints_visibility=visibility,
        )


def _collate(samples: Sequence[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {
        k: np.stack([s[k] for s in samples]) for k in samples[0].keys()
    }


def batch_iterator(
    dataset: Any,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 4,
    epoch: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield collated numpy batches. Datasets exposing `get_batch(indices)`
    (e.g. CachedCropDataset) are read with one vectorized gather per batch;
    otherwise samples load in a thread pool.

    Multi-host: pass (process_index, process_count) and `batch_size` stays the
    GLOBAL batch size — every process computes the identical global index
    permutation (same (seed, epoch) rng) and yields only its contiguous local
    slice of each global batch, matching the row placement of
    `jax.make_array_from_process_local_data` on a process-ordered mesh.
    """
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng((seed, epoch)).shuffle(idx)
    n_full = len(idx) // batch_size
    ends = n_full * batch_size
    groups = [idx[i : i + batch_size] for i in range(0, ends, batch_size)]
    if not drop_last and ends < len(idx):
        groups.append(idx[ends:])
    if process_count is not None and process_count > 1:
        if process_index is None:
            raise ValueError("process_index required with process_count")
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"process_count {process_count}"
            )
        local = batch_size // process_count
        groups = [
            g[process_index * local : (process_index + 1) * local]
            for g in groups
            if len(g) == batch_size  # ragged tail cannot be split evenly
        ]
    if hasattr(dataset, "get_batch"):
        for g in groups:
            yield dataset.get_batch(g)
        return
    if num_workers <= 1:
        for g in groups:
            yield _collate([dataset[int(i)] for i in g])
        return
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for g in groups:
            samples = list(pool.map(dataset.__getitem__, (int(i) for i in g)))
            yield _collate(samples)


class Prefetcher:
    """Wrap an iterator with a background thread + bounded queue so host data
    prep overlaps device compute."""

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._q: Queue = Queue(maxsize=depth)
        self._sentinel = object()
        self._err: BaseException | None = None

        def run():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item
