"""Batching + prefetching loaders.

Replaces the reference's pair of torch DataLoaders that Lightning combines into
(normal_batch, abnormal_batch) steps with max_size_cycle semantics (reference:
src/data/anomaly_clip_datamodule.py:144-163). TPU-first design:

- a :class:`TrainBatch` carries the abnormal and normal halves as separate fields,
  so the train step can shard each half evenly over the data mesh and concatenate
  abnormal-first on device (the order convention the selector/loss rely on,
  anomaly_clip_module.py:173-178);
- item loading is fanned out over a thread pool and whole batches are prefetched on
  a background thread so host IO overlaps device compute (the reference leans on
  torch DataLoader workers for this);
- every epoch reshuffles with an explicit numpy Generator — reproducible,
  checkpoint-resumable, no global RNG.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, NamedTuple, Optional

import numpy as np

from anomalyclip_tpu.data.dataset import TestItem, VideoDataset


class TrainBatch(NamedTuple):
    abnormal_features: np.ndarray  # (b/2, n*l, D) or frames
    abnormal_labels: np.ndarray  # (b/2,)
    normal_features: np.ndarray  # (b/2, n*l, D)
    normal_labels: np.ndarray  # (b/2,)


class DualStreamTrainLoader:
    """Paired abnormal/normal epochs: each stream shuffles independently, batches
    are batch_size//2 from each, drop_last. Epoch length = MAX of the two stream
    lengths with the shorter stream cycling (reshuffled on each wrap) — Lightning
    1.8's ``max_size_cycle`` semantics for a list of train loaders
    (anomaly_clip_datamodule.py:144-163), which the reference relies on: e.g.
    ShanghaiTech has ~3x more normal than abnormal train videos, and min-length
    zip would run ~3x fewer optimizer steps per epoch than the reference."""

    def __init__(
        self,
        normal: VideoDataset,
        abnormal: VideoDataset,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        if batch_size % 2 != 0:
            raise ValueError("batch_size must be even (abnormal/normal halves)")
        self.normal = normal
        self.abnormal = abnormal
        self.half = batch_size // 2
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.epoch = 0
        # one persistent pool for the loader's lifetime: creating/tearing down a
        # ThreadPoolExecutor per batch costs thread spawns on the hot input path
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def __len__(self) -> int:
        n, a = len(self.normal) // self.half, len(self.abnormal) // self.half
        # a stream with fewer items than a half-batch cannot cycle into one
        return max(n, a) if min(n, a) > 0 else 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def close(self) -> None:
        """Join the worker pool — call when done with the loader (multirun jobs
        otherwise accumulate idle pools across trials in one process)."""
        self._pool.shutdown(wait=False, cancel_futures=True)

    def _epoch_plan(self):
        rng = np.random.default_rng((self.seed, self.epoch))

        def half_chunks(dataset):
            # cycle: reshuffle whenever the stream is exhausted (Lightning
            # restarts the shorter DataLoader, which reshuffles)
            while True:
                idx = rng.permutation(len(dataset))
                for b in range(len(dataset) // self.half):
                    yield idx[b * self.half : (b + 1) * self.half]

        a_chunks = half_chunks(self.abnormal)
        n_chunks = half_chunks(self.normal)
        for _ in range(len(self)):
            yield (
                next(a_chunks),
                next(n_chunks),
                rng.integers(np.iinfo(np.int64).max),
            )

    def _make_batch(self, a_ids, n_ids, batch_seed) -> TrainBatch:
        rng = np.random.default_rng(batch_seed)
        item_seeds = rng.integers(np.iinfo(np.int64).max, size=2 * self.half)
        a_items = list(
            self._pool.map(
                lambda args: self.abnormal.train_item(
                    int(args[0]), np.random.default_rng(int(args[1]))
                ),
                zip(a_ids, item_seeds[: self.half]),
            )
        )
        n_items = list(
            self._pool.map(
                lambda args: self.normal.train_item(
                    int(args[0]), np.random.default_rng(int(args[1]))
                ),
                zip(n_ids, item_seeds[self.half :]),
            )
        )
        a_feats = np.stack([f for f, _ in a_items])  # (b/2, ncrops, t, ...)
        n_feats = np.stack([f for f, _ in n_items])
        return TrainBatch(
            abnormal_features=a_feats,
            abnormal_labels=np.array([l for _, l in a_items], dtype=np.int32),
            normal_features=n_feats,
            normal_labels=np.array([l for _, l in n_items], dtype=np.int32),
        )

    def __iter__(self) -> Iterator[TrainBatch]:
        return _prefetched(
            (self._make_batch(*plan) for plan in self._epoch_plan()), self.prefetch
        )


class SequentialTestLoader:
    """Per-video test iteration (batch_size_test=1 semantics,
    anomaly_clip_datamodule.py:165-193), with background prefetch."""

    def __init__(self, dataset: VideoDataset, prefetch: int = 2, limit: Optional[int] = None):
        self.dataset = dataset
        self.prefetch = prefetch
        self.limit = limit

    def __len__(self) -> int:
        n = len(self.dataset)
        return min(n, self.limit) if self.limit is not None else n

    def __iter__(self) -> Iterator[TestItem]:
        return _prefetched(
            (self.dataset.test_item(i) for i in range(len(self))), self.prefetch
        )


def _prefetched(gen, depth: int):
    """Run a generator on a daemon thread with a bounded queue.

    Abandon-safe: when the consumer stops early (limit_train_batches breaking out
    of the epoch loop), the generator's close/GC sets ``stop`` and the worker exits
    instead of blocking forever on a full queue with its buffered batches pinned.
    """
    if depth <= 0:
        yield from gen
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as exc:  # surfaced on the consumer side
            _put(exc)

    threading.Thread(target=worker, daemon=True, name="anomalyclip-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
