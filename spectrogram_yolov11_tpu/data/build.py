"""Batch loader: thread-pool prefetcher producing fixed-shape numpy batches.

Replaces the reference's torch DataLoader machinery (data/build.py:96-158
InfiniteDataLoader + workers + DistributedSampler) with a TPU-first design:
worker threads run the cv2/numpy augmentation pipeline (GIL-released) and a
bounded queue holds ready device-shaped batches; the train loop overlaps host
augmentation with device steps. Per-host sharding for multi-process SPMD
slices the global index space by jax.process_index() (reference's
DistributedSampler equivalent).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def collate(samples: list) -> Dict[str, np.ndarray]:
    """Stack formatted samples into one fixed-shape batch."""
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        out[k] = np.stack(vals)
    return out


class DataLoader:
    """Epoch-based loader with background prefetch.

    - deterministic per-(epoch, index) RNG streams (reference seeds workers
      per rank, data/build.py:89; we derive streams from a root seed instead)
    - drop_last=True for static batch shapes in train; val pads the tail batch
      and reports n_valid.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        return order[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.workers)
        stop = threading.Event()

        def make_batch(bi: int) -> Dict[str, np.ndarray]:
            lo = bi * self.batch_size
            batch_idx = idxs[lo : lo + self.batch_size]
            n_valid = len(batch_idx)
            if n_valid < self.batch_size:  # pad tail (val only)
                batch_idx = np.concatenate([batch_idx, np.repeat(batch_idx[-1:], self.batch_size - n_valid)])
            samples = []
            for j, di in enumerate(batch_idx):
                rng = np.random.default_rng((self.seed * 1_000_003 + self.epoch) * 100_003 + lo + j)
                samples.append(self.dataset.get_item(int(di), rng))
            b = collate(samples)
            b["n_valid"] = np.int32(n_valid)
            return b

        def producer():
            futures = [pool.submit(make_batch, bi) for bi in range(nb)]
            for f in futures:
                if stop.is_set():
                    break
                try:
                    q.put(f.result())
                except Exception as e:  # propagate to consumer
                    q.put(e)
                    break
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)

    def reset(self):
        """Transform changes (e.g. close_mosaic) take effect next __iter__."""


def build_dataloader(dataset, batch_size: int, shuffle: bool, seed: int = 0, workers: int = 4,
                     drop_last: bool = True) -> DataLoader:
    import jax

    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        workers=workers,
        drop_last=drop_last,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
