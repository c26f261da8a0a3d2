"""Minimal torch-free batch loader with background prefetch.

The TPU-native replacement for the reference's `torch.utils.data.DataLoader`
usage (datasets/ShapeNet_55.py:224-240): datasets are RAM-resident numpy, so
worker *processes* are pointless — a single background thread assembling the
next batch while the device computes keeps the input pipeline off the step
critical path. Batches are dicts of stacked numpy arrays (host); the trainer
moves them to device (`jax.device_put` happens implicitly at jit boundaries,
or explicitly with sharding for multi-chip).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np


def default_collate(items):
    """Stack a list of per-example dicts into one dict of arrays."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(first, (int, np.integer)):
            out[key] = np.asarray(vals, np.int32)
        elif isinstance(first, (float, np.floating)):
            out[key] = np.asarray(vals, np.float32)
        else:
            out[key] = vals  # strings etc.
    return out


class DataLoader:
    """Shuffling batcher over a map-style dataset (len + __getitem__).

    Mirrors the torch DataLoader contract used by the reference trainers
    (shuffle, drop_last, deterministic iteration when shuffle=False) with a
    one-deep prefetch thread instead of worker processes.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 prefetch: int = 2, collate_fn=default_collate,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        # num_workers > 0: fetch the items of each batch through a thread
        # pool (the reference's num_workers=4 DataLoader semantics,
        # datasets/ViPC.py:293-311). Matters for per-item IO-bound datasets
        # — the non-preload ViPC path does a PIL decode + two pickle loads
        # per item, which serialize behind one prefetch thread otherwise;
        # RAM-resident datasets (ShapeNet) gain nothing.
        self.num_workers = int(num_workers or 0)
        self._pool = None
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def _item_pool(self):
        if self.num_workers > 0 and self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="ldt-loader")
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start:min(start + self.batch_size, end)]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []

        pool = self._item_pool()

        def fetch(idxs):
            if pool is not None:
                return list(pool.map(self.dataset.__getitem__,
                                     [int(i) for i in idxs]))
            return [self.dataset[int(i)] for i in idxs]

        def producer():
            try:
                for idxs in self._index_batches():
                    q.put(self.collate_fn(fetch(idxs)))
            except BaseException as e:  # re-raised on the consumer side
                error.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
        if error:
            # a swallowed worker exception would silently end the epoch with
            # zero (or partial) batches — a training loop then "succeeds"
            # having trained on nothing
            raise error[0]
