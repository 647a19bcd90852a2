"""Batching + double-buffered host->device input pipeline.

Replaces torch ``DataLoader(num_workers, pin_memory)`` (train.py:82-83).
A background thread assembles numpy batches while the device computes, and
``device_put`` overlaps the host->HBM copy with the previous step — the
double-buffering BASELINE.json's north star asks for.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[key] = np.stack(vals)
        else:
            out[key] = vals  # e.g. string names
    return out


class DataLoader:
    """Minimal epoch iterator: shuffle / batch / drop_last / prefetch.

    Args:
      dataset: len() + __getitem__ -> dict of numpy arrays.
      batch_size, shuffle, drop_last: as in torch.
      prefetch: queue depth of pre-assembled batches (0 disables threading).
      to_device: optional callable applied to each batch in the consumer
        (e.g. ``jax.device_put`` with a sharding).
      seed: shuffle seed.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch: int = 2,
        to_device: Optional[Callable] = None,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.to_device = to_device
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        for i in range(nb):
            yield order[i * self.batch_size : (i + 1) * self.batch_size]

    def _make_batch(self, idxs) -> Dict[str, np.ndarray]:
        load_batch = getattr(self.dataset, "load_batch", None)
        if load_batch is not None:
            batch = load_batch([int(i) for i in idxs])
            if batch is not None:  # None -> dataset declined (fallback)
                return batch
        return _collate([self.dataset[int(i)] for i in idxs])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            for idxs in self._batch_indices():
                batch = self._make_batch(idxs)
                yield self.to_device(batch) if self.to_device else batch
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for idxs in self._batch_indices():
                    if stop.is_set():
                        return
                    q.put(self._make_batch(idxs))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
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
                yield self.to_device(item) if self.to_device else item
        finally:
            stop.set()
