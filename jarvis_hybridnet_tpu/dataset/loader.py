"""Minimal batching data loader with background prefetch.

Replaces the reference's torch DataLoader usage
(jarvis/efficienttrack/efficienttrack.py:210-224) on the host side of the
TPU pipeline: shuffling, batching (optionally dropping the last partial
batch), and a bounded prefetch thread so host decode overlaps device
compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def _collate(samples):
    first = samples[0]
    if isinstance(first, dict):
        return {
            k: _collate([s[k] for s in samples])
            for k in first
        }
    if isinstance(first, (list, tuple)):
        return type(first)(
            _collate([s[i] for s in samples]) for i in range(len(first))
        )
    if isinstance(first, str):
        return list(samples)
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i: i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            for idxs in batches:
                if stop.is_set():
                    break
                q.put(_collate([self.dataset[int(i)] for i in idxs]))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
