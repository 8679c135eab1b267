"""Batching + background-prefetch data loader and device feed.

TPU-native replacement for the reference's torch DataLoader worker processes
(src/train.py:17-20): a thread pipelines host decode (PIL/numpy release the
GIL) behind device compute, collated batches are device_put with a
data-parallel NamedSharding so each step's H2D transfer lands pre-sharded.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np


def collate(items) -> Any:
    """Stack a list of samples (dicts / tuples / arrays) into batch arrays."""
    first = items[0]
    if isinstance(first, dict):
        return {k: collate([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(collate(list(col)) for col in zip(*items))
    if isinstance(first, str):
        return list(items)
    return np.stack([np.asarray(it) for it in items], axis=0)


class DataLoader:
    """Sequential-index batch loader with optional background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """``shard_index``/``num_shards`` stride the index space per host for
        multi-process (DCN) training: each process feeds its own disjoint
        slice with a shared shuffle order (same seed on every host)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.shard_index = shard_index
        self.num_shards = max(1, num_shards)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_index :: self.num_shards]
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def _make_batch(self, idx):
        return collate([self.dataset[int(i)] for i in idx])

    def __iter__(self) -> Iterator[Any]:
        if self.num_workers <= 0:
            for idx in self._index_batches():
                yield self._make_batch(idx)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for idx in self._index_batches():
                    if stop.is_set():
                        return
                    q.put(self._make_batch(idx))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def infinite(loader) -> Iterator[Any]:
    """Epoch-looping iterator (reference train.py:35-36 while-True)."""
    while True:
        for batch in loader:
            yield batch


def shard_batch(batch, mesh=None):
    """device_put a host batch with batch-axis sharding over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return jax.device_put(batch)
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    return jax.tree.map(put, batch)
