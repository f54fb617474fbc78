"""Host-side batching loader with threaded decode and double-buffered
device prefetch.

The analog of the reference's DataLoader(num_workers=4, pin_memory,
prefetch_factor=2) (reference: scripts/Modello_supporto.py:87-95), built
TPU-style: host threads only decode/stack numpy; all augmentation and
degradation run inside the jitted device input stage; `prefetch_to_device`
keeps `size` batches already resident in HBM (sharded along the mesh batch
axis) so the TPU never waits on PCIe.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Iterator

import jax
import numpy as np


class Loader:
    """Iterates a map-style dataset into stacked numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 pad_to_batch: bool = False):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if self.drop_last:
            order = order[: (n // self.bs) * self.bs]
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()
            idx_batches = [order[i:i + self.bs]
                           for i in range(0, len(order), self.bs)]

            def fetch(idxs):
                batch = None
                if hasattr(self.ds, "get_batch"):
                    # dataset-provided batch fast path (e.g. the native
                    # C++ TIFF batch decoder); None -> per-item fallback
                    batch = self.ds.get_batch([int(i) for i in idxs])
                if batch is None:
                    items = [self.ds[int(i)] for i in idxs]
                    batch = {k: np.stack([it[k] for it in items])
                             for k in items[0]}
                n_items = len(idxs)
                if self.pad_to_batch and n_items < self.bs:
                    pad = self.bs - n_items
                    batch = {k: np.concatenate(
                        [v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                        for k, v in batch.items()}
                    batch["_valid"] = np.concatenate(
                        [np.ones(n_items, np.bool_),
                         np.zeros(pad, np.bool_)])
                return batch

            ahead = self.num_workers
            it = iter(idx_batches)
            try:
                for _ in range(ahead):
                    pending.append(pool.submit(fetch, next(it)))
            except StopIteration:
                pass
            while pending:
                fut = pending.popleft()
                try:
                    pending.append(pool.submit(fetch, next(it)))
                except StopIteration:
                    pass
                yield fut.result()


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator so `size` batches are already transferred
    (and sharded, if `sharding` given) before compute asks for them."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
