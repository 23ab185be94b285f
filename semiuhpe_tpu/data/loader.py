"""Batched, prefetching host data loader.

Replaces the reference's torch DataLoader(+pin_memory, workers)
(/root/reference/src/datasets/dataset_300WLP.py:311-312) with a
thread-pool loader that decodes/augments samples concurrently (PIL/cv2
release the GIL) and an optional device-prefetcher that keeps N batches
in flight onto the mesh so host input never stalls the TPU step.
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Dict, Iterable, Iterator, Optional

import numpy as np


def _stack(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(idx):
    return _WORKER_DATASET[idx]


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 seed: Optional[int] = None, use_processes: bool = False):
        """``use_processes=True`` decodes samples in worker *processes*
        (torch-DataLoader-style) — escapes the GIL for Python-heavy
        datasets; the dataset must be picklable.  Threads (default) are
        enough when PIL/cv2 dominate (they release the GIL)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.use_processes = use_processes
        self._rng = np.random.default_rng(seed)
        self._pool = None

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _ensure_pool(self):
        if self._pool is None:
            if self.use_processes:
                import multiprocessing as mp

                # spawn: forking a jax-threaded process risks deadlocks.
                self._pool = concurrent.futures.ProcessPoolExecutor(
                    self.num_workers, mp_context=mp.get_context("spawn"),
                    initializer=_init_worker, initargs=(self.dataset,))
            else:
                self._pool = concurrent.futures.ThreadPoolExecutor(
                    self.num_workers)
        return self._pool

    def _submit(self, pool, idx: int):
        if self.use_processes:
            return pool.submit(_worker_get, idx)
        return pool.submit(self.dataset.__getitem__, idx)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)

        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if hasattr(self.dataset, "get_batch"):
            # Vectorized fast path (packed/memmap datasets): one fancy-index
            # per batch, no per-sample Python, no worker pool.
            for idxs in batches:
                yield self.dataset.get_batch(idxs)
            return

        pool = self._ensure_pool()

        # Pipeline: keep up to 2 batches of sample-futures in flight.
        pending = collections.deque()
        it = iter(batches)

        def submit_next():
            idxs = next(it, None)
            if idxs is not None:
                pending.append([self._submit(pool, int(i)) for i in idxs])

        submit_next()
        submit_next()
        while pending:
            futures = pending.popleft()
            submit_next()
            yield _stack([f.result() for f in futures])


def cycle(iterable: Iterable) -> Iterator:
    """Infinite restartable iteration (reference src/utils.py:175-178)."""
    while True:
        for x in iterable:
            yield x


def prefetch_to_device(batch_iter: Iterator, mesh=None, depth: int = 2,
                       donate: bool = False) -> Iterator:
    """Move batches onto the device (sharded over the mesh when given)
    ``depth`` steps ahead of consumption, overlapping H2D with compute."""
    import jax

    if mesh is not None:
        from semiuhpe_tpu.parallel.mesh import shard_batch

        put = lambda b: shard_batch(mesh, b)
    else:
        put = lambda b: jax.tree_util.tree_map(jax.device_put, b)

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
