"""Shared-memory multiprocess loader: decode in workers, zero-pickle batches.

Round-1's process-pool loader shipped every sample through pickle IPC and
*lost* to the thread pool (130 vs 383 imgs/s).  This design removes the
per-sample IPC entirely:

* N spawn workers each hold their own dataset copy (initializer-style) and
  receive only (slot, indices) tuples over a task queue;
* every worker writes its samples directly into a preallocated
  ``multiprocessing.shared_memory`` ring of batch slots (one buffer per
  sample key), then posts the slot id back;
* the parent copies the completed slot out and recycles it immediately,
  so steady-state cost is one page-local memcpy per batch on the consumer
  side — none on the IPC path.  (Copies, not views: ``jax.device_put`` on
  the CPU backend ALIASES compatible host buffers — measured, a mutated
  source changed the "device" value — so handing out live ring views
  would corrupt batches under the depth-2 device prefetcher.)

Throughput scales with worker count on multi-core hosts (this container
exposes ONE core, so tests here validate correctness + overhead, not
scaling).  For decode-free streaming prefer data/packed.py, which needs no
workers at all.
"""

from __future__ import annotations

import atexit
import collections
import multiprocessing as mp
import queue as queue_mod
import traceback
from multiprocessing import shared_memory
from typing import Dict, Iterator, Optional

import numpy as np


class ShmWorkerError(RuntimeError):
    """A dataset raised inside a loader worker (traceback attached)."""


def _worker_main(dataset, task_q, done_q, schema, shm_names, batch_size):
    buffers = {}
    views = {}
    try:
        for slot, names in enumerate(shm_names):
            views[slot] = {}
            for key, name in names.items():
                shm = shared_memory.SharedMemory(name=name)
                buffers[(slot, key)] = shm
                shape, dtype = schema[key]
                views[slot][key] = np.ndarray((batch_size,) + shape,
                                              dtype=dtype, buffer=shm.buf)
        for task in iter(task_q.get, None):
            slot, idxs = task
            # A dataset exception must never kill the worker silently: the
            # parent blocks on done_q, so a missing completion is a hang.
            # Post an error completion instead; the parent raises it.
            try:
                dst = views[slot]
                for j, i in enumerate(idxs):
                    sample = dataset[int(i)]
                    for key in schema:
                        dst[key][j] = sample[key]
            except BaseException:
                done_q.put((slot, -1, traceback.format_exc()))
            else:
                done_q.put((slot, len(idxs), None))
    finally:
        for shm in buffers.values():
            shm.close()


class ShmLoader:
    """Iterator over batches of ``dataset`` built in worker processes.

    Same protocol as data.loader.Loader (len/iter -> dict of arrays).
    Batches are yielded in submission order as self-owned copies (safe to
    hold, device_put, or prefetch arbitrarily far ahead).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: Optional[int] = None, slots_per_worker: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.n_slots = self.num_workers * slots_per_worker
        self._rng = np.random.default_rng(seed)
        # Separate stream for concurrent inline passes (mid-epoch sweeps):
        # if they consumed self._rng, every later epoch's shuffle order
        # would shift versus a sweep-free run (reproducibility).
        self._inline_rng = np.random.default_rng(
            None if seed is None else seed + 0x9E3779B9)
        self._started = False
        self._active = False  # an __iter__ generator currently owns the ring
        self._inflight = 0    # tasks submitted but completion not yet read

        sample = dataset[0]
        self.schema = {k: (np.asarray(v).shape, np.asarray(v).dtype)
                       for k, v in sample.items()}

    def __len__(self):
        n = len(self.dataset)
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    # -- lifecycle ---------------------------------------------------------

    def _start(self):
        if self._started:
            return
        ctx = mp.get_context("spawn")  # forking a jax process deadlocks
        self._task_q = ctx.Queue()
        self._done_q = ctx.Queue()
        self._shms: list = []
        self._views: list = []
        names = []
        for _ in range(self.n_slots):
            slot_names = {}
            slot_views = {}
            for key, (shape, dtype) in self.schema.items():
                nbytes = int(np.prod((self.batch_size,) + shape)
                             ) * np.dtype(dtype).itemsize
                shm = shared_memory.SharedMemory(create=True, size=max(nbytes, 1))
                self._shms.append(shm)
                slot_names[key] = shm.name
                slot_views[key] = np.ndarray(
                    (self.batch_size,) + shape, dtype=dtype, buffer=shm.buf)
            names.append(slot_names)
            self._views.append(slot_views)
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(self.dataset, self._task_q, self._done_q,
                              self.schema, names, self.batch_size),
                        daemon=True)
            for _ in range(self.num_workers)]
        for p in self._procs:
            p.start()
        self._started = True
        atexit.register(self.close)

    def close(self):
        if not self._started:
            return
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for shm in self._shms:
            try:
                shm.close()
                shm.unlink()
            except FileNotFoundError:
                pass
        self._started = False
        # Workers are gone, so no in-flight completion will ever arrive;
        # a stale count would make the next epoch's _drain() block forever
        # on the freshly created (empty) done queue.
        self._inflight = 0

    # -- iteration ---------------------------------------------------------

    def _plan(self, rng):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def _iter_inline(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        """Workerless fallback: correct (if slower) batches built in-process.
        Used when another generator currently owns the shared ring — e.g.
        the dynamic-threshold sweep iterating the unlabeled loader while the
        training `cycle()` iterator still holds in-flight slots."""
        for idxs in batches:
            samples = [self.dataset[int(i)] for i in idxs]
            yield {k: np.stack([np.asarray(s[k]) for s in samples])
                   for k in self.schema}

    def _recv(self, raise_errors: bool):
        """One completion from done_q, with a worker-liveness watchdog: a
        worker killed hard (OOM SIGKILL, segfault) posts nothing, so a bare
        blocking get() would hang forever.  Error completions (dataset
        exceptions, posted by the worker itself) raise unless draining."""
        while True:
            try:
                slot, n_valid, err = self._done_q.get(timeout=10)
            except queue_mod.Empty:
                dead = [p for p in self._procs if not p.is_alive()]
                if dead:
                    self._inflight = 0  # their completions will never come
                    raise ShmWorkerError(
                        f"{len(dead)} loader worker(s) died without posting "
                        f"a completion (exitcodes "
                        f"{[p.exitcode for p in dead]}); likely killed by "
                        "the OS (OOM) or a segfault in decode.")
                continue
            self._inflight -= 1
            if err is not None and raise_errors:
                raise ShmWorkerError(f"dataset raised in loader worker:\n{err}")
            return slot, n_valid

    def _drain(self):
        """Absorb completions of tasks a previous (abandoned) generator left
        in flight.  Their workers may still be WRITING into ring slots, so
        every outstanding task must finish before slots are reused.  Errors
        from the abandoned epoch are swallowed — nobody consumes its data."""
        while self._inflight > 0:
            self._recv(raise_errors=False)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._active:
            # The ring is owned by a live generator (concurrent iteration,
            # e.g. a mid-epoch sweep pass); sharing slots would corrupt
            # batches, so build these in-process instead.  Uses its own RNG
            # stream so the owning iterator's epoch sequence is unchanged.
            yield from self._iter_inline(self._plan(self._inline_rng))
            return
        batches = self._plan(self._rng)
        self._start()
        self._active = True
        try:
            self._drain()

            free = collections.deque(range(self.n_slots))
            it = iter(batches)
            completed: Dict[int, int] = {}  # slot -> n_valid
            submitted: collections.deque = collections.deque()  # slot order

            def submit():
                if not free:
                    return False
                idxs = next(it, None)
                if idxs is None:
                    return False
                slot = free.popleft()
                self._task_q.put((slot, np.asarray(idxs)))
                self._inflight += 1
                submitted.append(slot)
                return True

            while submit():
                pass
            while submitted:
                want = submitted.popleft()
                while want not in completed:
                    slot, n_valid = self._recv(raise_errors=True)
                    completed[slot] = n_valid
                n_valid = completed.pop(want)
                views = self._views[want]
                batch = {k: v[:n_valid].copy() for k, v in views.items()}
                free.append(want)  # copy taken: recycle immediately
                submit()
                yield batch
        finally:
            self._active = False
