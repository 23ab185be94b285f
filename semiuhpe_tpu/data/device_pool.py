"""Device-resident dataset pools: zero per-step H2D.

Measured motivation (BENCH_NOTES.md "device-resident data"): through
the axon relay tunnel a 25 MB unlabeled batch costs ~712 ms of H2D per
step (~35 MB/s), while the same batch gathered on-device from a staged
pool costs ~28 ms/call (the dispatch floor — the gather itself is
bandwidth-trivial).  The relay also leaks ~one host staging copy per
H2D transfer (parallel/mesh.py docstring), so removing per-step
transfers removes the RSS leak as well.

Design: the whole packed dataset (data/packed.py) is ``jax.device_put``
once (uint8 raw crops + float32 labels; 16,384 crops @256px = 3.2 GB,
comfortably inside a v5e's 16 GB HBM next to the model), and each
training step receives ``(pools, idx)`` and gathers its batch INSIDE
the jit program — one ``take`` per tensor, no host↔device traffic
beyond the index vector.  Under a multi-chip mesh the pools are
replicated (each chip holds a copy) and the index vector is sharded
along the data axis, so the gathered batch comes out data-sharded with
no collectives.

TPU-first replacement for the reference's per-step pinned-memory H2D
(torch DataLoader ``pin_memory=True``,
/root/reference/src/datasets/dataset_300WLP.py:311-312): on TPU the
dataset lives in HBM.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DevicePool:
    """Stage a whole dataset's tensors in device memory.

    ``dataset`` may be anything with ``get_batch(idxs)`` (the packed
    fast path) or plain ``__getitem__`` (one-time per-sample
    materialization).  ``keys``, if given, restricts which tensors are
    staged (e.g. only ``img_raw`` for unlabeled pools).
    """

    def __init__(self, dataset, mesh=None, keys: Optional[set] = None,
                 drop: tuple = ("idx",)):
        n = len(dataset)
        if hasattr(dataset, "get_batch"):
            batch = dict(dataset.get_batch(np.arange(n)))
        else:
            samples = [dataset[i] for i in range(n)]
            batch = {k: np.stack([np.asarray(s[k]) for s in samples])
                     for k in samples[0]}
        for k in drop:
            batch.pop(k, None)
        if keys is not None:
            batch = {k: v for k, v in batch.items() if k in keys}
        sharding = None
        if mesh is not None:
            from semiuhpe_tpu.parallel.mesh import replicated

            sharding = replicated(mesh)
        self.arrays: Dict[str, Any] = {
            k: (jax.device_put(v, sharding) if sharding is not None
                else jax.device_put(v))
            for k, v in batch.items()}
        self.n = n

    def __len__(self) -> int:
        return self.n


def gather(pools: Dict[str, Any], idx):
    """In-program batch gather; restores the per-sample ``idx`` field."""
    out = {k: jnp.take(v, idx, axis=0) for k, v in pools.items()}
    out["idx"] = idx
    return out


def with_pools(step_fn, n_batches: int):
    """Wrap ``step(state, *batches, *scalars)`` so each batch argument
    becomes a ``(pools, idx)`` pair gathered inside the program."""

    def wrapped(state, *args):
        batches = [gather(args[2 * i], args[2 * i + 1])
                   for i in range(n_batches)]
        return step_fn(state, *batches, *args[2 * n_batches:])

    return wrapped


def jit_pool_step(step_fn, mesh, n_batches: int = 1, n_scalar_args: int = 0,
                  axis: str = "data", donate_state: bool = True):
    """Pool twin of parallel.mesh.jit_step: state/pools replicated, index
    vectors sharded along the data axis (the gathered batch is therefore
    data-sharded with no collectives), state optionally donated.  Pools
    are runtime arguments, never jit constants — a closed-over pool
    would be baked into the executable."""
    from semiuhpe_tpu.parallel.mesh import (batch_sharding, replicated,
                                            trace_mesh)

    repl = replicated(mesh)
    idx_s = batch_sharding(mesh, axis)
    in_shardings = ((repl,) + (repl, idx_s) * n_batches
                    + (repl,) * n_scalar_args)
    pooled = with_pools(step_fn, n_batches)

    def traced(*args):
        with trace_mesh(mesh, axis):
            return pooled(*args)

    return jax.jit(traced,
                   in_shardings=in_shardings,
                   donate_argnums=(0,) if donate_state else ())


def jit_pool_scan(step_fn, mesh, n_batches: int = 1, n_scalar_args: int = 0,
                  axis: str = "data", donate_state: bool = True):
    """K-step `lax.scan` twin of jit_pool_step: one dispatch per chunk.

    Per-step dispatch through the axon relay costs ~10-30 ms of host
    round-trips that short steps (supervised b32 @224 compute ~13 ms)
    cannot hide; scanning K steps device-side amortizes it to ~1/K.

    Returned callable:
        (state, pools_0, idxs_0 (K, b0), [pools_1, idxs_1 (K, b1)],
         keys (K,), *scalars) -> (state, last_step_metrics)

    All K batches are gathered from the resident pools OUTSIDE the scan
    and scanned as xs — an in-scan gather from the staged pool measured
    ~100x slower through the relay (BENCH_NOTES), while scan's xs
    slicing is the standard fast path.  `keys` carries one PRNG key per
    step so results are bit-identical to K single-step dispatches.
    Scalars (e.g. conf_thres) are constant across the chunk; the caller
    must end chunks at every boundary that changes them.
    """
    from semiuhpe_tpu.parallel.mesh import replicated, trace_mesh

    def chunked(state, *args):
        pools = [args[2 * i] for i in range(n_batches)]
        idxs = [args[2 * i + 1] for i in range(n_batches)]
        keys = args[2 * n_batches]
        scalars = args[2 * n_batches + 1:]
        k = idxs[0].shape[0]
        batches = []
        for p, ix in zip(pools, idxs):
            flat = gather(p, ix.reshape(-1))
            batches.append(jax.tree_util.tree_map(
                lambda a, b=ix.shape[1]: a.reshape((k, b) + a.shape[1:]),
                flat))

        def body(st, xs):
            bs, key = xs[:-1], xs[-1]
            st, metrics = step_fn(st, *bs, key, *scalars)
            return st, metrics

        state_out, ms = jax.lax.scan(body, state, (*batches, keys))
        return state_out, jax.tree_util.tree_map(lambda a: a[-1], ms)

    def traced(*args):
        with trace_mesh(mesh, axis):
            return chunked(*args)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = replicated(mesh)
    idx_rows = NamedSharding(mesh, P(None, axis))
    in_shardings = ((repl,) + (repl, idx_rows) * n_batches + (repl,)
                    + (repl,) * n_scalar_args)
    return jax.jit(traced, in_shardings=in_shardings,
                   donate_argnums=(0,) if donate_state else ())


def epoch_indices(n: int, batch: int, seed: int, epoch: int,
                  shuffle: bool = True) -> Iterator[np.ndarray]:
    """Shuffled drop-last index batches for one epoch (Loader-equivalent
    sampling semantics; the permutation is reproducible per epoch)."""
    order = (np.random.default_rng((seed, epoch)).permutation(n)
             if shuffle else np.arange(n))
    for i in range(0, n - batch + 1, batch):
        yield order[i:i + batch].astype(np.int32)


def infinite_indices(n: int, batch: int, seed: int) -> Iterator[np.ndarray]:
    """Endless shuffled index batches (the unlabeled ``cycle()`` twin)."""
    epoch = 0
    while True:
        yield from epoch_indices(n, batch, seed, epoch)
        epoch += 1
