"""Multi-host (multi-slice) execution over DCN.

The reference is strictly single-device (SURVEY.md §2.10); single-slice
data parallelism over ICI is this framework's parity scaling story
(parallel/mesh.py).  This module is the *optional* extension beyond
parity: initialize `jax.distributed` across hosts, build a global mesh
whose data axis spans every process's devices, and feed each process its
shard of the global batch.  Collectives stay hierarchical automatically —
XLA reduces over ICI within a slice and over DCN across slices.

Usage (one call per process, before any jax computation):

    from semiuhpe_tpu.parallel import multihost
    multihost.initialize()                 # env-driven (TPU pods autoconf)
    mesh = multihost.global_mesh()
    # loaders should yield per-process batches of size global_batch/n_proc;
    # `shard_global_batch` assembles the global array view.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU autoconfiguration when args are
    omitted; safe to call once per process."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_global_batch(mesh: Mesh, local_batch: Any, axis: str = "data") -> Any:
    """Assemble a per-process host batch into a global sharded array: each
    process contributes its rows; the logical (global) batch dimension is
    n_processes * local_rows."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        local_devices = mesh.local_devices
        if x.shape[0] % len(local_devices) != 0:
            raise ValueError(
                f"local batch rows ({x.shape[0]}) must be divisible by the "
                f"local device count ({len(local_devices)}); round the "
                "per-process batch up (cli/train.py rounds to the mesh "
                "size) or drop the remainder")
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        per_dev = np.split(x, len(local_devices))
        arrays = [jax.device_put(s, d) for s, d in zip(per_dev, local_devices)]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays)

    return jax.tree_util.tree_map(put, local_batch)


def is_main_process() -> bool:
    return jax.process_index() == 0
