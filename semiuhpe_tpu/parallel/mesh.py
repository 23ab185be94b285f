"""Device mesh + sharding helpers (pjit/ICI data parallelism).

The reference trains on exactly one GPU (`SURVEY.md` §2.10); scaling here
is pure-JAX SPMD: a 1-D ``data`` mesh over all local devices, batches
sharded on the leading axis, parameters/optimizer state replicated.  All
steps are written as *global-view* programs, so XLA inserts the gradient
all-reduce (over ICI on a real slice) automatically — there is no manual
psum and no NCCL-style process group to manage.

BatchNorm note: under global-view jit the batch statistics are computed
over the *global* batch (XLA lowers the mean/var reductions to
cross-device collectives), which matches the single-device reference
semantics exactly — unlike per-replica BN in pmap-style code.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Trace-time mesh context: global-view step programs carry no axis_name,
# so modules that need mesh-aware lowering decisions (e.g. shard_map
# around a Pallas kernel, which the SPMD partitioner would otherwise
# treat as an opaque custom call and gather/replicate) can consult the
# mesh the surrounding step is being traced for.  jit traces
# synchronously on first call, so a plain context manager around the
# traced body is sufficient.
# Thread-local so concurrent traces (e.g. an eval program warmed on a
# side thread) cannot see each other's mesh.
_TRACE_MESH = threading.local()


@contextlib.contextmanager
def trace_mesh(mesh: Mesh, axis: str = "data"):
    stack = getattr(_TRACE_MESH, "stack", None)
    if stack is None:
        stack = _TRACE_MESH.stack = []
    stack.append((mesh, axis))
    try:
        yield
    finally:
        stack.pop()


def current_trace_mesh():
    """(mesh, data_axis_name) the enclosing jit_step is traced for, or None."""
    stack = getattr(_TRACE_MESH, "stack", None)
    return stack[-1] if stack else None


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded along the leading dim."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def jit_with_mesh(fn, mesh: Mesh, axis: str = "data", **jit_kwargs):
    """jax.jit with the mesh published at trace time (see trace_mesh).

    Use for every mesh-bound program that applies a network — eval,
    entropy sweeps, feature dumps — not just the train steps, so
    mesh-aware lowering (e.g. the shard_map'd Pallas window attention)
    triggers consistently."""
    def traced(*args):
        with trace_mesh(mesh, axis):
            return fn(*args)

    return jax.jit(traced, **jit_kwargs)


def jit_step(step_fn, mesh: Mesh, n_batch_args: int = 1, n_scalar_args: int = 0,
             axis: str = "data", donate_state: bool = True,
             donate_batches: bool = True):
    """jit a ``step(state, *batches, *scalars) -> (state, metrics)`` function
    with state replicated and batches sharded along the data axis.

    ``donate_state=True`` lets XLA update parameters in place (halves peak
    HBM for the state).  ``donate_batches=True`` additionally donates the
    per-step input batches — they are consumed exactly once, so donation
    releases their device buffers eagerly.

    Known environment issue (measured, not fixed by donation): the axon
    IFRT-proxy relay leaks ~one host-side staging copy per H2D transfer
    (~batch-bytes per step; 130 GB OOM over a 23k-iteration SSL run; the
    CPU backend is flat).  The retention is inside the native proxy
    client.  Long runs on that backend should use the auto-resume wrapper
    (scripts/train_auto_resume.sh) which restarts the process from the
    rolling `latest` checkpoint when RSS is exhausted."""
    state_s = replicated(mesh)
    batch_s = batch_sharding(mesh, axis)
    in_shardings = (state_s,) + (batch_s,) * n_batch_args + (state_s,) * n_scalar_args
    donate = (0,) if donate_state else ()
    if donate_batches:
        donate = donate + tuple(range(1, 1 + n_batch_args))

    def traced(*args):
        with trace_mesh(mesh, axis):
            return step_fn(*args)

    return jax.jit(
        traced,
        in_shardings=in_shardings,
        donate_argnums=donate,
    )
