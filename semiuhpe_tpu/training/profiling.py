"""Profiling / tracing hooks — first-class here, absent in the reference
(SURVEY.md §5: the HPE path has no profiler integration).

* ``trace(logdir)``: context manager around jax.profiler.trace — produces
  TensorBoard-loadable XPlane traces of device + host activity.
* ``StepTimer``: wall-clock per-step timing with percentile summary
  (p50/p90/p99), for regression tracking without a trace viewer.
* ``device_memory_stats()``: live HBM usage per device when the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy (or when the
    backend cannot trace, e.g. tunneled devices)."""
    if not logdir:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(logdir):
            yield
    except Exception as e:  # backend without profiling support
        print(f"[profiling] trace unavailable: {e}")
        yield


class StepTimer:
    def __init__(self, capacity: int = 10000):
        self._times: List[float] = []
        self._capacity = capacity
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        if len(self._times) < self._capacity:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times) * 1000.0
        return {
            "steps": float(len(arr)),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p90_ms": float(np.percentile(arr, 90)),
            "p99_ms": float(np.percentile(arr, 99)),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
            }
    return out
