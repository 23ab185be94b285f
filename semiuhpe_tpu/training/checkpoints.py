"""Orbax checkpointing of the full training state.

Replaces torch .pth dicts {clock, model, model_ema, optimizer}
(/root/reference/src/agent.py:302-354) with orbax snapshots of the single
TrainState pytree (step + student + teacher + optimizer); ``best`` and
stage-boundary reload semantics live in the train CLI.

Saves are *synchronous* (``ocp.Checkpointer``, not the async
``StandardCheckpointer``) and guarded by a watchdog: a live 224px run
deadlocked forever inside the async checkpointer's background
finalize thread (commit-future wait in an asyncio loop that never woke
up) with the tmp dir fully written.  The sync path finalizes on the
calling thread; if even that wedges (remote-backend I/O), the watchdog
exits 75 (EX_TEMPFAIL) so scripts/train_auto_resume.sh relaunches from
the last finalized checkpoint instead of hanging the run.
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import sys
import threading
from typing import Any

import jax
import orbax.checkpoint as ocp

# Generous vs the observed healthy save time (<1 min for a 295 MB
# EffNetV2-S state through the relay); a save that takes longer than
# this is wedged, not slow.
_SAVE_TIMEOUT_S = float(os.environ.get("SEMIUHPE_CKPT_TIMEOUT", "600"))

# Device->host value fetches through the axon relay can also wedge
# permanently (observed live: an eval `Array.__array__` fetch stuck >13
# min while a concurrent nice-19 pytest ran; the fetch never returned
# even after the CPU load was killed).  Healthy evals/log fetches are
# seconds; anything past this is a hang, not a queue.
_FETCH_TIMEOUT_S = float(os.environ.get("SEMIUHPE_FETCH_TIMEOUT", "600"))


@contextlib.contextmanager
def wedge_watchdog(label: str, timeout_s: float | None = None):
    """Hard-exit 75 (EX_TEMPFAIL) if the wrapped block wedges.

    Wrap any blocking device-value fetch on the training hot path (eval
    loops, log-metric fetches, entropy sweeps) so a hung relay turns
    into a ~20 s auto-resume from the rolling ``latest`` checkpoint
    (scripts/train_auto_resume.sh) instead of a permanently stalled run.
    ``os._exit`` because the stuck fetch holds arbitrary runtime locks —
    a SystemExit raised on a timer thread would not unwind it.
    """
    timeout = _FETCH_TIMEOUT_S if timeout_s is None else timeout_s

    def _wedged():
        print(f"wedge_watchdog: {label} wedged >{timeout:g}s; "
              "exiting 75 for auto-resume", file=sys.stderr, flush=True)
        os._exit(75)

    timer = threading.Timer(timeout, _wedged)
    timer.daemon = True
    timer.start()
    try:
        yield
    finally:
        timer.cancel()


def _clean_stale_tmp(path: str) -> None:
    """Remove tmp dirs left by a previous hung/killed save at ``path``
    (orbax refuses to reuse them, and they shadow the real checkpoint)."""
    for stale in glob.glob(path + ".orbax-checkpoint-tmp*"):
        shutil.rmtree(stale, ignore_errors=True)


def save_checkpoint(model_dir: str, name: str, state: Any,
                    timeout_s: float = None) -> str:
    path = os.path.abspath(os.path.join(model_dir, name))
    _clean_stale_tmp(path)
    timeout = _SAVE_TIMEOUT_S if timeout_s is None else timeout_s

    with wedge_watchdog(f"save_checkpoint writing {path}", timeout):
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    return path


def load_checkpoint(model_dir: str, name: str, template: Any) -> Any:
    """Restore into the structure/shardings of ``template`` (an existing
    TrainState with the right shapes)."""
    # ``name`` may already be a usable path (resolve_ckpt returns CLI paths
    # that exist relative to the CWD verbatim) — joining those onto
    # model_dir would double the prefix.
    path = name if os.path.isdir(name) else os.path.join(model_dir, name)
    if not os.path.isdir(path):
        path_abs = os.path.abspath(path)
        if not os.path.isdir(path_abs):
            raise FileNotFoundError(f"checkpoint {path} not found")
        path = path_abs
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(os.path.abspath(path),
                             args=ocp.args.StandardRestore(abstract))
