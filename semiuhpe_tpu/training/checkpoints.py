"""Orbax checkpointing of the full training state.

Replaces torch .pth dicts {clock, model, model_ema, optimizer}
(/root/reference/src/agent.py:302-354) with orbax snapshots of the single
TrainState pytree (step + student + teacher + optimizer); ``best`` and
stage-boundary reload semantics live in the train CLI.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(model_dir: str, name: str, state: Any) -> str:
    path = os.path.abspath(os.path.join(model_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
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
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(os.path.abspath(path), abstract)
