"""Torch-checkpoint -> flax-variables conversion.

The reference initializes its backbones from torchvision/timm/pytorchcv
pretrained checkpoints (/root/reference/src/networks.py:301-307,443-448).
This module imports such ``state_dict`` files into our flax modules.

Strategy: *ordered structural matching*.  PyTorch ``state_dict`` iteration
order follows module registration order, and our flax modules register
layers in the same topological order as their torch counterparts, so
walking both sequences in parallel and matching tensors by role + shape
(conv kernel OIHW->HWIO, linear OI->IO, BN scale/bias/mean/var) converts
any aligned pair of architectures without a hand-written name map.  Every
leaf is shape-checked; a mismatch raises with both names so misalignments
fail loudly rather than silently producing garbage weights.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten(tree: Dict, prefix=()) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []
    for k in tree:  # flax FrozenDict/dict preserves insertion order
        v = tree[k]
        if isinstance(v, dict) or hasattr(v, "items"):
            out.extend(_flatten(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), v))
    return out


def _unflatten(items) -> Dict:
    tree: Dict = {}
    for path, v in items:
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def torch_tensor_sequence(state_dict) -> List[Tuple[str, np.ndarray]]:
    """Filter a torch state_dict down to the learnable/statistic tensors in
    registration order (drop num_batches_tracked and anchor buffers)."""
    keep = []
    for name, t in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        if "anchor" in name:
            continue
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        keep.append((name, arr))
    return keep


def _convert_leaf(flax_path, flax_val, torch_name, torch_arr):
    """Convert one torch tensor to the flax leaf's expected layout."""
    leaf = flax_path[-1]
    shape = tuple(flax_val.shape)
    if leaf == "kernel" and torch_arr.ndim == 4:  # conv OIHW -> HWIO
        arr = np.transpose(torch_arr, (2, 3, 1, 0))
    elif leaf == "kernel" and torch_arr.ndim == 2:  # linear OI -> IO
        arr = np.transpose(torch_arr, (1, 0))
    else:  # bias / scale / mean / var / embedding-like
        arr = torch_arr
    if tuple(arr.shape) != shape:
        raise ValueError(
            f"shape mismatch: flax {'/'.join(flax_path)} {shape} vs torch "
            f"{torch_name} {torch_arr.shape} (converted {arr.shape})")
    return arr.astype(np.asarray(flax_val).dtype)


_ROLE_OF_TORCH_SUFFIX = {
    "weight": ("kernel", "scale"),
    "bias": ("bias",),
    "running_mean": ("mean",),
    "running_var": ("var",),
}


def convert_state_dict(flax_variables: Dict, state_dict,
                       strict: bool = True) -> Dict:
    """Map an ordered torch state_dict onto flax {'params', 'batch_stats'}.

    Both sides are flattened in registration order; tensors are consumed
    greedily with role + shape agreement.  BatchNorm interleaving differs
    between the frameworks (flax keeps stats in a separate collection), so
    the torch sequence is pre-split into param-role and stat-role streams.
    """
    torch_seq = torch_tensor_sequence(state_dict)
    t_params = [(n, a) for n, a in torch_seq
                if not (n.endswith("running_mean") or n.endswith("running_var"))]
    t_stats = [(n, a) for n, a in torch_seq
               if n.endswith("running_mean") or n.endswith("running_var")]

    out = {}
    for coll, stream in (("params", t_params), ("batch_stats", t_stats)):
        if coll not in flax_variables:
            continue
        flat = _flatten(flax_variables[coll])
        if strict and len(flat) != len(stream):
            raise ValueError(
                f"{coll}: flax has {len(flat)} tensors, torch has "
                f"{len(stream)} — architectures misaligned")
        converted = []
        for (fpath, fval), (tname, tarr) in zip(flat, stream):
            converted.append((fpath, _convert_leaf(fpath, fval, tname, tarr)))
        out[coll] = _unflatten(converted)
    return out


def load_torch_checkpoint(path: str):
    """Load a .pth/.pt state_dict (handles full-checkpoint dicts)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in obj:
                inner = obj[key]
                return inner.state_dict() if hasattr(inner, "state_dict") else inner
    return obj
