"""BPJDet detector weight import (torch .pt -> flax variables).

The torch BPJDet/YOLOv5 `Model` registers children in yaml order as
``model.{i}`` (/root/reference/models/yolo.py:259 parse_model;
models/yolov5l6.yaml gives the indices), but within C3 blocks the
registration order (cv1, cv2, cv3, m) differs from dataflow order, so
ordered structural matching cannot apply — the import is NAME-MAPPED:
our flax module names mirror the yaml indices (b0..b11, h12..h32,
detect0..3) and each block's children keep the torch child names
(conv/bn, cv1/cv2/cv3, m{i}).
"""

from __future__ import annotations

import numpy as np

# flax top-level module name -> torch `model.{idx}` yaml index
# (models/yolov5l6.yaml: backbone 0-11, neck 12..32, Detect 33; Upsample/
# Concat layers own no parameters).
_BLOCK_IDX = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9, "b10": 10, "b11": 11,
    "h12": 12, "h15": 15, "h16": 16, "h19": 19, "h20": 20, "h23": 23,
    "h24": 24, "h26": 26, "h27": 27, "h29": 29, "h30": 30, "h32": 32,
}
DETECT_IDX = 33

_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias",
         "mean": "running_mean", "var": "running_var"}


def _torch_key(block: str, path):
    """Flax ('cv1','conv','kernel')-style path -> torch dotted key."""
    if block.startswith("detect"):
        return f"model.{DETECT_IDX}.m.{block[len('detect'):]}.{_LEAF[path[-1]]}"
    parts = []
    for p in path[:-1]:
        if p.startswith("m") and p[1:].isdigit():  # C3 bottleneck list
            parts.append(f"m.{p[1:]}")
        else:
            parts.append(p)
    mid = ("." + ".".join(parts)) if parts else ""
    return f"model.{_BLOCK_IDX[block]}{mid}.{_LEAF[path[-1]]}"


def import_bpjdet_torch(model, template, state_dict):
    """Name-mapped import of a torch BPJDet state_dict into flax variables.

    Every flax leaf must find its torch twin (missing keys raise, with the
    derived name, so a wrong variant/num_offsets fails loudly); shapes are
    checked leaf-by-leaf with the usual OIHW->HWIO / OI->IO transposes.
    """
    from semiuhpe_tpu.models.convert import _convert_leaf, _flatten, _unflatten

    sd = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked") or "anchor" in k:
            continue
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    used = set()
    out = {}
    for coll in template:
        leaves = []
        for path, val in _flatten(template[coll]):
            tkey = _torch_key(path[0], path[1:])
            if tkey not in sd:
                raise ValueError(
                    f"torch checkpoint missing {tkey} (flax "
                    f"{'/'.join(path)}) — wrong variant/nc/num_offsets?")
            leaves.append((path, _convert_leaf(path, val, tkey, sd[tkey])))
            used.add(tkey)
        out[coll] = _unflatten(leaves)
    unused = sorted(set(sd) - used)
    if unused:
        raise ValueError(
            f"{len(unused)} torch tensors unmatched (e.g. {unused[:4]}) — "
            "architectures misaligned")
    return out


def load_bpjdet_weights(model, weights_path: str):
    """Load a BPJDet YOLOv5 checkpoint into the flax model's variables.

    Accepts either a torch .pt checkpoint (name-mapped import, see
    :func:`import_bpjdet_torch`) or a pre-converted .npz of the flax tree.
    """
    import jax
    import jax.numpy as jnp

    template = model.init({"params": jax.random.key(0)},
                          jnp.zeros((1, 128, 128, 3)), train=False)
    if weights_path.endswith(".npz"):
        from flax.traverse_util import unflatten_dict

        data = np.load(weights_path)
        flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
        return unflatten_dict(flat)

    from semiuhpe_tpu.models.convert import load_torch_checkpoint

    state_dict = load_torch_checkpoint(weights_path)
    return import_bpjdet_torch(model, template, state_dict)


def save_variables_npz(variables, path: str) -> None:
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}
    np.savez(path, **flat)
