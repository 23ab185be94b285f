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

ORDERING CAVEAT (the round-1 bug this module now guards against): a flax
variables dict preserves registration order only until it passes through a
jax pytree operation — ``jax.jit``/``jax.eval_shape`` outputs have their
dict keys re-sorted ALPHABETICALLY, which scrambles any module with >=10
same-typed siblings (``MBConv_10`` sorts before ``MBConv_2``) or whose
registration order differs from name order (EfficientNetV2's head
``ConvBN_1`` sorts right after the stem ``ConvBN_0``).  Positional
matching against a torch state_dict must therefore NEVER trust the
template's iteration order; :func:`module_registration_order` recaptures
the true order with an abstract trace, and the backbone importers below
use it.
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


def module_registration_order(module, input_shape, dtype=None, train=False):
    """Flattened variable paths per collection, in registration order.

    Runs ``module.init`` under ``jax.eval_shape`` (abstract — no FLOPs, no
    device dispatch) and captures each collection's flattened key paths
    *inside* the trace, before jax's pytree canonicalization re-sorts the
    dict keys alphabetically.  ``input_shape`` is the single-sample shape,
    e.g. ``(224, 224, 3)``.
    """
    import jax
    import jax.numpy as jnp

    captured: Dict[str, List[Tuple[str, ...]]] = {}

    def f(k):
        v = module.init(
            {"params": k},
            jnp.zeros((1,) + tuple(input_shape), dtype or jnp.float32),
            train=train)
        for coll in v:
            captured[coll] = [p for p, _ in _flatten(v[coll])]
        return 0

    jax.eval_shape(f, jax.random.key(0))
    return captured


# Classifier-head key prefixes across the reference's checkpoint sources:
# torchvision efficientnet ("classifier."), torchvision resnet ("fc."),
# RepVGG official ("linear."), timm tinyvit ("head.").
TORCH_HEAD_PREFIXES = ("classifier.", "fc.", "linear.", "head.")


def import_torch_backbone(module, variables, state_dict, input_shape,
                          flax_head_names=("RegressionHead_0",),
                          torch_head_prefixes=TORCH_HEAD_PREFIXES,
                          strict: bool = True) -> Dict:
    """Import a torch classification checkpoint's trunk into flax variables.

    Mirrors the reference's pretrained-backbone initialization
    (/root/reference/src/networks.py:301-331,443-471): the torch
    classifier head is dropped, our fresh RegressionHead keeps its
    N(0, 0.01) init, and every trunk tensor is matched positionally in
    module-registration order with role+shape checks.

    ``variables`` may come from a jitted init (alphabetically re-sorted);
    alignment uses :func:`module_registration_order`, not template order.
    Returns a new variables dict with the same structure, trunk replaced.
    """
    order = module_registration_order(module, input_shape)
    torch_seq = [(n, a) for n, a in torch_tensor_sequence(state_dict)
                 if not n.startswith(tuple(torch_head_prefixes))]
    t_params = [(n, a) for n, a in torch_seq
                if not (n.endswith("running_mean") or n.endswith("running_var"))]
    t_stats = [(n, a) for n, a in torch_seq
               if n.endswith("running_mean") or n.endswith("running_var")]

    out = {}
    for coll, stream in (("params", t_params), ("batch_stats", t_stats)):
        if coll not in variables:
            continue
        flat = {p: v for p, v in _flatten(variables[coll])}
        ordered = order.get(coll, [])
        if set(ordered) != set(flat):
            raise ValueError(
                f"{coll}: template paths disagree with a fresh init — "
                "wrong module/variables pairing?")
        trunk = [p for p in ordered if p[0] not in flax_head_names]
        if strict and len(trunk) != len(stream):
            raise ValueError(
                f"{coll}: flax trunk has {len(trunk)} tensors, torch "
                f"checkpoint has {len(stream)} — architectures misaligned")
        new = dict(flat)
        for p, (tname, tarr) in zip(trunk, stream):
            new[p] = _convert_leaf(p, flat[p], tname, tarr)
        out[coll] = _unflatten(list(new.items()))
    for coll in variables:
        out.setdefault(coll, variables[coll])
    return out


def import_repvgg_backbone(variables, state_dict,
                           depths=(1, 4, 6, 16, 1)) -> Dict:
    """Name-mapped import of an official RepVGG train-mode checkpoint.

    Ordered matching does not apply here: the torch RepVGGBlock registers
    ``rbr_identity`` BEFORE ``rbr_dense``/``rbr_1x1`` while our flax block
    creates the identity BN last, so the mapping is explicit:
    ``stage{s}[.j].rbr_dense.conv/bn -> dense_conv/dense_bn``,
    ``rbr_1x1.conv/bn -> one_conv/one_bn``, ``rbr_identity -> id_bn``,
    and the 1000-class ``linear.*`` head is dropped (the reference loads
    weights/RepVGG-B1g2-train.pth the same way, networks.py:232-244).
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v))
          for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}

    prefixes = []
    for s, d in enumerate(depths):
        if s == 0:
            prefixes.append("stage0")
        else:
            prefixes.extend(f"stage{s}.{j}" for j in range(d))

    params = {p: v for p, v in _flatten(variables["params"])}
    stats = {p: v for p, v in _flatten(variables["batch_stats"])}

    def put(tree, path, tname):
        if tname not in sd:
            raise ValueError(f"missing torch key {tname}")
        tree[path] = _convert_leaf(path, tree[path], tname, sd[tname])

    for i, tp in enumerate(prefixes):
        blk = f"RepVGGBlock_{i}"
        for branch, conv, bn in (("rbr_dense", "dense_conv", "dense_bn"),
                                 ("rbr_1x1", "one_conv", "one_bn")):
            put(params, (blk, conv, "kernel"), f"{tp}.{branch}.conv.weight")
            put(params, (blk, bn, "scale"), f"{tp}.{branch}.bn.weight")
            put(params, (blk, bn, "bias"), f"{tp}.{branch}.bn.bias")
            put(stats, (blk, bn, "mean"), f"{tp}.{branch}.bn.running_mean")
            put(stats, (blk, bn, "var"), f"{tp}.{branch}.bn.running_var")
        if (blk, "id_bn", "scale") in params:
            put(params, (blk, "id_bn", "scale"), f"{tp}.rbr_identity.weight")
            put(params, (blk, "id_bn", "bias"), f"{tp}.rbr_identity.bias")
            put(stats, (blk, "id_bn", "mean"),
                f"{tp}.rbr_identity.running_mean")
            put(stats, (blk, "id_bn", "var"), f"{tp}.rbr_identity.running_var")
        elif f"{tp}.rbr_identity.weight" in sd:
            raise ValueError(
                f"torch block {tp} has an identity branch but flax {blk} "
                "does not — depth/width config misaligned")

    out = dict(variables)
    out["params"] = _unflatten(list(params.items()))
    out["batch_stats"] = _unflatten(list(stats.items()))
    return out


def import_tinyvit_backbone(variables, state_dict,
                            depths=(2, 2, 6, 2)) -> Dict:
    """Name-mapped import of an official TinyViT (microsoft/Cream)
    checkpoint — the layout the reference loads via
    tiny_vit_21m_224(pretrained=True) (/root/reference/src/networks.py:
    389-416, src/tiny_vit.py).

    Torch layout: ``patch_embed.seq.{0,2}.{c,bn}``, ``layers.{i}`` with
    ``blocks.{j}`` (stage 0: MBConv conv1/conv2/conv3; stages 1-3:
    attn.norm/qkv/proj/attention_biases + local_conv + mlp.norm/fc1/fc2)
    and ``downsample.conv{1,2,3}``, final ``norm_head``; the 1000-class
    ``head`` is dropped.  Our flax names are per-type indexed
    (TinyViTBlock_4 etc.), so the stage/block mapping is reconstructed
    from ``depths``.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v))
          for k, v in state_dict.items()
          if not k.endswith(("num_batches_tracked", "attention_bias_idxs"))}

    params = {p: v for p, v in _flatten(variables["params"])}
    stats = {p: v for p, v in _flatten(variables["batch_stats"])}

    def put(tree, path, tname):
        if tname not in sd:
            raise ValueError(f"missing torch key {tname} "
                             f"(flax {'/'.join(path)})")
        tree[path] = _convert_leaf(path, tree[path], tname, sd[tname])

    def conv_bn(flax_prefix, tprefix):
        put(params, flax_prefix + ("Conv_0", "kernel"), f"{tprefix}.c.weight")
        put(params, flax_prefix + ("BatchNorm_0", "scale"),
            f"{tprefix}.bn.weight")
        put(params, flax_prefix + ("BatchNorm_0", "bias"),
            f"{tprefix}.bn.bias")
        put(stats, flax_prefix + ("BatchNorm_0", "mean"),
            f"{tprefix}.bn.running_mean")
        put(stats, flax_prefix + ("BatchNorm_0", "var"),
            f"{tprefix}.bn.running_var")

    def layer_norm(flax_prefix, tprefix):
        put(params, flax_prefix + ("scale",), f"{tprefix}.weight")
        put(params, flax_prefix + ("bias",), f"{tprefix}.bias")

    def dense(flax_prefix, tprefix):
        put(params, flax_prefix + ("kernel",), f"{tprefix}.weight")
        put(params, flax_prefix + ("bias",), f"{tprefix}.bias")

    # Patch embed: two Conv2d_BN at Sequential indices 0 and 2.
    conv_bn(("ConvBN_0",), "patch_embed.seq.0")
    conv_bn(("ConvBN_1",), "patch_embed.seq.2")

    mb_idx = 0
    vit_idx = 0
    for stage, d in enumerate(depths):
        for j in range(d):
            t = f"layers.{stage}.blocks.{j}"
            if stage == 0:
                f = (f"TinyViTMBConv_{mb_idx}",)
                mb_idx += 1
                for k, conv in enumerate(("conv1", "conv2", "conv3")):
                    conv_bn(f + (f"ConvBN_{k}",), f"{t}.{conv}")
            else:
                f = (f"TinyViTBlock_{vit_idx}",)
                vit_idx += 1
                attn = f + ("WindowAttention_0",)
                layer_norm(attn + ("LayerNorm_0",), f"{t}.attn.norm")
                dense(attn + ("Dense_0",), f"{t}.attn.qkv")
                dense(attn + ("Dense_1",), f"{t}.attn.proj")
                put(params, attn + ("attention_biases",),
                    f"{t}.attn.attention_biases")
                conv_bn(f + ("ConvBN_0",), f"{t}.local_conv")
                mlp = f + ("TinyViTMlp_0",)
                layer_norm(mlp + ("LayerNorm_0",), f"{t}.mlp.norm")
                dense(mlp + ("Dense_0",), f"{t}.mlp.fc1")
                dense(mlp + ("Dense_1",), f"{t}.mlp.fc2")
        if stage < len(depths) - 1:
            f = (f"PatchMerging_{stage}",)
            for k, conv in enumerate(("conv1", "conv2", "conv3")):
                conv_bn(f + (f"ConvBN_{k}",),
                        f"layers.{stage}.downsample.{conv}")

    layer_norm(("norm_head",), "norm_head")

    out = dict(variables)
    out["params"] = _unflatten(list(params.items()))
    out["batch_stats"] = _unflatten(list(stats.items()))
    return out


def import_pytorchcv_efficientnet(variables, state_dict,
                                  base=((1, 1), (6, 2), (6, 2), (6, 3),
                                        (6, 3), (6, 4), (6, 1)),
                                  depth_mult: float = 1.8) -> Dict:
    """Name-mapped import of a pytorchcv EfficientNet ("efficientnet_b4b"
    etc.) checkpoint — the source the reference uses
    (/root/reference/src/networks.py:359-374).

    pytorchcv layout: ``features.init_block.conv.{conv,bn}``, spatial
    stages ``features.stage{s}.unit{u}`` (a new stage starts at each
    stride-2 block) where the first base stage's expand=1 units are
    EffiDwsConvUnit (``dw_conv``/``se``/``pw_conv``) and the rest are
    EffiInvResUnit (``conv1``/``conv2``/``se``/``conv3``), then
    ``features.final_block.{conv,bn}``; the 1000-class ``output`` head is
    dropped.  ``base`` lists (expand, repeats) per base stage; repeats are
    depth-scaled exactly like the flax model (b4 default).
    """
    import math

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v))
          for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}

    params = {p: v for p, v in _flatten(variables["params"])}
    stats = {p: v for p, v in _flatten(variables["batch_stats"])}

    def put(tree, path, tname):
        if tname not in sd:
            raise ValueError(f"missing torch key {tname} "
                             f"(flax {'/'.join(path)})")
        tree[path] = _convert_leaf(path, tree[path], tname, sd[tname])

    def conv_bn(flax_prefix, tprefix):
        put(params, flax_prefix + ("Conv_0", "kernel"), f"{tprefix}.conv.weight")
        put(params, flax_prefix + ("BatchNorm_0", "scale"), f"{tprefix}.bn.weight")
        put(params, flax_prefix + ("BatchNorm_0", "bias"), f"{tprefix}.bn.bias")
        put(stats, flax_prefix + ("BatchNorm_0", "mean"),
            f"{tprefix}.bn.running_mean")
        put(stats, flax_prefix + ("BatchNorm_0", "var"),
            f"{tprefix}.bn.running_var")

    def se(flax_prefix, tprefix):
        put(params, flax_prefix + ("Conv_0", "kernel"), f"{tprefix}.conv1.weight")
        put(params, flax_prefix + ("Conv_0", "bias"), f"{tprefix}.conv1.bias")
        put(params, flax_prefix + ("Conv_1", "kernel"), f"{tprefix}.conv2.weight")
        put(params, flax_prefix + ("Conv_1", "bias"), f"{tprefix}.conv2.bias")

    conv_bn(("ConvBN_0",), "features.init_block.conv")

    # Strides per base stage (TF EfficientNet): 1,2,2,2,1,2,1 — a stride-2
    # block opens a new pytorchcv spatial stage.
    strides = (1, 2, 2, 2, 1, 2, 1)
    stage, unit, mb = 0, 0, 0
    for (expand, repeats), stride in zip(base, strides):
        n = int(math.ceil(repeats * depth_mult))
        for j in range(n):
            if j == 0 and (stride == 2 or stage == 0):
                stage += 1
                unit = 1
            else:
                unit += 1
            t = f"features.stage{stage}.unit{unit}"
            f = (f"MBConv_{mb}",)
            mb += 1
            if expand == 1:
                conv_bn(f + ("ConvBN_0",), f"{t}.dw_conv")
                se(f + ("SqueezeExcite_0",), f"{t}.se")
                conv_bn(f + ("ConvBN_1",), f"{t}.pw_conv")
            else:
                conv_bn(f + ("ConvBN_0",), f"{t}.conv1")
                conv_bn(f + ("ConvBN_1",), f"{t}.conv2")
                se(f + ("SqueezeExcite_0",), f"{t}.se")
                conv_bn(f + ("ConvBN_2",), f"{t}.conv3")
    conv_bn(("ConvBN_1",), "features.final_block")

    out = dict(variables)
    out["params"] = _unflatten(list(params.items()))
    out["batch_stats"] = _unflatten(list(stats.items()))
    return out


def pretrained_into_state(state, net, state_dict, input_shape, network: str):
    """Apply a pretrained torch trunk to a TrainState (student AND teacher,
    like the reference's two pretrained get_network calls, agent.py:31-35)."""

    def conv(params, batch_stats):
        v = {"params": params, "batch_stats": batch_stats}
        if network == "repvgg":
            v = import_repvgg_backbone(v, state_dict)
        elif network == "tinyvit":
            v = import_tinyvit_backbone(v, state_dict)
        elif network == "effinet":
            v = import_pytorchcv_efficientnet(v, state_dict)
        else:
            v = import_torch_backbone(net, v, state_dict, input_shape)
        return v["params"], v["batch_stats"]

    p, bs = conv(state.params, state.batch_stats)
    ep, ebs = conv(state.ema_params, state.ema_batch_stats)
    return state.replace(params=p, batch_stats=bs,
                         ema_params=ep, ema_batch_stats=ebs)


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
