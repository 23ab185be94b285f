#!/usr/bin/env python
"""Bytes-based roofline for the SSL student forward+backward (VERDICT r3 #3).

Computes an ANALYTIC lower bound on the HBM traffic and MXU time of one
training pass at the bench shapes, from the network's own intermediate
tensor shapes, and prints it next to the measured step decomposition so
BENCH_NOTES can state "measured ~= floor" (or not) per backbone.

Traffic model (documented, deliberately optimistic toward the hardware —
a real implementation can only be slower):

* Materialization points are CONV/DENSE boundaries (captured with flax
  ``capture_intermediates`` on Conv/Dense module outputs under
  ``eval_shape`` — zero compute).  Elementwise/BN/activation glue between
  convs is assumed PERFECTLY fused (XLA largely achieves this), so it
  contributes no traffic.
* Two touch models are reported for each boundary tensor t (bf16):
  - ``ideal4``: 4 touches — fwd write t, bwd read t (wgrad), bwd write
    dt, bwd read dt (dgrad).  This is the flash-fusion fantasy bound
    (every consumer read fused into the producer, wgrad and dgrad
    sharing one dt read): nothing real can hit it, it only serves as the
    unconditional lower bound.
  - ``conv6``: 6 touches — the minimum for an implementation whose unit
    of fusion is one conv: fwd write t + consumer conv reads t; wgrad
    reads t and dt (they are the two operands of the wgrad conv); dgrad
    reads dt, writes d(t_prev counted at that tensor).  This is the
    floor FOR THE STRATEGY XLA actually uses (conv-by-conv with fused
    elementwise glue), still optimistic: it assumes dgrad/wgrad share
    every read via fusion where possible and BN costs only its
    irreducible extra pass.
* BatchNorm (global batch stats) adds one extra full read of each
  pre-norm tensor per BN in the forward (two-pass mean/var; the
  normalize apply is assumed fused into the consumer) and one extra
  read in the backward (the dgamma/dbeta + input-centering reductions
  cannot all fuse into the dgrad conv).  Reported as ``bn_extra``.
* FLOPs: XLA ``cost_analysis`` of the jitted forward (x3 for fwd+bwd)
  at the v5e bf16 MXU peak (197 TFLOP/s).  This FLOP floor ignores that
  depthwise convs run on the VPU (~3.9 TF/s) — the per-component
  VPU split is in scripts/tinyvit_floor.py for tinyvit; for conv nets
  the HBM term dominates anyway.

floor_ms = max(bytes / 819 GB/s, flops / 197 TF/s), per touch model.

Usage: BENCH_NET=effinetv2 python scripts/roofline.py   (CPU-safe: shapes
and cost analysis only, nothing runs on the TPU).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NET = os.environ.get("BENCH_NET", "effinetv2")
BATCH = int(os.environ.get("BENCH_BATCH", 160))   # student fwd+bwd batch
SIZE = int(os.environ.get("BENCH_SIZE", 224))
HBM = 819e9
MXU_BF16 = 197e12
BYTES = 2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from semiuhpe_tpu.models import build_network

    net = build_network(NET, dtype=jnp.bfloat16)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    v = jax.eval_shape(lambda k: net.init({"params": k}, x[:1], train=False),
                       jax.random.key(0))
    params_bytes = sum(int(np.prod(p.shape)) * BYTES
                       for p in jax.tree.leaves(v["params"]))

    def is_boundary(mdl, method_name):
        return type(mdl).__name__ in ("Conv", "ConvLocal", "Dense",
                                      "ConvS2D", "DenseGeneral",
                                      "BatchNorm")

    def fwd(v, x):
        out, inter = net.apply(
            v, x, train=False, capture_intermediates=is_boundary,
            mutable=["intermediates"])
        return out, inter

    _, inter = jax.eval_shape(fwd, v, x)

    tensors, bn_tensors = [], []

    def walk(tree, path=""):
        for k, val in tree.items():
            if isinstance(val, dict):
                walk(val, f"{path}/{k}")
            else:
                for t in (val if isinstance(val, tuple) else (val,)):
                    (bn_tensors if "BatchNorm" in path else tensors).append(
                        (f"{path}/{k}", t.shape))

    walk(inter.get("intermediates", {}))
    act_bytes = sum(int(np.prod(s)) * BYTES for _, s in tensors)
    bn_bytes = sum(int(np.prod(s)) * BYTES for _, s in bn_tensors)
    # BN two-pass fwd stats + non-fusable bwd reductions: 2 extra reads of
    # each pre-norm tensor per train step.
    bn_extra = 2 * bn_bytes
    ideal4 = 4 * act_bytes + 3 * params_bytes
    conv6 = 6 * act_bytes + 3 * params_bytes + bn_extra
    hbm_ms = ideal4 / HBM * 1e3
    hbm6_ms = conv6 / HBM * 1e3

    # FLOPs of the real forward via cost analysis (CPU compile, same HLO
    # math), x3 for fwd+bwd.
    fwd_flops = None
    try:
        vr = jax.jit(lambda k: net.init({"params": k}, x[:1], train=False))(
            jax.random.key(0))
        c = jax.jit(lambda v, x: net.apply(v, x, train=False)).lower(
            vr, x).compile().cost_analysis()
        ca = c[0] if isinstance(c, (list, tuple)) else c
        fwd_flops = float(ca.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    mxu_ms = 3 * fwd_flops / MXU_BF16 * 1e3 if fwd_flops else None

    biggest = sorted(tensors, key=lambda t: -int(np.prod(t[1])))[:8]
    print(json.dumps({
        "net": NET, "batch": BATCH, "size": SIZE,
        "conv_boundaries": len(tensors), "bn_layers": len(bn_tensors),
        "activation_GB": round(act_bytes / 1e9, 3),
        "bn_prenorm_GB": round(bn_bytes / 1e9, 3),
        "params_MB": round(params_bytes / 1e6, 1),
        "ideal4_traffic_GB": round(ideal4 / 1e9, 3),
        "ideal4_hbm_floor_ms": round(hbm_ms, 2),
        "conv6_traffic_GB": round(conv6 / 1e9, 3),
        "conv6_hbm_floor_ms": round(hbm6_ms, 2),
        "fwd_GFLOPs": round(fwd_flops / 1e9, 1) if fwd_flops else None,
        "mxu_floor_ms": round(mxu_ms, 2) if mxu_ms else None,
        "ideal4_floor_ms": round(max(hbm_ms, mxu_ms or 0), 2),
        "conv6_floor_ms": round(max(hbm6_ms, mxu_ms or 0), 2),
        "top_tensors": [
            {"path": p[-60:], "shape": list(s),
             "MB": round(int(np.prod(s)) * BYTES / 1e6, 1)}
            for p, s in biggest],
    }, indent=1))


if __name__ == "__main__":
    main()
