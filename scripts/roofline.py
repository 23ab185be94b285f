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
* Each boundary tensor t (bf16) is touched 4x per train step:
    fwd   write t                 (1)
    bwd   read t   for wgrad      (1)
    bwd   write dt                (1)
    bwd   read  dt for dgrad      (1)
  so bytes >= 4 * sum|t|.  Params add 3 touches (read fwd, read bwd,
  write grad) — negligible for convnets at these batch sizes.
* FLOPs: XLA ``cost_analysis`` of the jitted forward (x3 for fwd+bwd)
  at the v5e bf16 MXU peak (197 TFLOP/s).  This FLOP floor ignores that
  depthwise convs run on the VPU (~3.9 TF/s) — the per-component
  VPU split is in scripts/tinyvit_floor.py for tinyvit; for conv nets
  the HBM term dominates anyway.

floor_ms = max(bytes / 819 GB/s, flops / 197 TF/s).

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

    def is_conv_boundary(mdl, method_name):
        return type(mdl).__name__ in ("Conv", "ConvLocal", "Dense",
                                      "ConvS2D", "DenseGeneral")

    def fwd(v, x):
        out, inter = net.apply(
            v, x, train=False, capture_intermediates=is_conv_boundary,
            mutable=["intermediates"])
        return out, inter

    _, inter = jax.eval_shape(fwd, v, x)

    tensors = []

    def walk(tree, path=""):
        for k, val in tree.items():
            if isinstance(val, dict):
                walk(val, f"{path}/{k}")
            else:
                for t in (val if isinstance(val, tuple) else (val,)):
                    tensors.append((f"{path}/{k}", t.shape))

    walk(inter.get("intermediates", {}))
    act_bytes = sum(int(np.prod(s)) * BYTES for _, s in tensors)
    traffic = 4 * act_bytes + 3 * params_bytes
    hbm_ms = traffic / HBM * 1e3

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
        "conv_boundaries": len(tensors),
        "activation_GB": round(act_bytes / 1e9, 3),
        "params_MB": round(params_bytes / 1e6, 1),
        "traffic_floor_GB": round(traffic / 1e9, 3),
        "hbm_floor_ms": round(hbm_ms, 2),
        "fwd_GFLOPs": round(fwd_flops / 1e9, 1) if fwd_flops else None,
        "mxu_floor_ms": round(mxu_ms, 2) if mxu_ms else None,
        "floor_ms": round(max(hbm_ms, mxu_ms or 0), 2),
        "top_tensors": [
            {"path": p[-60:], "shape": list(s),
             "MB": round(int(np.prod(s)) * BYTES / 1e6, 1)}
            for p, s in biggest],
    }, indent=1))


if __name__ == "__main__":
    main()
