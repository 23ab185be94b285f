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
  at the v5e bf16 MXU peak (197 TFLOP/s) for the aggregate; ADDITIONALLY
  an analytic per-conv FLOP count (kernel shape from params joined to
  the captured output shape by module path) splits depthwise convs out
  to the VPU rate (~3.9 TF/s fp32 ALU — dw convs never touch the MXU),
  which the aggregate cost-analysis floor cannot see.
* Per-stage table (effinetv2 only): the same conv6+BN traffic and
  MXU/VPU compute terms grouped by trunk stage, to sit next to the
  measured trunk-ladder diffs in BENCH_NOTES (stage floors vs measured
  stage times is the per-stage floor statement VERDICT r3 #3ii asks
  for).  Per-stage floor_ms = max(hbm_ms, mxu_ms + vpu_ms) — compute
  terms add because dw and dense convs of one block run sequentially.

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
VPU = 3.9e12               # v5e VPU fp32 ALU FLOP/s (dw convs)
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

    # ---- per-conv FLOP split (MXU vs VPU) via params-path join --------
    from jax.tree_util import tree_flatten_with_path

    kernels = {}   # "FusedMBConv_3/ConvBN_0/Conv_0" -> kernel shape
    for kp, leaf in tree_flatten_with_path(v["params"])[0]:
        keys = [getattr(k, "key", str(k)) for k in kp]
        if keys[-1] == "kernel":
            kernels["/".join(keys[:-1])] = leaf.shape

    def r128(d):
        """Fraction of a 128-wide MXU dim actually used at size d."""
        import math
        return d / (math.ceil(d / 128) * 128)

    def conv_terms(path, out_shape):
        """(mxu_flops, vpu_flops, mxu_adj_flops) fwd-only FLOPs for the
        op that produced ``out_shape`` at module ``path``.

        ``mxu_adj_flops`` is an effective-FLOP ESTIMATE (not a bound):
        per-pass (fwd / dgrad / wgrad) FLOPs divided by the MXU tile
        utilization from rounding the GEMM K and N (and wgrad's small M)
        dims up to the 128-wide array — the mechanism behind the known
        low-channel inefficiency of early conv stages.  Stride/dilation
        effects in dgrad and the dead stem dgrad are ignored.
        """
        key = path.strip("/").removesuffix("/__call__")
        ks = kernels.get(key)
        if ks is None:
            return 0, 0, 0
        if len(ks) == 2:                      # Dense: (CI, CO)
            fl = 2 * int(np.prod(out_shape)) * ks[0]
            return fl, 0, 3 * fl / (r128(ks[0]) * r128(ks[1]))
        if len(ks) == 4:                      # Conv: (kh, kw, cin_g, CO)
            kh, kw, cin_g, co = ks
            fl = 2 * int(np.prod(out_shape)) * kh * kw * cin_g
            if cin_g == 1 and kh * kw > 1:    # depthwise -> VPU
                return 0, fl, 0
            u_fwd = r128(kh * kw * cin_g) * r128(co)      # K x N
            u_dgrad = r128(kh * kw * co) * r128(cin_g)    # K x N
            u_wgrad = r128(kh * kw * cin_g) * r128(co)    # M x N (K huge)
            adj = fl / u_fwd + fl / u_dgrad + fl / u_wgrad
            return fl, 0, adj
        return 0, 0, 0

    # ---- per-stage grouping (effinetv2-s trunk layout) ----------------
    def stage_of(path):
        seg = path.strip("/").split("/")[0]
        if NET.startswith("effinet") and NET not in ("effinetv2",
                                                     "effinetv2_s"):
            # EfficientNet-v1 trunk (B4 default): MBConv_<i> grouped into
            # the 7 compound-scaled stages (repeats (1,2,2,3,3,4,1) x
            # depth_mult, models/efficientnet.py _BASE).
            if seg.startswith("MBConv_"):
                import math
                wm, dm = __import__(
                    "semiuhpe_tpu.models.efficientnet",
                    fromlist=["_SCALES"])._SCALES[
                        NET.split("_")[-1] if "_" in NET else "b4"]
                reps = [math.ceil(dm * r) for r in (1, 2, 2, 3, 3, 4, 1)]
                i = int(seg.split("_")[1])
                for si, r in enumerate(reps):
                    if i < r:
                        return f"s{si + 1}"
                    i -= r
                return "s7"
            if seg == "ConvBN_0":
                return "stem"
            if seg == "ConvBN_1":
                return "head_conv"
            return "head"
        if NET not in ("effinetv2", "effinetv2_s"):
            return seg
        if seg.startswith("FusedMBConv_"):
            i = int(seg.split("_")[1])
            return "s1" if i < 2 else ("s2" if i < 6 else "s3")
        if seg.startswith("MBConv_"):
            i = int(seg.split("_")[1])
            return "s4" if i < 6 else ("s5" if i < 15 else "s6")
        if seg in ("ConvBN_0", "ConvS2D_0"):
            return "stem"
        if seg == "ConvBN_1":
            return "head_conv"
        return "head"

    def padded_bytes(shape):
        """Bytes of ``shape`` with the minor (channel) dim padded to the
        128-lane tile — what XLA's default NHWC layout actually moves for
        low-channel tensors (a 48-channel tensor costs 2.67x its logical
        bytes).  Second-minor (16-sublane) padding is deliberately NOT
        charged: measured s6 times (7x7 spatial, wide channels) come in
        BELOW the (16,128) model's floor, falsifying it — XLA evidently
        avoids the sublane waste there (spatial folding), so only the
        channel term is defensible as a strategy floor."""
        import math
        if len(shape) < 1:
            return int(np.prod(shape)) * BYTES
        minor = math.ceil(shape[-1] / 128) * 128
        return int(np.prod(shape[:-1])) * minor * BYTES

    stages = {}
    for p, s in tensors:
        st = stages.setdefault(stage_of(p),
                               dict(act=0, bn=0, mxu=0, vpu=0, adj=0,
                                    act_pad=0))
        st["act"] += int(np.prod(s)) * BYTES
        st["act_pad"] += padded_bytes(s)
        m, vp, adj = conv_terms(p, s)
        st["mxu"] += 3 * m          # fwd + dgrad + wgrad
        st["vpu"] += 3 * vp
        st["adj"] += adj
    for p, s in bn_tensors:
        st = stages.setdefault(stage_of(p),
                               dict(act=0, bn=0, mxu=0, vpu=0, adj=0,
                                    act_pad=0))
        st["bn"] += int(np.prod(s)) * BYTES

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

    def stage_row(name, st):
        hbm = (6 * st["act"] + 2 * st["bn"]) / HBM * 1e3
        mxu = st["mxu"] / MXU_BF16 * 1e3
        vpu = st["vpu"] / VPU * 1e3
        adj = st["adj"] / MXU_BF16 * 1e3
        hbm_pad = (6 * st["act_pad"] + 2 * st["bn"]) / HBM * 1e3
        return {
            "stage": name,
            "conv6_GB": round((6 * st["act"] + 2 * st["bn"]) / 1e9, 3),
            "hbm_ms": round(hbm, 2), "mxu_ms": round(mxu, 2),
            "vpu_ms": round(vpu, 2),
            "floor_ms": round(max(hbm, mxu + vpu), 2),
            "lane_adj_est_ms": round(max(hbm, adj + vpu), 2),
            "hbm_padded_ms": round(hbm_pad, 2),
            "xla_strategy_est_ms": round(max(hbm_pad, adj + vpu), 2),
        }

    order = ["stem", "s1", "s2", "s3", "s4", "s5", "s6", "head_conv",
             "head"]
    per_stage = [stage_row(n, stages[n]) for n in order if n in stages]
    per_stage += [stage_row(n, st) for n, st in sorted(stages.items())
                  if n not in order]
    vpu_ms_total = sum(st["vpu"] for st in stages.values()) / VPU * 1e3
    mxu_ms_analytic = (sum(st["mxu"] for st in stages.values())
                       / MXU_BF16 * 1e3)

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
        "analytic_mxu_ms": round(mxu_ms_analytic, 2),
        "analytic_vpu_ms": round(vpu_ms_total, 2),
        "conv6_floor_with_vpu_ms": round(
            max(hbm6_ms, mxu_ms_analytic + vpu_ms_total), 2),
        "per_stage": per_stage,
        "top_tensors": [
            {"path": p[-60:], "shape": list(s),
             "MB": round(int(np.prod(s)) * BYTES / 1e6, 1)}
            for p, s in biggest],
    }, indent=1))


if __name__ == "__main__":
    main()
