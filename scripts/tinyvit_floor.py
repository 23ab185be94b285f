#!/usr/bin/env python
"""TinyViT-21m per-component floor table at ITS OWN shapes (VERDICT r3 #1).

For every component of the 224px TinyViT forward (stem, stage-1 MBConvs,
each PatchMerging, every attention stage, head) this measures the
isolated fwd+bwd twin at the student batch (160) with the round-3 D-major
attention layout active, and prints next to it two ANALYTIC floors:

* ``mxu_floor_ms``  — dense-matmul FLOPs (conv/attention/MLP, fwd+bwd =
  3x fwd) at the v5e bf16 MXU peak (197 TFLOP/s), plus depthwise-conv +
  elementwise FLOPs at the VPU rate (~3.9 TFLOP/s fp32 ALU — dw convs
  never touch the MXU).
* ``hbm_floor_ms``  — the flash-fusion traffic bound: a perfectly fused
  training kernel must still read the block input and write the block
  output in the forward (A_in + A_out), and read {input, output
  cotangent} / write {input cotangent} in the backward (A_in + 2A_out
  with recompute), at the v5e HBM bandwidth (819 GB/s).  BatchNorm adds
  one extra full read of its widest pre-normalization tensor per BN
  (global batch stats force a second pass over data that no longer fits
  VMEM); that term is listed separately as ``bn_extra_ms``.

``measured / max(floors)`` is the headroom ratio: ~1 means the XLA twin
is at the achievable floor for this architecture on this chip; >>1 means
a fused kernel could still win.  Shapes anchor:
/root/reference/src/tiny_vit.py:216-288 (MBConv/PatchMerging),
289-385 (window attention blocks).

Usage: python scripts/tinyvit_floor.py [name|all]   (quiet chip!)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 160))
STEPS = int(os.environ.get("BENCH_STEPS", 30))

MXU_BF16 = 197e12          # v5e peak bf16 FLOP/s
VPU = 3.9e12               # v5e VPU fp32 ALU FLOP/s (dw conv / elementwise)
HBM = 819e9                # v5e HBM bytes/s
BYTES = 2                  # bf16


def conv_flops(h, w, cin, cout, k=1, groups=1):
    """MACs*2 for one conv at output h x w."""
    return 2 * h * w * cin * cout * k * k // groups


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semiuhpe_tpu.models.layers import ConvBN, RegressionHead
    from semiuhpe_tpu.models.tinyvit import (PatchMerging, TinyViTBlock,
                                             TinyViTMBConv)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dt_ = jnp.bfloat16
    B = BATCH

    class Chain(nn.Module):
        make: any
        reps: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            for _ in range(self.reps):
                x = self.make()(x, train)
            return x

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            act = lambda v: nn.gelu(v, approximate=False)
            x = ConvBN(48, 3, 2, activation=act, dtype=dt_)(x, train)
            return ConvBN(96, 3, 2, activation=None, dtype=dt_)(x, train)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = jnp.mean(x, axis=(1, 2))
            x = nn.LayerNorm(dtype=dt_)(x)
            return RegressionHead((128, 64), 9, dropout=0.2, dtype=dt_)(x, train)

    def blk(dim, res, heads, ws):
        return lambda: TinyViTBlock(dim, (res, res), heads, ws, 4.0, 0.0,
                                    dtype=dt_)

    def act_bytes(*shapes):
        return sum(int(np.prod(s)) * BYTES for s in shapes)

    # Per-variant analytic model.  Each entry:
    #   in_shape    input tensor shape (B prefixed automatically)
    #   module
    #   mxu_flops   dense fwd FLOPs per image (x3 for fwd+bwd applied below)
    #   vpu_flops   dw-conv + elementwise fwd FLOPs per image (x3 below)
    #   out_shape
    #   bn_widest   widest per-BN pre-norm tensors (one extra read each)
    s = 56 * 56
    VARIANTS = {
        "stem": dict(
            in_shape=(224, 224, 3), out_shape=(56, 56, 96),
            module=Stem(),
            mxu=conv_flops(112, 112, 3, 48, 3) + conv_flops(56, 56, 48, 96, 3),
            vpu=2 * (112 * 112 * 48) + 56 * 56 * 96,  # GELU + BN applies
            bn=[(112, 112, 48), (56, 56, 96)]),
        "s1_mbconv": dict(  # 2 blocks @56x56x96, hidden 384
            in_shape=(56, 56, 96), out_shape=(56, 56, 96),
            module=Chain(lambda: TinyViTMBConv(96, 4.0, 0.0, dtype=dt_), 2),
            mxu=2 * (conv_flops(56, 56, 96, 384) + conv_flops(56, 56, 384, 96)),
            vpu=2 * (conv_flops(56, 56, 384, 384, 3, groups=384)
                     + 3 * s * 384 + 2 * s * 96),
            bn=[(56, 56, 384), (56, 56, 384), (56, 56, 96)] * 2),
        "pm1": dict(  # 96 -> 192, 56 -> 28
            in_shape=(56, 56, 96), out_shape=(28, 28, 192),
            module=PatchMerging(192, dtype=dt_),
            mxu=conv_flops(56, 56, 96, 192) + conv_flops(28, 28, 192, 192),
            vpu=(conv_flops(28, 28, 192, 192, 3, groups=192)
                 + 2 * 56 * 56 * 192 + 28 * 28 * 192),
            bn=[(56, 56, 192), (28, 28, 192), (28, 28, 192)]),
        "s2_block": dict(  # 2 blocks @28x28x192, ws7 h6
            in_shape=(28, 28, 192), out_shape=(28, 28, 192),
            module=Chain(blk(192, 28, 6, 7), 2),
            mxu=2 * (4 * 28 * 28 * 192 * 192        # qkv+proj (dim 192)
                     + 2 * 6 * 16 * 49 * 49 * 32    # QK^T + AV per window
                     + 2 * 28 * 28 * 192 * 768),    # MLP
            vpu=2 * (conv_flops(28, 28, 192, 192, 3, groups=192)
                     + 6 * 28 * 28 * 192),
            bn=[(28, 28, 192)] * 2),
        "pm2": dict(
            in_shape=(28, 28, 192), out_shape=(14, 14, 384),
            module=PatchMerging(384, dtype=dt_),
            mxu=conv_flops(28, 28, 192, 384) + conv_flops(14, 14, 384, 384),
            vpu=(conv_flops(14, 14, 384, 384, 3, groups=384)
                 + 2 * 28 * 28 * 384 + 14 * 14 * 384),
            bn=[(28, 28, 384), (14, 14, 384), (14, 14, 384)]),
        "s3_block": dict(  # 6 blocks @14x14x384, ws14 (one 196-token window)
            in_shape=(14, 14, 384), out_shape=(14, 14, 384),
            module=Chain(blk(384, 14, 12, 14), 6),
            mxu=6 * (4 * 14 * 14 * 384 * 384
                     + 2 * 12 * 196 * 196 * 32
                     + 2 * 14 * 14 * 384 * 1536),
            vpu=6 * (conv_flops(14, 14, 384, 384, 3, groups=384)
                     + 6 * 14 * 14 * 384),
            bn=[(14, 14, 384)] * 6),
        "pm3": dict(
            in_shape=(14, 14, 384), out_shape=(7, 7, 576),
            module=PatchMerging(576, dtype=dt_),
            mxu=conv_flops(14, 14, 384, 576) + conv_flops(7, 7, 576, 576),
            vpu=(conv_flops(7, 7, 576, 576, 3, groups=576)
                 + 2 * 14 * 14 * 576 + 7 * 7 * 576),
            bn=[(14, 14, 576), (7, 7, 576), (7, 7, 576)]),
        "s4_block": dict(  # 2 blocks @7x7x576, ws7 h18
            in_shape=(7, 7, 576), out_shape=(7, 7, 576),
            module=Chain(blk(576, 7, 18, 7), 2),
            mxu=2 * (4 * 7 * 7 * 576 * 576
                     + 2 * 18 * 49 * 49 * 32
                     + 2 * 7 * 7 * 576 * 2304),
            vpu=2 * (conv_flops(7, 7, 576, 576, 3, groups=576)
                     + 6 * 7 * 7 * 576),
            bn=[(7, 7, 576)] * 2),
        "head": dict(
            in_shape=(7, 7, 576), out_shape=(9,),
            module=Head(),
            mxu=576 * 128 * 2 + 128 * 64 * 2 + 64 * 9 * 2,
            vpu=7 * 7 * 576,
            bn=[]),
    }

    def floors(v):
        mxu_ms = 3 * B * v["mxu"] / MXU_BF16 * 1e3
        vpu_ms = 3 * B * v["vpu"] / VPU * 1e3
        a_in = act_bytes(v["in_shape"]) * B
        a_out = act_bytes(v["out_shape"]) * B
        # fwd: read in + write out; bwd (recompute): read in + read dout +
        # write din.
        hbm_ms = (2 * a_in + a_out + (a_out + a_in)) / HBM * 1e3
        bn_ms = sum(act_bytes(t) for t in v["bn"]) * B / HBM * 1e3
        return mxu_ms, vpu_ms, hbm_ms, bn_ms

    def timeit(name, v):
        shape = (B,) + tuple(v["in_shape"])
        mod = v["module"]
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=shape), dt_)
        vr = jax.jit(lambda: mod.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1,) + shape[1:], dt_), train=True))()
        p0, s0 = vr["params"], vr.get("batch_stats", {})

        def body(carry, key):
            p, st = carry

            def loss_fn(p_):
                out, mut = mod.apply(
                    {"params": p_, "batch_stats": st}, x0, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2), \
                    mut.get("batch_stats", {})

            (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
            return (p, s2), l

        def many(carry, key):
            def scan_body(c, i):
                c, l = body(c, jax.random.fold_in(key, i))
                return c, l

            carry, ls = jax.lax.scan(scan_body, carry, jnp.arange(STEPS))
            return ls[-1]

        f = jax.jit(many)
        t0 = time.time(); _ = float(f((p0, s0), jax.random.key(1)))
        compile_s = time.time() - t0
        t0 = time.time(); _ = float(f((p0, s0), jax.random.key(2)))
        dt = time.time() - t0
        ms = dt / STEPS * 1000
        mxu_ms, vpu_ms, hbm_ms, bn_ms = floors(v)
        floor = max(mxu_ms + vpu_ms, hbm_ms + bn_ms)
        print(json.dumps({
            "variant": name, "ms": round(ms, 2),
            "mxu_floor_ms": round(mxu_ms, 2), "vpu_floor_ms": round(vpu_ms, 2),
            "hbm_floor_ms": round(hbm_ms, 2), "bn_extra_ms": round(bn_ms, 2),
            "floor_ms": round(floor, 2),
            "headroom_x": round(ms / floor, 2) if floor > 0 else None,
            "compile_s": round(compile_s, 1)}), flush=True)

    for name, v in VARIANTS.items():
        if which in (name, "all"):
            timeit(name, v)


if __name__ == "__main__":
    main()
