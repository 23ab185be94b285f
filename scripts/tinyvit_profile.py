#!/usr/bin/env python
"""Attribute the TinyViT-21m SSL-step outlier (612 imgs/s vs effinetv2's
2,148 at equal-ish FLOPs; BENCH_NOTES ladder).

Times scan-chains of stage-isolated blocks at the real 224px shapes,
fwd+bwd at the student batch (160), like block_profile.py.  Variants
isolate: the conv stem + stage-1 MBConvs, each attention stage, the
window attention alone vs its MLP, and the attention-bias gather.

Usage: python scripts/tinyvit_profile.py [name|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 160
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semiuhpe_tpu.models.tinyvit import (TinyViTBlock, TinyViTMBConv,
                                             WindowAttention)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dt_ = jnp.bfloat16

    class Chain(nn.Module):
        make: any
        reps: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            for _ in range(self.reps):
                x = self.make()(x, train)
            return x

    class AttnOnly(nn.Module):
        """WindowAttention at (B*nW, N, C) shapes, residual-chained."""
        dim: int
        heads: int
        n: int

        @nn.compact
        def __call__(self, x, train=True):
            r = int(self.n ** 0.5)
            return x + WindowAttention(self.dim, 32, self.heads, (r, r),
                                       dtype=dt_)(x)

    def blk(dim, res, heads, ws):
        return lambda: TinyViTBlock(dim, (res, res), heads, ws, 4.0, 0.0,
                                    dtype=dt_)

    # (spatial/tokens, channels, module, is_tokens)
    VARIANTS = {
        # stage1: 56x56x96 MBConv x2
        "s1_mbconv": (56, 96, Chain(
            lambda: TinyViTMBConv(96, 4.0, 0.0, dtype=dt_), 2), False),
        # stage2: 28x28x192, ws7, heads6, x2
        "s2_block": (28, 192, Chain(blk(192, 28, 6, 7), 2), False),
        # stage3: 14x14x384, ws14 (one 196-token window), heads12, x6
        "s3_block": (14, 384, Chain(blk(384, 14, 12, 14), 6), False),
        # stage4: 7x7x576, ws7, heads18, x2
        "s4_block": (7, 576, Chain(blk(576, 7, 18, 7), 2), False),
        # attention alone at stage-3 shapes: (160, 196, 384)
        "s3_attn": (196, 384, Chain(
            lambda: AttnOnly(384, 12, 196), 6), True),
        # attention alone at stage-2 window shapes: (160*16, 49, 192)
        "s2_attn": (49, 192, Chain(
            lambda: AttnOnly(192, 6, 49), 2), "s2win"),
    }

    def timeit(name, spatial, ch, mod, tokens):
        if tokens == "s2win":
            shape = (BATCH * 16, spatial, ch)
        elif tokens:
            shape = (BATCH, spatial, ch)
        else:
            shape = (BATCH, spatial, spatial, ch)
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=shape), dt_)
        v = jax.jit(lambda: mod.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1,) + shape[1:], dt_), train=True))()
        p0, s0 = v["params"], v.get("batch_stats", {})

        def body(carry, key):
            p, s = carry

            def loss_fn(p_):
                out, mut = mod.apply(
                    {"params": p_, "batch_stats": s}, x0, train=True,
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
        print(json.dumps({"variant": name,
                          "ms": round(dt / STEPS * 1000, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    for name, (spatial, ch, mod, tokens) in VARIANTS.items():
        if which in (name, "all"):
            timeit(name, spatial, ch, mod, tokens)


if __name__ == "__main__":
    main()
