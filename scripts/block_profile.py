#!/usr/bin/env python
"""Attribute time inside the slow EffNetV2-S stages (conv_profile.py found
stage2 ~20 ms and stages 4+5 ~23 ms of the 59 ms student fwd+bwd).

Times a chain of REPS identical blocks (output feeds next input, so no
CSE) inside a lax.scan, fwd+bwd, at the stage's real shapes.  Variants
isolate MBConv components by rebuilding the block with pieces disabled.

Run on a QUIET TPU.  Usage: python scripts/block_profile.py [name|all]
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

    from semiuhpe_tpu.models.layers import (ConvBN, FusedMBConv, MBConv,
                                            SqueezeExcite)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dt_ = jnp.bfloat16

    class Chain(nn.Module):
        """REPS copies of one block, chained."""
        make: any
        reps: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            for _ in range(self.reps):
                x = self.make()(x, train)
            return x

    class DWOnly(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x, train=True):
            return ConvBN(self.ch, 3, 1, groups=self.ch, activation=nn.silu,
                          dtype=dt_, bn_eps=1e-3)(x, train)

    class ExpandProject(nn.Module):
        """MBConv minus dw conv minus SE: 1x1 expand + 1x1 project + res."""
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = ConvBN(self.hidden, 1, 1, activation=nn.silu, dtype=dt_,
                       bn_eps=1e-3)(x, train)
            y = ConvBN(self.ch, 1, 1, activation=None, dtype=dt_,
                       bn_eps=1e-3)(y, train)
            return y + r

    class SEOnly(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x, train=True):
            return SqueezeExcite(self.ch // 4, dtype=dt_)(x)

    def mb(ch, hidden_ratio, se, drop):
        return lambda: MBConv(ch, hidden_ratio, 3, 1, se_ratio=se,
                              drop_rate=drop, dtype=dt_, bn_eps=1e-3)

    def fused(ch, ratio):
        return lambda: FusedMBConv(ch, ratio, 3, 1, dtype=dt_, bn_eps=1e-3)

    # name -> (spatial, channels, module)
    VARIANTS = {
        # stage5 shapes: 14x14, 160ch, hidden 960, 9 layers
        "s5_full":      (14, 160, Chain(mb(160, 6, 0.25, 0.1), 9)),
        "s5_nodrop":    (14, 160, Chain(mb(160, 6, 0.25, 0.0), 9)),
        "s5_nose":      (14, 160, Chain(mb(160, 6, 0.0, 0.0), 9)),
        "s5_expproj":   (14, 160, Chain(lambda: ExpandProject(160, 960), 9)),
        "s5_dwonly":    (14, 960, Chain(lambda: DWOnly(960), 9)),
        "s5_seonly":    (14, 960, Chain(lambda: SEOnly(960), 9)),
        # stage4 shapes: 14x14, 128ch, hidden 512, 6 layers
        "s4_full":      (14, 128, Chain(mb(128, 4, 0.25, 0.06), 6)),
        # stage2 shapes: 56x56, 48ch, 4 layers (s1 versions)
        "s2_full":      (56, 48, Chain(fused(48, 4), 4)),
    }

    def timeit(name, spatial, ch, mod):
        x0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(BATCH, spatial, spatial, ch)), jnp.float32)
        v = jax.jit(lambda: mod.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, spatial, spatial, ch), dt_), train=True))()
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

    for name, (spatial, ch, mod) in VARIANTS.items():
        if which in (name, "all"):
            timeit(name, spatial, ch, mod)


if __name__ == "__main__":
    main()
