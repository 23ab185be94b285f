#!/usr/bin/env python
"""Decompose the TinyViT stage-1 MBConv gap (55.2 ms measured vs 8.6 ms
floor, scripts/tinyvit_floor.py round-4 table): time the same 2-block
chain with the suspects removed one at a time.

Variants (all fwd+bwd, b160 @56x56x96, scan-timed, quiet chip):
  base        exact-erf GELU + train-mode BN      (the real block)
  gelu_tanh   tanh-approx GELU + train-mode BN    (erf cost)
  act_none    no activation + train-mode BN       (all activation cost)
  bn_eval     exact GELU + eval-mode BN           (batch-stats reduction cost)
  convs_only  bare expand/dw/proj convs           (the conv floor itself)

Usage: python scripts/s1_decompose.py [variant|all]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 160))
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semiuhpe_tpu.models.layers import ConvBN

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dt_ = jnp.bfloat16

    class Block(nn.Module):
        """TinyViTMBConv twin with pluggable activation / BN mode."""
        act: any
        bn: str  # train | eval | none

        @nn.compact
        def __call__(self, x, train: bool = True):
            tr = {"train": train, "eval": False}.get(self.bn)
            shortcut = x

            def cbn(feats, k, groups=1):
                if self.bn == "none":
                    return nn.Conv(feats, (k, k), padding="SAME",
                                   feature_group_count=groups, use_bias=False,
                                   dtype=dt_)
                return functools.partial(
                    ConvBN(feats, k, 1, groups=groups, activation=None,
                           dtype=dt_), train=tr)

            a = self.act or (lambda v: v)
            x = a(cbn(384, 1)(x))
            x = a(cbn(384, 3, groups=384)(x))
            x = cbn(96, 1)(x)
            return a(x + shortcut)

    gelu_exact = lambda v: nn.gelu(v, approximate=False)
    gelu_tanh = lambda v: nn.gelu(v, approximate=True)

    VARIANTS = {
        "base": Block(gelu_exact, "train"),
        "gelu_tanh": Block(gelu_tanh, "train"),
        "act_none": Block(None, "train"),
        "bn_eval": Block(gelu_exact, "eval"),
        "convs_only": Block(None, "none"),
    }

    class Chain(nn.Module):
        mod: any

        @nn.compact
        def __call__(self, x, train: bool = True):
            for _ in range(2):
                x = type(self.mod)(self.mod.act, self.mod.bn)(x, train)
            return x

    def timeit(name, mod):
        chain = Chain(mod)
        shape = (BATCH, 56, 56, 96)
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=shape), dt_)
        v = jax.jit(lambda: chain.init(
            {"params": jax.random.key(0)}, jnp.zeros((1,) + shape[1:], dt_),
            train=True))()
        p0, s0 = v["params"], v.get("batch_stats", {})

        def body(carry, key):
            p, st = carry

            def loss_fn(p_):
                out, mut = chain.apply(
                    {"params": p_, "batch_stats": st}, x0, train=True,
                    mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2), \
                    mut.get("batch_stats", {})

            (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
            return (p, s2), l

        def many(carry, key):
            def scan_body(c, i):
                c, l = body(c, i)
                return c, l

            carry, ls = jax.lax.scan(scan_body, carry, jnp.arange(STEPS))
            return ls[-1]

        f = jax.jit(many)
        t0 = time.time(); _ = float(f((p0, s0), jax.random.key(1)))
        compile_s = time.time() - t0
        t0 = time.time(); _ = float(f((p0, s0), jax.random.key(2)))
        dt = time.time() - t0
        print(json.dumps({"variant": name, "ms": round(dt / STEPS * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    for name, mod in VARIANTS.items():
        if which in (name, "all"):
            timeit(name, mod)


if __name__ == "__main__":
    main()
