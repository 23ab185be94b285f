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

    class ConvSilu(nn.Module):
        """Conv + bias + silu — the no-BN twin of ConvBN (isolates the cost
        of train-mode BN's unfusable stat reduction + extra HBM passes)."""
        ch: int
        k: int = 1

        @nn.compact
        def __call__(self, x, train=True):
            pad = (self.k - 1) // 2
            x = nn.Conv(self.ch, (self.k, self.k), padding=[(pad, pad)] * 2,
                        use_bias=True, dtype=dt_)(x)
            return nn.silu(x)

    class ExpandProjectNoBN(nn.Module):
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = ConvSilu(self.hidden)(x)
            y = nn.Conv(self.ch, (1, 1), use_bias=True, dtype=dt_)(y)
            return y + r

    class FusedNoBN(nn.Module):
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = ConvSilu(self.hidden, 3)(x)
            y = nn.Conv(self.ch, (1, 1), use_bias=True, dtype=dt_)(y)
            return y + r

    class DenseBN(nn.Module):
        """1x1 ConvBN expressed as Dense (dot, not conv custom-call)."""
        ch: int
        act: bool = True

        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Dense(self.ch, use_bias=False, dtype=dt_)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=dt_,
                             axis=-1, axis_name=None,
                             use_fast_variance=True)(x)
            return nn.silu(x) if self.act else x

    class ExpandProjectDense(nn.Module):
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = DenseBN(self.hidden)(x, train)
            y = DenseBN(self.ch, act=False)(y, train)
            return y + r

    class FoldedDenseBN(nn.Module):
        """1x1 conv + train-mode BN with input-side statistics.

        mean(y) = mean(x) @ W and E[y^2]_c = w_c^T (X^T X / M) w_c, so the
        BN apply folds into the weights (W*(g/sigma), beta - mu*g/sigma) and
        the wide hidden tensor is written exactly once (matmul+bias+act),
        with no stats or normalize passes over it.
        """
        ch: int
        act: bool = True

        @nn.compact
        def __call__(self, x, train=True):
            cin = x.shape[-1]
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (cin, self.ch), jnp.float32)
            gamma = self.param("scale", nn.initializers.ones, (self.ch,),
                               jnp.float32)
            beta = self.param("bias", nn.initializers.zeros, (self.ch,),
                              jnp.float32)
            xf = x.reshape(-1, cin)
            m = xf.shape[0]
            xb = xf.astype(dt_)
            mean_x = jnp.mean(xb, axis=0, dtype=jnp.float32)
            gram = jax.lax.dot_general(
                xb, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / m
            mu = mean_x @ w
            gw = jnp.dot(gram, w, preferred_element_type=jnp.float32)
            e2 = jnp.sum(w * gw, axis=0)
            var = e2 - mu * mu
            inv = gamma * jax.lax.rsqrt(var + 1e-3)
            w_hat = (w * inv[None, :]).astype(dt_)
            b_hat = (beta - mu * inv).astype(dt_)
            y = jnp.dot(xb, w_hat, preferred_element_type=dt_) + b_hat
            y = y.reshape(x.shape[:-1] + (self.ch,))
            return nn.silu(y) if self.act else y

    class ExpandProjectFolded(nn.Module):
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = FoldedDenseBN(self.hidden)(x, train)
            y = FoldedDenseBN(self.ch, act=False)(y, train)
            return y + r

    class ExpandProjectFoldExp(nn.Module):
        """Fold only the expand (cin<=cout); project keeps standard BN
        (its gram would cost 6x the project matmul; stats passes there are
        over the small 160-ch tensor anyway)."""
        ch: int
        hidden: int

        @nn.compact
        def __call__(self, x, train=True):
            r = x
            y = FoldedDenseBN(self.hidden)(x, train)
            y = DenseBN(self.ch, act=False)(y, train)
            return y + r

    class MBConvPallas(nn.Module):
        """MBConv with the middle (BN+silu+dw3x3+BN+silu+SE) as Pallas
        kernels (ops/pallas_mbconv.py); matmuls and project BN in XLA.
        Params are profile-local (not tree-compatible with MBConv)."""
        ch: int
        hidden: int
        cse: int

        @nn.compact
        def __call__(self, x, train=True):
            from semiuhpe_tpu.ops import pallas_mbconv as pm
            r = x
            h_raw = nn.Conv(self.hidden, (1, 1), use_bias=False,
                            dtype=dt_)(x)
            dw_w = self.param("dw", nn.initializers.lecun_normal(),
                              (3, 3, 1, self.hidden), jnp.float32)

            def bn_vars(name):
                scale = self.param(f"{name}_scale", nn.initializers.ones,
                                   (self.hidden,), jnp.float32)
                bias = self.param(f"{name}_bias", nn.initializers.zeros,
                                  (self.hidden,), jnp.float32)
                mean = self.variable("batch_stats", f"{name}_mean",
                                     lambda: jnp.zeros(self.hidden,
                                                       jnp.float32))
                var = self.variable("batch_stats", f"{name}_var",
                                    lambda: jnp.ones(self.hidden,
                                                     jnp.float32))
                return scale, bias, mean, var

            s1, b1, m1, v1 = bn_vars("bn1")
            s2, b2, m2, v2 = bn_vars("bn2")
            w1 = self.param("se_w1", nn.initializers.lecun_normal(),
                            (self.hidden, self.cse), jnp.float32)
            c1 = self.param("se_c1", nn.initializers.zeros, (self.cse,),
                            jnp.float32)
            w2 = self.param("se_w2", nn.initializers.lecun_normal(),
                            (self.cse, self.hidden), jnp.float32)
            c2 = self.param("se_c2", nn.initializers.zeros, (self.hidden,),
                            jnp.float32)
            s, new1, new2 = pm.mbconv_middle(
                h_raw, dw_w.astype(dt_),
                dict(scale=s1, bias=b1, mean=m1.value, var=v1.value),
                dict(scale=s2, bias=b2, mean=m2.value, var=v2.value),
                (w1.astype(dt_), c1, w2.astype(dt_), c2),
                train=train, eps=1e-3, momentum=0.9)
            if train and not self.is_initializing():
                m1.value, v1.value = new1
                m2.value, v2.value = new2
            y = ConvBN(self.ch, 1, 1, activation=None, dtype=dt_,
                       bn_eps=1e-3)(s, train)
            return y + r

    def mb(ch, hidden_ratio, se, drop, act=nn.silu):
        return lambda: MBConv(ch, hidden_ratio, 3, 1, se_ratio=se,
                              drop_rate=drop, activation=act, dtype=dt_,
                              bn_eps=1e-3)

    def fused(ch, ratio, act=nn.silu):
        return lambda: FusedMBConv(ch, ratio, 3, 1, activation=act,
                                   dtype=dt_, bn_eps=1e-3)

    ident = lambda x: x

    def silu_tanh(x):
        """Exact silu via tanh: x*sigmoid(x) == x*0.5*(1+tanh(x/2)) —
        an identity, not an approximation.  Probes whether XLA's logistic
        lowering is slower than its tanh path on the VPU (the erf-vs-tanh
        GELU lesson, round 4)."""
        return x * (0.5 * jnp.tanh(x * 0.5) + 0.5)

    # name -> (spatial, channels, module)
    VARIANTS = {
        # stage5 shapes: 14x14, 160ch, hidden 960, 9 layers
        "s5_full":      (14, 160, Chain(mb(160, 6, 0.25, 0.1), 9)),
        "s5_nodrop":    (14, 160, Chain(mb(160, 6, 0.25, 0.0), 9)),
        "s5_nose":      (14, 160, Chain(mb(160, 6, 0.0, 0.0), 9)),
        "s5_expproj":   (14, 160, Chain(lambda: ExpandProject(160, 960), 9)),
        "s5_dwonly":    (14, 960, Chain(lambda: DWOnly(960), 9)),
        "s5_seonly":    (14, 960, Chain(lambda: SEOnly(960), 9)),
        "s5_pallas":    (14, 160, Chain(
            lambda: MBConvPallas(160, 960, 40), 9)),
        # stage4 shapes: 14x14, 128ch, hidden 512, 6 layers
        "s4_full":      (14, 128, Chain(mb(128, 4, 0.25, 0.06), 6)),
        "s4_pallas":    (14, 128, Chain(
            lambda: MBConvPallas(128, 512, 32), 6)),
        # stage2 shapes: 56x56, 48ch, 4 layers (s1 versions)
        "s2_full":      (56, 48, Chain(fused(48, 4), 4)),
        # --- round-5 s2/s5 residual attribution (VERDICT r4 #4): ablate
        # one mechanism at a time against the roofline strategy estimate.
        # silu cost on the 192 MB expanded tensors (the s1_decompose
        # pattern that caught TinyViT's exact-erf GELU):
        "s2_noact":     (56, 48, Chain(fused(48, 4, act=ident), 4)),
        # channel-alignment twin: 64ch in/out (sublane-clean) at the same
        # 192-hidden expanded tensor; +33% logical conv FLOPs, so equal
        # or lower time means 48-ch padding waste dominates the residual:
        "s2_ch64":      (56, 64, Chain(fused(64, 3), 4)),
        # halo twin: same conv FLOPs and channels-per-pixel budget moved
        # from 56px/48ch to 28px/96ch (4x fewer pixels, 2x channels both
        # sides): isolates spatial-tiling/halo overhead from lane waste:
        "s2_28px":      (28, 96, Chain(fused(96, 4), 4)),
        "s5_noact":     (14, 160, Chain(mb(160, 6, 0.25, 0.0, act=ident), 9)),
        # exact tanh-form silu (see silu_tanh): if this matches s5_noact,
        # the 3.8 ms s5 silu cost is the logistic lowering, recoverable
        # with zero numeric change:
        "s5_silutanh":  (14, 160, Chain(mb(160, 6, 0.25, 0.0,
                                           act=silu_tanh), 9)),
        # no-BN twins: delta vs the BN versions = train-mode BN cost
        "s5_expproj_nobn": (14, 160, Chain(lambda: ExpandProjectNoBN(160, 960), 9)),
        "s2_nobn":      (56, 48, Chain(lambda: FusedNoBN(48, 192), 4)),
        # dot-instead-of-conv twin: can XLA fuse BN into a dot fusion?
        "s5_expproj_dense": (14, 160, Chain(lambda: ExpandProjectDense(160, 960), 9)),
        # input-side-stats BN fold (see FoldedDenseBN docstring)
        "s5_expproj_fold2": (14, 160, Chain(lambda: ExpandProjectFolded(160, 960), 9)),
        "s5_expproj_foldexp": (14, 160, Chain(lambda: ExpandProjectFoldExp(160, 960), 9)),
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
        if os.environ.get("BENCH_COST_ONLY"):
            ca = f.lower((p0, s0), jax.random.key(1)).compile().cost_analysis()
            pick = {k: float(v) for k, v in ca.items()
                    if k in ("flops", "bytes accessed", "transcendentals")
                    or k.startswith("bytes accessed")}
            out = {"variant": name,
                   "gflops_per_step": round(pick.get("flops", 0) / STEPS / 1e9, 2),
                   "mb_accessed_per_step": round(
                       pick.get("bytes accessed", 0) / STEPS / 1e6, 1)}
            print(json.dumps(out), flush=True)
            return
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
