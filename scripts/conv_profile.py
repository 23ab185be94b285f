#!/usr/bin/env python
"""Decompose the conv floor of the SSL step (EffNetV2-S recipe shapes).

tail_profile.py showed the step is ~94% conv floor (69.5 of 74 ms); this
script attributes that floor.  Scan-timed like bench.py (value-fetch sync
— the only real sync through the axon relay).  Variants:

  teacher128      train-mode fwd, b128            (teacher side)
  student_fwd     train-mode fwd b32 + b128       (student side, no grad)
  student_fwdbwd  value_and_grad of an L2 loss through both applies
  trunkN          fwd+bwd of stem+stages[:N]+pool+dense @ b160 (N=1..6);
                  successive diffs give per-stage fwd+bwd cost

Run on a QUIET TPU.  Usage:
  python scripts/conv_profile.py [teacher128|student_fwd|student_fwdbwd|
                                  trunk1..trunk6|trunks|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 32))
ULB_RATIO = int(os.environ.get("BENCH_ULB_RATIO", 4))
SIZE = int(os.environ.get("BENCH_SIZE", 224))
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    import hashlib
    try:
        flags_line = next(ln for ln in open("/proc/cpuinfo")
                          if ln.startswith("flags"))
        fp = hashlib.md5(flags_line.encode()).hexdigest()[:8]
    except (OSError, StopIteration):
        fp = "generic"
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}_{fp}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from semiuhpe_tpu.models import build_network
    from semiuhpe_tpu.models.efficientnetv2 import _CONFIGS
    from semiuhpe_tpu.models.layers import ConvBN, FusedMBConv, MBConv

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch, ulb_batch = BATCH, BATCH * ULB_RATIO
    dt_ = jnp.bfloat16

    # teacher128/student_fwd/student_fwdbwd honor BENCH_NET (round 5: the
    # effinet-B4 floor statement needs them at B4); trunkN stays
    # effinetv2-only (Trunk hard-codes the S config).
    net = build_network(os.environ.get("BENCH_NET", "effinetv2"), dtype=dt_)
    v = jax.jit(lambda: net.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, SIZE, SIZE, 3), dt_), train=False))()

    rng = np.random.default_rng(0)
    img_s = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE, 3)),
                        jnp.float32)
    img_u = jnp.asarray(rng.normal(size=(ulb_batch, SIZE, SIZE, 3)),
                        jnp.float32)
    img_b = jnp.asarray(rng.normal(size=(batch + ulb_batch, SIZE, SIZE, 3)),
                        jnp.float32)

    def fwd(params, stats, img, key):
        out, mut = net.apply({"params": params, "batch_stats": stats}, img,
                             train=True, rngs={"dropout": key},
                             mutable=["batch_stats"])
        return out, mut["batch_stats"]

    class Trunk(nn.Module):
        """stem + stages[:n] + pool + scalar head of EffNetV2-S."""
        n: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            cfg = _CONFIGS["s"]
            x = ConvBN(cfg["stem"], 3, 2, activation=nn.silu, dtype=dt_,
                       bn_eps=1e-3)(x, train)
            for kind, expand, kernel, stride, ch, layers, use_se in \
                    cfg["stages"][: self.n]:
                for j in range(layers):
                    s = stride if j == 0 else 1
                    if kind == "fused":
                        x = FusedMBConv(ch, expand, kernel, s, dtype=dt_,
                                        bn_eps=1e-3)(x, train)
                    else:
                        x = MBConv(ch, expand, kernel, s,
                                   se_ratio=0.25 if use_se else 0.0,
                                   dtype=dt_, bn_eps=1e-3)(x, train)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(1, dtype=jnp.float32)(x)

    # --- variant bodies: (params_stats_carry, key) -> carry', scalar -------
    def teacher128_body(carry, key):
        p, s = carry
        out, s = fwd(p, s, img_u, key)
        return (p, s), jnp.sum(out.astype(jnp.float32))

    def student_fwd_body(carry, key):
        p, s = carry
        o1, s = fwd(p, s, img_s, key)
        o2, s = fwd(p, s, img_u, key)
        return (p, s), (jnp.sum(o1.astype(jnp.float32))
                        + jnp.sum(o2.astype(jnp.float32)))

    def student_fwdbwd_body(carry, key):
        p, s = carry

        def loss_fn(p_):
            o1, s1 = fwd(p_, s, img_s, key)
            o2, s2 = fwd(p_, s1, img_u, key)
            return (jnp.mean(o1.astype(jnp.float32) ** 2)
                    + jnp.mean(o2.astype(jnp.float32) ** 2)), s2
        (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        # fold a grad into the params so the bwd pass can't be DCE'd
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
        return (p, s2), l

    def make_trunk_body(n):
        """BENCH_FWD_ONLY=1 times the train-mode forward alone; the
        trunkN fwd-vs-fwd+bwd diffs attribute the backward-pass cost."""
        tn = Trunk(n)
        tv = jax.jit(lambda: tn.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, SIZE, SIZE, 3), dt_), train=False))()
        fwd_only = bool(os.environ.get("BENCH_FWD_ONLY"))

        def body(carry, key):
            p, s = carry

            def loss_fn(p_):
                out, mut = tn.apply({"params": p_, "batch_stats": s}, img_b,
                                    train=True, mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2), \
                    mut["batch_stats"]
            if fwd_only:
                # Perturb the input per iteration: with no rng in the trunk
                # the apply is otherwise loop-invariant and XLA hoists the
                # entire forward out of the scan (measured 1.5 ms "trunk5
                # fwd" = 456 TF/s, i.e. fiction).
                eps = 1e-12 * jax.random.uniform(key, (), jnp.float32)

                def loss_fn_v(p_):
                    out, mut = tn.apply(
                        {"params": p_, "batch_stats": s},
                        img_b * (1.0 + eps).astype(dt_), train=True,
                        mutable=["batch_stats"])
                    return jnp.mean(out.astype(jnp.float32) ** 2), \
                        mut["batch_stats"]
                l, s2 = loss_fn_v(p)
                return (p, s2), l
            (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
            return (p, s2), l
        carry0 = (tv["params"], tv.get("batch_stats", {}))
        return body, carry0

    def timeit(name, body, carry0):
        def many(carry, key):
            def scan_body(c, i):
                c, l = body(c, jax.random.fold_in(key, i))
                return c, l
            carry, ls = jax.lax.scan(scan_body, carry, jnp.arange(STEPS))
            return ls[-1]
        f = jax.jit(many)
        if os.environ.get("BENCH_COST_ONLY"):
            # NB: XLA's cost_analysis counts a while/scan body ONCE (not
            # x trip count), so the program totals here are ~per-step
            # already (plus a negligible epilogue).
            ca = f.lower(carry0, jax.random.key(1)).compile().cost_analysis()
            print(json.dumps({
                "variant": name,
                "gflops_per_step": round(float(ca.get("flops", 0)) / 1e9, 2),
                "gb_accessed_per_step": round(
                    float(ca.get("bytes accessed", 0)) / 1e9, 3),
            }), flush=True)
            return
        t0 = time.time(); _ = float(f(carry0, jax.random.key(1)))
        compile_s = time.time() - t0
        t0 = time.time(); _ = float(f(carry0, jax.random.key(2)))
        dt = time.time() - t0
        print(json.dumps({"variant": name,
                          "step_ms": round(dt / STEPS * 1000, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    carry_full = (v["params"], v.get("batch_stats", {}))
    base = {"teacher128": teacher128_body, "student_fwd": student_fwd_body,
            "student_fwdbwd": student_fwdbwd_body}
    names = (list(base) + [f"trunk{n}" for n in range(1, 7)]
             if which == "all" else
             [f"trunk{n}" for n in range(1, 7)] if which == "trunks"
             else [which])
    for name in names:
        if name in base:
            timeit(name, base[name], carry_full)
        else:
            n = int(name[len("trunk"):])
            body, carry0 = make_trunk_body(n)
            timeit(name, body, carry0)


if __name__ == "__main__":
    main()
