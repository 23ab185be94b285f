#!/usr/bin/env python
"""Achieved TFLOP/s of single dense 3x3 convs (fwd+bwd) across shapes.

Tests the lane-utilization hypothesis for the stage-2 slowness seen in
conv_profile.py: EffNetV2-S stages 1-3 run at 48-96 channels where the
TPU's 128-lane registers are mostly padding, while stages 4-6 run at
128+ channels.  Each probe is one conv (+bias) fwd+bwd, scan-timed with
a value fetch (the only real sync through the axon relay).

Usage: python scripts/conv_shape_probe.py [name|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("BENCH_STEPS", 30))
BATCH = int(os.environ.get("BENCH_BATCH", 160))


def main():
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
    cache = os.path.expanduser(
        f"~/.cache/jax_cache_{jax.default_backend()}_{fp}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dt_ = jnp.bfloat16

    # name: (spatial, cin, cout, kernel, stride)
    PROBES = {
        # stage-2 expand shape (56x56, 48->192) and neighbors
        "s2_48_192": (56, 48, 192, 3, 1),
        "s2_48_192_s2": (112, 24, 96, 3, 2),   # stage-2 layer-1 (strided)
        "s2_proj_192_48": (56, 192, 48, 1, 1),  # narrow-N projection
        # stage-3 expand (28x28, 64->256)
        "s3_64_256": (28, 64, 256, 3, 1),
        # channel-rich control at matched FLOPs/value-count scales
        "ctl_28_192_768": (28, 192, 768, 3, 1),
        "ctl_14_384_1536": (14, 384, 1536, 3, 1),
        # lane-aligned variant of stage-2: same tensor volume, 128 lanes
        "ctl_56_128_128": (56, 128, 128, 3, 1),
        # stem (224->112, 3->24): tiny-Cin pathology
        "stem_3_24_s2": (224, 3, 24, 3, 2),
        # space-to-depth twins (exact rewrites):
        # stem dense lift: 3x3 s2 (112^2,12)->(56^2,96), 4x FLOPs of orig
        "stem_lift_12_96": (112, 12, 96, 3, 2),
        # stage-1 3x3 24->24 @112^2 vs its dense-lift twin 3x3 96->96 @56^2
        "s1_24_24": (112, 24, 24, 3, 1),
        "s1_lift_96_96": (56, 96, 96, 3, 1),
        # 4-phase s2d decomposition unit shapes (one of the 4 calls; whole
        # conv = 4x this + interleave).  Covers stage-2 expand (Cin_eff=192,
        # Cout=192) and stage-3 expand (256->256 @14^2).
        "p4_s2_192_192_k2": (28, 192, 192, 2, 1),
        "p4_s3_256_256_k2": (14, 256, 256, 2, 1),
        # stage-2 1x1 project dense lift: 768->192 @28^2 (4x FLOPs of orig)
        "s2_proj_lift_768_192": (28, 768, 192, 1, 1),
        # EffNetV2-S depthwise stages (MBConv middle convs, @224 input):
        # the per-pass split suspects.  6th tuple element = groups.
        "dw_s4_512": (14, 512, 512, 3, 1, 512),
        "dw_s5_960": (14, 960, 960, 3, 1, 960),
        "dw_s6_1536": (7, 1536, 1536, 3, 1, 1536),
        # TinyViT stage-1 MBConv depthwise (56^2 x 384 hidden) + the
        # per-block local dw convs (28^2 x 192, 14^2 x 384).
        "dw_tv_s1_384": (56, 384, 384, 3, 1, 384),
        "dw_tv_s2_192": (28, 192, 192, 3, 1, 192),
        "dw_tv_s3_384": (14, 384, 384, 3, 1, 384),
    }

    def timeit(name, spatial, cin, cout, k, stride, groups=1):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(BATCH, spatial, spatial, cin)), dt_)
        w = jnp.asarray(
            rng.normal(size=(k, k, cin // groups, cout)) * 0.05, dt_)

        def conv(w_, x_):
            pad = (k - 1) // 2
            return jax.lax.conv_general_dilated(
                x_, w_, (stride, stride), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)

        # BENCH_PASSES: fwd | wgrad (fwd+wgrad, default) | full
        # (fwd+dgrad+wgrad).  BENCH_FULLBWD=1 is the legacy alias for
        # full.  Successive diffs attribute the two backward convs.
        passes = os.environ.get(
            "BENCH_PASSES",
            "full" if os.environ.get("BENCH_FULLBWD") else "wgrad")
        full_bwd = passes == "full"

        def body(w_, key):
            if passes == "fwd":
                # forward only; chain w on the output so the scan can't
                # hoist the loop-invariant conv (see BENCH_NOTES meta-
                # lesson on hoisted fwd-only timings).
                y = conv(w_, x)
                l = jnp.mean(y.astype(jnp.float32) ** 2)
                return w_ - jnp.asarray(l * 1e-12, dt_), l
            if full_bwd:
                # differentiate wrt x too -> includes the dgrad conv
                def loss2(wi, xi):
                    y = conv(wi, xi)
                    return jnp.mean(y.astype(jnp.float32) ** 2)
                l, (gw, gx) = jax.value_and_grad(loss2, argnums=(0, 1))(w_, x)
                return (w_ - (1e-12 * gw).astype(dt_)
                        - jnp.asarray(jnp.mean(gx) * 1e-12, dt_)), l

            def loss(wi):
                y = conv(wi, x)
                return jnp.mean(y.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(w_)
            return w_ - (1e-12 * g).astype(dt_), l

        def many(w_, key):
            def scan_body(c, i):
                return body(c, jax.random.fold_in(key, i))
            w_, ls = jax.lax.scan(scan_body, w_, jnp.arange(STEPS))
            return ls[-1]

        f = jax.jit(many)
        t0 = time.time(); _ = float(f(w, jax.random.key(1)))
        compile_s = time.time() - t0
        t0 = time.time(); _ = float(f(w, jax.random.key(2)))
        dt = time.time() - t0
        ms = dt / STEPS * 1000
        out_sp = spatial // stride
        flops_fwd = 2 * k * k * (cin // groups) * cout * out_sp * out_sp * BATCH
        n_conv = {"fwd": 1, "wgrad": 2, "full": 3}[passes]
        tflops = n_conv * flops_fwd / (dt / STEPS) / 1e12
        print(json.dumps({
            "probe": name, "passes": passes, "ms": round(ms, 2),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / 197, 1),
            "compile_s": round(compile_s, 1)}), flush=True)

    for name, spec in PROBES.items():
        if which in (name, "all"):
            timeit(name, *spec)
    if which in ("im2col", "all"):
        im2col_probe()



def im2col_probe():
    """Explicit im2col+dot twin of s2_48_192 (3x3 48->192 @56^2)."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)
    B, S, CIN, COUT, K = BATCH, 56, 48, 192, 3
    x = jnp.asarray(rng.normal(size=(B, S, S, CIN)), dt_)
    w = jnp.asarray(rng.normal(size=(K * K * CIN, COUT)) * 0.05, dt_)

    def fwd(w_, x_):
        patches = jax.lax.conv_general_dilated_patches(
            x_, (K, K), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = patches.reshape(-1, K * K * CIN)
        return jnp.dot(m, w_, preferred_element_type=jnp.float32)

    def body(w_, key):
        def loss(wi):
            y = fwd(wi, x)
            return jnp.mean(y.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(w_)
        return w_ - (1e-12 * g).astype(dt_), l

    def many(w_, key):
        def scan_body(c, i):
            return body(c, jax.random.fold_in(key, i))
        w_, ls = jax.lax.scan(scan_body, w_, jnp.arange(STEPS))
        return ls[-1]

    f = jax.jit(many)
    t0 = _t.time(); _ = float(f(w, jax.random.key(1)))
    compile_s = _t.time() - t0
    t0 = _t.time(); _ = float(f(w, jax.random.key(2)))
    dt = _t.time() - t0
    ms = dt / STEPS * 1000
    flops_fwd = 2 * K * K * CIN * COUT * S * S * B
    print(json.dumps({
        "probe": "im2col_s2_48_192", "ms": round(ms, 2),
        "true_tflops_fwd_wgrad": round(2 * flops_fwd / (dt / STEPS) / 1e12, 1),
        "compile_s": round(compile_s, 1)}), flush=True)

if __name__ == "__main__":
    main()
