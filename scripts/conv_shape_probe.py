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
    }

    def timeit(name, spatial, cin, cout, k, stride):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(BATCH, spatial, spatial, cin)), dt_)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, dt_)

        def conv(w_, x_):
            pad = (k - 1) // 2
            return jax.lax.conv_general_dilated(
                x_, w_, (stride, stride), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def body(w_, key):
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
        flops_fwd = 2 * k * k * cin * cout * out_sp * out_sp * BATCH
        tflops = 3 * flops_fwd / (dt / STEPS) / 1e12  # fwd+dgrad+wgrad
        print(json.dumps({
            "probe": name, "ms": round(ms, 2),
            "achieved_tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / 197, 1),
            "compile_s": round(compile_s, 1)}), flush=True)

    for name, spec in PROBES.items():
        if which in (name, "all"):
            timeit(name, *spec)


if __name__ == "__main__":
    main()
