#!/usr/bin/env python
"""Does a small trailing (channel) dim pay an HBM layout/padding tax?

Times a pure elementwise pass (y = x * 1.0001 + 0.1, chained in a scan)
over NHWC tensors with C in {24, 48, 128} and a flat 1-D control with the
same element count.  If XLA's TPU tiled layout pads the minor dim to the
128-lane boundary in HBM, the C=24 variant moves ~5.3x the bytes and the
achieved GB/s (computed from LOGICAL bytes) collapses vs the flat control.
That result decides whether a space-to-depth rewrite of the EffNetV2-S
stem/stage1/stage2 (C=24/48) is worth building.

Scan-timed with a value fetch (the only real sync through the axon relay).
Usage: python scripts/layout_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("BENCH_STEPS", 50))
BATCH = int(os.environ.get("BENCH_BATCH", 160))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)

    # Equal element counts: 112*112*24 = 301056 per batch row.
    n_elem = BATCH * 112 * 112 * 24
    shapes = {
        "nhwc_c24": (BATCH, 112, 112, 24),
        "nhwc_c48": (BATCH, 112 // 2, 112, 48),
        "nhwc_c128": (BATCH, 112, 21, 128),  # 112*21*128 = 301056? -> 301056
        "flat": (n_elem,),
    }
    # fix c128: 112*21*128 = 301056 ✓ (21*128 = 2688; 112*2688 = 301056)

    for name, shape in shapes.items():
        assert int(np.prod(shape)) == n_elem, (name, shape)
        x = jnp.asarray(rng.normal(size=shape), dt_)

        def many(x_):
            def body(c, i):
                return c * jnp.asarray(1.0001, dt_) + jnp.asarray(0.1, dt_), ()
            c, _ = jax.lax.scan(body, x_, jnp.arange(STEPS))
            return jnp.sum(c.astype(jnp.float32))

        f = jax.jit(many)
        t0 = time.time(); _ = float(f(x)); compile_s = time.time() - t0
        t0 = time.time(); _ = float(f(x)); dt = time.time() - t0
        ms = dt / STEPS * 1000
        logical_gb = 2 * n_elem * 2 / 1e9  # read + write, bf16
        print(json.dumps({
            "probe": name, "ms_per_pass": round(ms, 3),
            "logical_gbps": round(logical_gb / (dt / STEPS), 1),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
