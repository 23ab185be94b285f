#!/usr/bin/env python
"""Isolated A/B probe for the Pallas window-attention kernel.

Motivation (VERDICT r2 weak #1): TinyViT is at 733.9 imgs/s (1.5x the
A100 estimate) and the attention stages still measure ~3-4x above their
roofline (s3: 28.8 ms for 6 blocks incl. projections; the attention
primitive alone bounds at ~0.7 ms MXU / ~1.2 ms HBM per block).  The
hypotheses, each mapped to a variant here:

  H1 grid-step overhead dominates (s2 bwd runs ~480 grid steps with
     ~2 us of matmul each) -> vary the VMEM budget (chunk G) and fit
     ms vs n_steps: the slope is the per-step fixed cost.
  H2 Mosaic serializes the pipeline because grid dims default to
     `arbitrary` -> SEMIUHPE_ATTN_PAR=1 marks them parallel.
  H3 DMA short-row inefficiency: (N, 32)-bf16 blocks are 64-byte rows;
     compare against an (N, 128)-padded-D twin (dense rows, 4x bytes).

Times the attention primitive alone (q,k,v,bias -> out), fwd and
fwd+bwd, scan-chained with a value fetch (the only real sync through
the axon relay — see CLAUDE.md).  Shapes are the TinyViT-21m SSL-step
stages at student batch 160 (reference anchor:
/root/reference/src/tiny_vit.py:216-288).

Usage: python scripts/attn_probe.py [s2|s3|s4|all] [variant...]
Variants: xla pallas pallas_par pallas_b4 pallas_b8 pallas_b15 pad128
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("BENCH_STEPS", 30))

# (H, B, N, D) at student batch 160; s2 windows: 160 imgs x 16 windows.
STAGES = {
    "s2": (6, 2560, 49, 32),
    "s3": (12, 160, 196, 32),
    "s4": (18, 160, 49, 32),
}

# v5e single-chip peaks for the roofline lines.
PEAK_BF16_TF = 197.0
PEAK_HBM_GBS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semiuhpe_tpu.ops import pallas_window_attention as pwa

    args = [a for a in sys.argv[1:] if a != "all"]
    stages = [a for a in args if a in STAGES] or list(STAGES)
    variants = [a for a in args if a not in STAGES] or [
        "xla", "pallas", "pallas_par", "pallas_b4", "pallas_b8",
        "pallas_b15", "pad128"]

    def xla_attn(q, k, v, bias, scale):
        # The einsum twin of models/tinyvit.py's non-Pallas path, already
        # in the kernel's (H, B, N, D) layout.
        s = jnp.einsum("hbnd,hbmd->hbnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias[:, None]
        p = jnp.asarray(jax.nn.softmax(s, axis=-1), q.dtype)
        return jnp.einsum("hbnm,hbmd->hbnd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def run(stage, variant):
        h, b, n, d = STAGES[stage]
        env = {}
        fn_d = d
        if variant == "xla":
            fn = xla_attn
        elif variant == "pad128":
            fn = lambda q, k, v, bias, s: pwa.window_attention(
                q, k, v, bias, s)
            fn_d = 128  # dense 256-byte rows; 4x logical IO bytes
        else:
            fn = lambda q, k, v, bias, s: pwa.window_attention(
                q, k, v, bias, s)
            if variant == "pallas_par":
                env["SEMIUHPE_ATTN_PAR"] = "1"
            elif variant.startswith("pallas_b"):
                env["SEMIUHPE_ATTN_VMEM_MB"] = variant[len("pallas_b"):]

        old = {k: os.environ.get(k) for k in
               ("SEMIUHPE_ATTN_PAR", "SEMIUHPE_ATTN_VMEM_MB",
                "SEMIUHPE_ATTN_VMEM_LIMIT_MB")}
        for k in old:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            compile_only = os.environ.get("BENCH_COMPILE_ONLY") == "1"
            if compile_only:
                # ShapeDtypeStructs: no H2D through the 35 MB/s tunnel.
                q = jax.ShapeDtypeStruct((h, b, n, fn_d), jnp.bfloat16)
                kk, v = q, q
                bias = jax.ShapeDtypeStruct((h, n, n), jnp.float32)
            else:
                rng = np.random.default_rng(0)
                q = jnp.asarray(rng.normal(size=(h, b, n, fn_d)),
                                jnp.bfloat16)
                kk = jnp.asarray(rng.normal(size=(h, b, n, fn_d)),
                                 jnp.bfloat16)
                v = jnp.asarray(rng.normal(size=(h, b, n, fn_d)),
                                jnp.bfloat16)
                bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
            scale = d ** -0.5

            def fwd_chain(q0, kk, v, bias):
                def body(c, _):
                    o = fn(c, kk, v, bias, scale)
                    return o, ()
                o, _ = jax.lax.scan(body, q0, None, length=STEPS)
                return jnp.sum(o.astype(jnp.float32))

            def bwd_chain(q0, kk, v, bias):
                def body(c, _):
                    def loss(qq, kq, vq, bq):
                        return jnp.sum(
                            fn(qq, kq, vq, bq, scale).astype(jnp.float32))
                    g = jax.grad(loss, argnums=(0, 1, 2, 3))(c, kk, v, bias)
                    return c + 1e-6 * g[0], jnp.sum(g[3])
                o, ls = jax.lax.scan(body, q0, None, length=STEPS)
                return jnp.sum(o.astype(jnp.float32)) + ls[-1]

            # grid geometry for the report
            if variant == "xla":
                gf = gb = steps_f = steps_b = None
            else:
                gf = pwa._pick_chunk(b, n, fn_d, n_io=4, n_tmp=2, itemsize=2)
                gb = pwa._pick_chunk(b, n, fn_d, n_io=7, n_tmp=4, itemsize=2)
                steps_f, steps_b = h * b // gf, h * b // gb

            out = {"stage": stage, "variant": variant,
                   "G_fwd": gf, "G_bwd": gb,
                   "grid_fwd": steps_f, "grid_bwd": steps_b}
            for name, chain in (("fwd", fwd_chain), ("fwd_bwd", bwd_chain)):
                f = jax.jit(chain)
                if compile_only:
                    # Warm the persistent compile cache through the remote
                    # compiler WITHOUT touching the (possibly busy) TPU.
                    t0 = time.time()
                    f.lower(q, kk, v, bias).compile()
                    out[f"{name}_compile_s"] = round(time.time() - t0, 1)
                    continue
                t0 = time.time(); _ = float(f(q, kk, v, bias))
                comp = time.time() - t0
                t0 = time.time(); _ = float(f(q, kk, v, bias))
                dt = time.time() - t0
                out[f"{name}_ms"] = round(dt / STEPS * 1000, 3)
                out[f"{name}_compile_s"] = round(comp, 1)

            # rooflines (logical, per call)
            mm_gf = 2 * 2 * h * b * n * n * d / 1e9  # qk + av
            io_gb = (4 * h * b * n * d * 2 + h * n * n * 4) / 1e9
            out["roofline_mxu_ms_at25pct"] = round(
                mm_gf / (PEAK_BF16_TF * 0.25), 3)
            out["roofline_hbm_ms"] = round(io_gb / PEAK_HBM_GBS * 1e3, 3)
            print(json.dumps(out), flush=True)
        finally:
            for k, val in old.items():
                if val is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = val

    for st in stages:
        for va in variants:
            try:
                run(st, va)
            except Exception as e:  # keep the sweep going past one failure
                print(json.dumps({"stage": st, "variant": va,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
