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

Round-3 resolution (BENCH_NOTES): H1 refuted (~0.4 us/step), H2 no
effect, H3 refuted in its DMA-row form BUT pad128's "identical time at
4x logical bytes" showed cost tracks PADDED shapes; the (H, B, D, N)
D-major layout (D on sublanes, 1.3-2.6x lane padding instead of 4x)
won s2 -34% / s3 -23% / s4 -11% and is now the production kernel.  The
old layout stays measurable as variant `nmajor`.

Times the attention primitive alone (q,k,v,bias -> out), fwd and
fwd+bwd, scan-chained with a value fetch (the only real sync through
the axon relay — see CLAUDE.md).  Shapes are the TinyViT-21m SSL-step
stages at student batch 160 (reference anchor:
/root/reference/src/tiny_vit.py:216-288).

Usage: python scripts/attn_probe.py [s2|s3|s4|all] [variant...]
Variants: xla nmajor pallas pallas_par pallas_b4 pallas_b8 pallas_b15 pad128
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


def _build_nmajor(pwa, jax, jnp):
    """N-major twin kernel: the ORIGINAL (H, B, N, D) layout the
    production kernel used before the round-3 D-major switch.  Kept as
    a measurable variant because the layout trade is hardware-tile
    specific: with D=32 on lanes every slab pads 4x (Mosaic bf16 tile
    (16, 128)), which the pad128 probe exposed (identical wall time at
    4x the logical bytes).  The D-major production kernel
    (ops/pallas_window_attention.py) puts D on sublanes instead; the
    measured win was s2 -34% / s3 -23% / s4 -11% fwd+bwd.  Math is
    identical; only dot_general dimension numbers move.
    """
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _round_up = pwa._round_up

    def pick(b, n, d, n_io, n_tmp, itemsize=2, budget=13 * 2 ** 20):
        io_sub = 16 if itemsize == 2 else 8
        io = _round_up(n, io_sub) * _round_up(d, 128) * itemsize
        tmp = _round_up(n, 8) * _round_up(n, 128) * 4
        per_g = 2 * n_io * io + n_tmp * tmp
        best = 1
        for g in range(1, b + 1):
            if b % g:
                continue
            if g * per_g <= budget:
                best = g
            else:
                break
        return best

    def fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
        q = q_ref[0]  # (G, N, D)
        k = k_ref[0]
        v = v_ref[0]
        bias = bias_ref[0]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (G, N, N)
        s = s * scale + bias[None]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        bias = bias_ref[0]
        do = do_ref[0]  # (G, N, D)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s * scale + bias[None]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p32 = e / jnp.sum(e, axis=-1, keepdims=True)
        p = p32.astype(q.dtype)
        dv = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))

        @pl.when(pl.program_id(1) == 0)
        def _init():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        dbias_ref[0] += jnp.sum(ds, axis=0)

        dsx = (ds * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            dsx, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dsx, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    def specs(h, b, g, n, d):
        qkv = pl.BlockSpec((1, g, n, d), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        bias = pl.BlockSpec((1, n, n), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return qkv, bias

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
    def attn(q, k, v, bias, scale):
        return fwd(q, k, v, bias, scale)

    def fwd(q, k, v, bias, scale):
        h, b, n, d = q.shape
        g = pick(b, n, d, n_io=4, n_tmp=2)
        qkv_spec, bias_spec = specs(h, b, g, n, d)
        return pl.pallas_call(
            functools.partial(fwd_kernel, scale=scale),
            grid=(h, b // g),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((h, b, n, d), q.dtype),
        )(q, k, v, bias)

    def fwd_rule(q, k, v, bias, scale):
        return fwd(q, k, v, bias, scale), (q, k, v, bias)

    def bwd_rule(scale, res, do):
        q, k, v, bias = res
        h, b, n, d = q.shape
        g = pick(b, n, d, n_io=7, n_tmp=4)
        qkv_spec, bias_spec = specs(h, b, g, n, d)
        return pl.pallas_call(
            functools.partial(bwd_kernel, scale=scale),
            grid=(h, b // g),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
            out_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
            out_shape=(
                jax.ShapeDtypeStruct((h, b, n, d), q.dtype),
                jax.ShapeDtypeStruct((h, b, n, d), k.dtype),
                jax.ShapeDtypeStruct((h, b, n, d), v.dtype),
                jax.ShapeDtypeStruct((h, n, n), jnp.float32),
            ),
        )(q, k, v, bias, do)

    attn.defvjp(fwd_rule, bwd_rule)
    return attn, pick


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
        nmajor_pick = None
        # xla + nmajor take (H, B, N, D); the production kernel (all
        # pallas* variants incl. pad128) is D-major (H, B, D, N).
        if variant == "xla":
            fn = xla_attn
        elif variant == "nmajor":
            fn, nmajor_pick = _build_nmajor(pwa, jax, jnp)
        elif variant == "pad128":
            fn = lambda q, k, v, bias, s: pwa.window_attention(
                q, k, v, bias, s)
            fn_d = 128  # D-major: pads D sublanes 4x; 4x logical bytes
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
            qshape = ((h, b, n, fn_d) if variant in ("xla", "nmajor")
                      else (h, b, fn_d, n))
            compile_only = os.environ.get("BENCH_COMPILE_ONLY") == "1"
            if compile_only:
                # ShapeDtypeStructs: no H2D through the 35 MB/s tunnel.
                q = jax.ShapeDtypeStruct(qshape, jnp.bfloat16)
                kk, v = q, q
                bias = jax.ShapeDtypeStruct((h, n, n), jnp.float32)
            else:
                rng = np.random.default_rng(0)
                q = jnp.asarray(rng.normal(size=qshape), jnp.bfloat16)
                kk = jnp.asarray(rng.normal(size=qshape), jnp.bfloat16)
                v = jnp.asarray(rng.normal(size=qshape), jnp.bfloat16)
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

            if variant == "pallas" and not compile_only and \
                    os.environ.get("BENCH_CHECK") == "1":
                # One-off parity check of the production D-major kernel
                # vs the einsum twin (transposed layout): values + input
                # gradients of the same scalar.
                def loss_d(qq, kq, vq, bq):
                    return jnp.sum(fn(qq, kq, vq, bq, scale)
                                   .astype(jnp.float32))
                def loss_x(qq, kq, vq, bq):
                    return jnp.sum(
                        xla_attn(jnp.swapaxes(qq, -1, -2),
                                 jnp.swapaxes(kq, -1, -2),
                                 jnp.swapaxes(vq, -1, -2), bq, scale)
                        .astype(jnp.float32))
                vd, gd = jax.jit(jax.value_and_grad(
                    loss_d, argnums=(0, 1, 2, 3)))(q, kk, v, bias)
                vx, gx = jax.jit(jax.value_and_grad(
                    loss_x, argnums=(0, 1, 2, 3)))(q, kk, v, bias)
                rel = lambda a, bb: float(
                    jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - bb.astype(jnp.float32)))
                    / (1e-6 + jnp.max(jnp.abs(bb.astype(jnp.float32)))))
                print(json.dumps({
                    "stage": stage, "variant": "pallas_check",
                    "val_rel": rel(jnp.asarray(vd), jnp.asarray(vx)),
                    "grad_rel_max": max(rel(a, bb)
                                        for a, bb in zip(gd, gx)),
                }), flush=True)

            # grid geometry for the report
            if variant == "xla":
                gf = gb = steps_f = steps_b = None
            else:
                pick = nmajor_pick or pwa._pick_chunk
                gf = pick(b, n, fn_d, n_io=4, n_tmp=2, itemsize=2)
                gb = pick(b, n, fn_d, n_io=7, n_tmp=4, itemsize=2)
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
