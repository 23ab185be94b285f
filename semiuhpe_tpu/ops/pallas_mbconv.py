"""Fused MBConv middle — Pallas TPU kernels for the stage-4/5/6 hot path.

The EfficientNetV2 MBConv block between its two 1x1 matmuls is a chain of
bandwidth-bound glue — BN apply + silu + 3x3 depthwise conv + BN apply +
silu + squeeze-excite — that XLA executes as ~10-20 separate HBM passes
over the wide (batch, 14, 14, hidden) tensor (measured: the glue costs
more than the matmuls, BENCH_NOTES.md).  These kernels collapse it to the
minimum: one read+write pass per direction per kernel, with the BN batch
statistics accumulated as per-block partials in the same pass and the
backward recomputing forward intermediates in-VMEM (flash-attention
style) instead of re-reading them from HBM.

Structure (matmuls stay in XLA — they are MXU-bound, not glue):

  h_raw --[K1: z=h*a1+b1; t=silu(z); d_raw=dw3x3(t)]--> d_raw (+sum/sumsq)
  d_raw --[K2: d=silu(d_raw*a2+b2); p=pool(d); v=SE(p); s=d*v]--> s

``fused_mbconv_middle`` wires both with ``jax.custom_vjp``; the a/b
coefficients are the usual folded BN apply (a = gamma*rsqrt(var+eps),
b = beta - mean*a), computed OUTSIDE so that train-mode gradients flow
through the batch statistics exactly like flax BatchNorm's autodiff.

Numerics match the unfused flax path to float-reassociation noise: same
silu, same fast-variance statistics (computed outside in f32), compute
dtype follows the input dtype, depthwise accumulation in f32.

Scope: stride-1 3x3 depthwise, SE present — i.e. every MBConv block in
EfficientNetV2 stages 4-6 except the two stride-2 stage entries (those
fall back to the unfused path).  Reference behavior being accelerated:
torchvision MBConv as mirrored in models/layers.py MBConv
(/root/reference/src/networks.py:301-319 uses these blocks via
torchvision's efficientnet_v2_s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_grad(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


import os

# The K1 backward holds ~8 f32 copies of the block (z, t, padded t/g,
# dt_acc, dz, casts) — a 448 KiB bf16 block keeps the whole working set
# inside the ~16 MB/core VMEM with headroom for double buffering.
_BT_BUDGET = int(os.environ.get("SEMIUHPE_PALLAS_BT_BUDGET", 448 << 10))


def _pick_bt(b: int, h: int, w: int, c: int, budget_bytes: int | None = None):
    """Largest power-of-two batch tile dividing b with block <= budget."""
    if budget_bytes is None:
        budget_bytes = _BT_BUDGET
    per_sample = h * w * c * 2  # bf16
    bt = 16
    while bt > 1 and (b % bt or bt * per_sample > budget_bytes):
        bt //= 2
    return bt if b % bt == 0 else 0


# --------------------------------------------------------------------------
# K1: BN-apply + silu + 3x3 depthwise conv (+ output-stat partials)
# --------------------------------------------------------------------------

def _k1_fwd_kernel(h_ref, a1_ref, b1_ref, w_ref, out_ref, ps_ref, pss_ref,
                   *, hh: int, ww: int):
    # elementwise math in f32 (Mosaic's logistic lowering rejects bf16;
    # the kernel is HBM-bound so f32 VPU work is free)
    dt = h_ref.dtype
    z = h_ref[...].astype(jnp.float32) * a1_ref[0][None, None, None, :] \
        + b1_ref[0][None, None, None, :]
    t = jax.nn.silu(z)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = w_ref[3 * u + v][None, None, None, :].astype(jnp.float32)
            acc += tp[:, u:u + hh, v:v + ww, :] * tap
    out_ref[...] = acc.astype(dt)

    # stat outputs are grid-accumulated (constant index_map; TPU grid
    # iterations are sequential, so += over revisited blocks is exact)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ps_ref[...] = jnp.zeros_like(ps_ref)
        pss_ref[...] = jnp.zeros_like(pss_ref)

    ps_ref[...] += jnp.sum(acc, axis=(0, 1, 2))[None, :]
    pss_ref[...] += jnp.sum(jnp.square(acc), axis=(0, 1, 2))[None, :]


def _k1_bwd_kernel(h_ref, a1_ref, b1_ref, w_ref, g_ref,
                   dh_ref, dw_ref, da1_ref, db1_ref, *, hh: int, ww: int):
    dt = h_ref.dtype
    a1 = a1_ref[0][None, None, None, :]
    z = h_ref[...].astype(jnp.float32) * a1 + b1_ref[0][None, None, None, :]
    t = jax.nn.silu(z)
    g = g_ref[...].astype(jnp.float32)
    # dt = correlate g with flipped kernel
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dt_acc = jnp.zeros(h_ref.shape, jnp.float32)
    dw_rows = []
    for u in range(3):
        for v in range(3):
            tap = w_ref[3 * u + v][None, None, None, :].astype(jnp.float32)
            # d_raw[i] = sum_u t[i+u-1] w[u]  =>  dt[i] = sum_u g[i-u+1] w[u]
            dt_acc += gp[:, 2 - u:2 - u + hh, 2 - v:2 - v + ww, :] * tap
            # dw[u,v,c] = sum_{b,i,j} t[b,i+u-1,j+v-1,c] g[b,i,j,c]
            dw_rows.append(jnp.sum(
                tp[:, u:u + hh, v:v + ww, :] * g, axis=(0, 1, 2)))
    dz = dt_acc * _silu_grad(z)
    dh_ref[...] = (dz * a1).astype(dt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    dw_ref[...] += jnp.stack(dw_rows)
    da1_ref[...] += jnp.sum(dz * h_ref[...].astype(jnp.float32),
                            axis=(0, 1, 2))[None, :]
    db1_ref[...] += jnp.sum(dz, axis=(0, 1, 2))[None, :]


def _k1_call(h, a1, b1, w9, bt):
    b, hh, ww, c = h.shape
    grid = (b // bt,)
    out, ps, pss = pl.pallas_call(
        functools.partial(_k1_fwd_kernel, hh=hh, ww=ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(h.shape, h.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(h, a1.reshape(1, c).astype(jnp.float32),
      b1.reshape(1, c).astype(jnp.float32), w9)
    n = b * hh * ww
    return out, ps[0] / n, pss[0] / n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dw_bn_silu(h, a1, b1, w9, bt):
    """d_raw = depthwise3x3(silu(h*a1+b1)); also returns (mean, meansq) of
    d_raw (per channel, f32) for the following BatchNorm."""
    return _k1_call(h, a1, b1, w9, bt)


def _dw_bn_silu_fwd(h, a1, b1, w9, bt):
    out = _k1_call(h, a1, b1, w9, bt)
    # d_raw is saved as a residual at no memory cost: the same array is
    # already materialized in HBM as K2's input (and K2's own residual).
    return out, (h, a1, b1, w9, out[0])


def _dw_bn_silu_bwd(bt, res, cots):
    h, a1, b1, w9, d_raw = res
    g, g_mean, g_meansq = cots
    b, hh, ww, c = h.shape
    # fold the (tiny) stat cotangents into g: d mean/d d_raw = 1/n,
    # d meansq/d d_raw = 2*d_raw/n.
    n = b * hh * ww
    g = (g.astype(jnp.float32)
         + g_mean[None, None, None, :].astype(jnp.float32) / n
         + 2.0 * d_raw.astype(jnp.float32)
         * g_meansq[None, None, None, :].astype(jnp.float32) / n
         ).astype(g.dtype)
    grid = (b // bt,)
    dh, dw, da1, db1 = pl.pallas_call(
        functools.partial(_k1_bwd_kernel, hh=hh, ww=ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(h.shape, h.dtype),
            jax.ShapeDtypeStruct((9, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(h, a1.reshape(1, c).astype(jnp.float32),
      b1.reshape(1, c).astype(jnp.float32), w9, g)
    return (dh, da1[0].astype(a1.dtype), db1[0].astype(b1.dtype),
            dw.astype(w9.dtype))


dw_bn_silu.defvjp(_dw_bn_silu_fwd, _dw_bn_silu_bwd)


# --------------------------------------------------------------------------
# K2: BN-apply + silu + squeeze-excite scale
# --------------------------------------------------------------------------

def _k2_fwd_kernel(d_ref, a2_ref, b2_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                   s_ref):
    dt = d_ref.dtype
    z = d_ref[...].astype(jnp.float32) * a2_ref[0][None, None, None, :] \
        + b2_ref[0][None, None, None, :]
    d = jax.nn.silu(z)
    p = jnp.mean(d, axis=(1, 2))                              # (bt, C)
    q1 = jnp.dot(p.astype(dt), w1_ref[...],
                 preferred_element_type=jnp.float32) + c1_ref[0][None, :]
    u = jax.nn.silu(q1)
    q2 = jnp.dot(u.astype(dt), w2_ref[...],
                 preferred_element_type=jnp.float32) + c2_ref[0][None, :]
    v = jax.nn.sigmoid(q2)
    s_ref[...] = (d * v[:, None, None, :]).astype(dt)


def _k2_bwd_kernel(d_ref, a2_ref, b2_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                   g_ref, dd_ref, da2_ref, db2_ref, dw1_ref, dc1_ref,
                   dw2_ref, dc2_ref, *, hw: int):
    dt = d_ref.dtype
    a2 = a2_ref[0][None, None, None, :].astype(jnp.float32)
    z = d_ref[...].astype(jnp.float32) * a2 + b2_ref[0][None, None, None, :]
    d = jax.nn.silu(z)
    p = jnp.mean(d, axis=(1, 2))
    q1 = jnp.dot(p.astype(dt), w1_ref[...],
                 preferred_element_type=jnp.float32) + c1_ref[0][None, :]
    u = jax.nn.silu(q1)
    q2 = jnp.dot(u.astype(dt), w2_ref[...],
                 preferred_element_type=jnp.float32) + c2_ref[0][None, :]
    v = jax.nn.sigmoid(q2)

    g = g_ref[...].astype(jnp.float32)
    dd = g * v[:, None, None, :]
    dv = jnp.sum(g * d, axis=(1, 2))                           # (bt, C)
    dq2 = dv * v * (1.0 - v)
    du = jnp.dot(dq2.astype(dt), w2_ref[...].T,
                 preferred_element_type=jnp.float32)
    dq1 = du * _silu_grad(q1)
    dp = jnp.dot(dq1.astype(dt), w1_ref[...].T,
                 preferred_element_type=jnp.float32)
    dd = dd + dp[:, None, None, :] / hw
    dz = dd * _silu_grad(z)
    dd_ref[...] = (dz * a2).astype(dt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        da2_ref[...] = jnp.zeros_like(da2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dc1_ref[...] = jnp.zeros_like(dc1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dc2_ref[...] = jnp.zeros_like(dc2_ref)

    dw2_ref[...] += jnp.dot(u.T.astype(dt), dq2.astype(dt),
                            preferred_element_type=jnp.float32)
    dc2_ref[...] += jnp.sum(dq2, axis=0)[None, :]
    dw1_ref[...] += jnp.dot(p.T.astype(dt), dq1.astype(dt),
                            preferred_element_type=jnp.float32)
    dc1_ref[...] += jnp.sum(dq1, axis=0)[None, :]
    da2_ref[...] += jnp.sum(dz * d_ref[...].astype(jnp.float32),
                            axis=(0, 1, 2))[None, :]
    db2_ref[...] += jnp.sum(dz, axis=(0, 1, 2))[None, :]


def _k2_specs(b, hh, ww, c, cse, bt):
    in_specs = [
        pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, cse), lambda i: (0, 0)),
        pl.BlockSpec((1, cse), lambda i: (0, 0)),
        pl.BlockSpec((cse, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
    ]
    return in_specs


def _k2_args(d_raw, a2, b2, w1, c1, w2, c2):
    c = d_raw.shape[-1]
    cse = w1.shape[-1]
    return (d_raw, a2.reshape(1, c).astype(jnp.float32),
            b2.reshape(1, c).astype(jnp.float32),
            w1, c1.reshape(1, cse).astype(jnp.float32), w2,
            c2.reshape(1, c).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def bn_silu_se(d_raw, a2, b2, w1, c1, w2, c2, bt):
    """s = silu(d_raw*a2+b2) scaled by its squeeze-excite gate."""
    b, hh, ww, c = d_raw.shape
    cse = w1.shape[-1]
    return pl.pallas_call(
        _k2_fwd_kernel,
        grid=(b // bt,),
        in_specs=_k2_specs(b, hh, ww, c, cse, bt),
        out_specs=pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(d_raw.shape, d_raw.dtype),
    )(*_k2_args(d_raw, a2, b2, w1, c1, w2, c2))


def _bn_silu_se_fwd(d_raw, a2, b2, w1, c1, w2, c2, bt):
    return bn_silu_se(d_raw, a2, b2, w1, c1, w2, c2, bt), (
        d_raw, a2, b2, w1, c1, w2, c2)


def _bn_silu_se_bwd(bt, res, g):
    d_raw, a2, b2, w1, c1, w2, c2 = res
    b, hh, ww, c = d_raw.shape
    cse = w1.shape[-1]
    nblk = b // bt
    dd, da2, db2, dw1, dc1, dw2, dc2 = pl.pallas_call(
        functools.partial(_k2_bwd_kernel, hw=hh * ww),
        grid=(nblk,),
        in_specs=_k2_specs(b, hh, ww, c, cse, bt) + [
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, cse), lambda i: (0, 0)),
            pl.BlockSpec((1, cse), lambda i: (0, 0)),
            pl.BlockSpec((cse, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(d_raw.shape, d_raw.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, cse), jnp.float32),
            jax.ShapeDtypeStruct((1, cse), jnp.float32),
            jax.ShapeDtypeStruct((cse, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(*_k2_args(d_raw, a2, b2, w1, c1, w2, c2), g)
    return (dd, da2[0].astype(a2.dtype), db2[0].astype(b2.dtype),
            dw1.astype(w1.dtype), dc1[0].astype(c1.dtype),
            dw2.astype(w2.dtype), dc2[0].astype(c2.dtype))


bn_silu_se.defvjp(_bn_silu_se_fwd, _bn_silu_se_bwd)


# --------------------------------------------------------------------------
# Public entry: the full middle with BN statistics handled outside
# --------------------------------------------------------------------------

def bn_coeffs(scale, bias, mean, var, eps):
    """Folded BatchNorm apply coefficients (f32)."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a


def pallas_mbconv_enabled() -> bool:
    """Resolve the default fused-middle toggle.

    Default OFF: measured on v5e (BENCH_NOTES.md, stage-5 shapes
    b160x14x14x960), XLA's own fusion of this chain is already at the
    achievable HBM bandwidth — the Pallas twin ties the forward
    (K2 0.98 vs 0.92 ms) and loses the backward badly (K1 fwd+bwd
    2.99 vs 1.15 ms), and larger tiles exceed the 16 MB VMEM scope.
    The kernels stay as a tested execution variant
    (SEMIUHPE_PALLAS_MBCONV=1; on CPU additionally requires
    pltpu.force_tpu_interpret_mode).
    """
    return os.environ.get("SEMIUHPE_PALLAS_MBCONV", "0") == "1"


def fused_middle_supported(h_shape, stride: int, se: bool,
                           kernel: int) -> bool:
    b, hh, ww, c = h_shape
    if stride != 1 or not se or kernel != 3:
        return False
    if c % 8:  # lane-utilization sanity; all real hiddens are multiples
        return False
    return _pick_bt(b, hh, ww, c) > 0


def mbconv_middle(h_raw, dw_w, bn1, bn2, se_params, *, train: bool,
                  eps: float, momentum: float):
    """h_raw -> (s, new_running1, new_running2).

    bn1/bn2: dicts with scale, bias, mean, var (running).  se_params:
    (w1, c1, w2, c2) with w1 (C, Cse), w2 (Cse, C).  Batch statistics are
    computed here in f32 with the fast-variance formula, so train-mode
    gradients flow through them exactly like flax BatchNorm.
    """
    b, hh, ww, c = h_raw.shape
    bt = _pick_bt(b, hh, ww, c)
    if train:
        hf = h_raw.astype(jnp.float32)
        mean1 = jnp.mean(hf, axis=(0, 1, 2))
        var1 = jnp.mean(jnp.square(hf), axis=(0, 1, 2)) - jnp.square(mean1)
    else:
        mean1, var1 = bn1["mean"], bn1["var"]
    a1, b1 = bn_coeffs(bn1["scale"], bn1["bias"], mean1, var1, eps)
    w9 = dw_w.reshape(9, c)
    d_raw, mean2, meansq2 = dw_bn_silu(h_raw, a1, b1, w9, bt)
    if train:
        var2 = meansq2 - jnp.square(mean2)
    else:
        mean2, var2 = bn2["mean"], bn2["var"]
    a2, b2 = bn_coeffs(bn2["scale"], bn2["bias"], mean2, var2, eps)
    w1, c1, w2, c2 = se_params
    s = bn_silu_se(d_raw, a2, b2, w1, c1, w2, c2, bt)
    if train:
        def upd(ra, batch):
            return momentum * ra + (1.0 - momentum) * jax.lax.stop_gradient(batch)
        new1 = (upd(bn1["mean"], mean1), upd(bn1["var"], var1))
        new2 = (upd(bn2["mean"], mean2), upd(bn2["var"], var2))
    else:
        new1 = (bn1["mean"], bn1["var"])
        new2 = (bn2["mean"], bn2["var"])
    return s, new1, new2
