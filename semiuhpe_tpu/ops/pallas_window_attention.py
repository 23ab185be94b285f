"""Fused window attention (Pallas TPU): QK^T + relative-position bias +
softmax + AV in VMEM, logits never materialized in HBM.

Motivation (BENCH_NOTES per-backbone ladder): TinyViT-21m's SSL step is
3.5x slower than EffNetV2-S at comparable FLOPs.  The XLA lowering of
``WindowAttention`` (models/tinyvit.py) materializes the fp32 logits
tensor (B, H, N, N) in HBM several times per block (einsum out, softmax
read/write, AV read, plus backward twins) — for stage 3 (B=160, H=12,
N=196) that is ~295 MB per pass, ~6 passes x 6 blocks, i.e. tens of ms
of pure HBM traffic for a few GFLOPs of matmul.  This kernel keeps the
(N, N) logits of a chunk of windows entirely in VMEM.

Semantics match models/tinyvit.py exactly (reference parity chain:
/root/reference/src/tiny_vit.py:216-288 Attention):

    s   = (q @ k^T) * d**-0.5 + bias        [fp32 accumulate]
    p   = softmax_f32(s)  -> cast to compute dtype
    out = p @ v                              [fp32 accumulate -> dtype]

Layout contract: q, k, v are **(H, B, D, N) — D-major**: head-major so
the per-head bias (H, N, N) can be block-indexed by the head grid
coordinate; B is the window-batch (images x windows), N the tokens per
window, D the head dim.  D-major puts the 32-wide head dim on SUBLANES
(a clean multiple of the 16-sublane bf16 tile) and the token dim N on
lanes, so Mosaic's tile padding costs 1.3-2.6x instead of the 4x lane
padding an (N, D)-minor layout pays with D=32.  Measured on the v5e
(scripts/attn_probe.py, quiet chip, fwd+bwd per block at student batch
160): stage-2 4.556 -> 3.018 ms (-34%), stage-3 2.139 -> 1.653 ms
(-23%), stage-4 1.217 -> 1.085 ms; the N-major twin is kept in the
probe as `nmajor` for future A/Bs.  The caller passes the *dense
gathered* bias (H, N, N) fp32; its gather from the (H, n_offsets)
parameter happens in traced XLA code outside the kernel, so autodiff
routes the dense d_bias produced here back to the parameter via the
standard gather VJP (scatter-add).

Backward is one kernel (flash-style in-VMEM recompute of s and p from
the saved inputs) emitting dq, dk, dv and the dense d_bias; d_bias is
accumulated across the window-chunk grid dimension by revisiting the
same output block (the window axis is the innermost grid dim, so Mosaic
keeps the accumulator resident in VMEM between steps).

Used by models/tinyvit.py — default ON for TPU backends; set
SEMIUHPE_PALLAS_ATTN=0 to revert to the einsum path, =interpret for
CPU-hermetic runs.  Equivalence vs the einsum path is property-tested
in tests/test_pallas_window_attention.py (interpret mode, values + all
gradients).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _env_budget() -> int:
    """VMEM bytes budget for the chunk cost model (A/B knob for
    scripts/attn_probe.py; default 13 MiB leaves headroom under the
    ~16 MiB scoped-vmem limit)."""
    return int(float(os.environ.get("SEMIUHPE_ATTN_VMEM_MB", "13"))
               * 2 ** 20)


def _compiler_params(n_grid_dims: int):
    """Optional Mosaic knobs (probe A/B): SEMIUHPE_ATTN_PAR=1 marks all
    grid dims but the innermost `parallel` (the innermost stays
    `arbitrary`: the bwd d_bias accumulator revisits its block across
    it); SEMIUHPE_ATTN_VMEM_LIMIT_MB raises the scoped-vmem cap."""
    kw = {}
    if os.environ.get("SEMIUHPE_ATTN_PAR") == "1":
        kw["dimension_semantics"] = (
            ("parallel",) * (n_grid_dims - 1) + ("arbitrary",))
    lim = os.environ.get("SEMIUHPE_ATTN_VMEM_LIMIT_MB")
    if lim:
        kw["vmem_limit_bytes"] = int(float(lim) * 2 ** 20)
    return pltpu.CompilerParams(**kw) if kw else None


def _pick_chunk(b: int, n: int, d: int, n_io: int, n_tmp: int,
                itemsize: int = 2,
                bytes_budget: int | None = None) -> int:
    """Largest window-chunk G dividing b whose working set fits VMEM.

    Mosaic pads the two minor dims of every buffer to the dtype tile
    (2-byte dtypes: (16,128), 4-byte: (8,128)) and double-buffers the
    pipelined IO blocks, so the cost model must count padded slabs.
    `n_io` counts (D, N)-shaped compute-dtype blocks crossing the grid
    (double-buffered; D-major: D on sublanes pads 32->32, N on lanes
    pads 49->128 / 196->256); `itemsize` is that dtype's width (fp32
    inputs need twice the bf16 slab); `n_tmp` counts fp32 (N, N)
    logits-sized in-kernel temporaries (calibrated: fwd ~2, bwd ~4).
    The 13 MiB budget leaves headroom under the 16 MiB scoped-vmem
    limit.
    """
    if bytes_budget is None:
        bytes_budget = _env_budget()
    io_sub = 16 if itemsize == 2 else 8
    io = _round_up(d, io_sub) * _round_up(n, 128) * itemsize
    tmp = _round_up(n, 8) * _round_up(n, 128) * 4
    per_g = 2 * n_io * io + n_tmp * tmp
    best = 1
    for g in range(1, b + 1):
        if b % g:
            continue
        if g * per_g <= bytes_budget:
            best = g
        else:
            break
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0]  # (G, D, N)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]  # (N, N) fp32
    # s[n,m] = sum_d q[d,n] k[d,m]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, M)
    s = s * scale + bias[None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = p.astype(q.dtype)
    # o[d,n] = sum_m v[d,m] p[n,m]
    o = jax.lax.dot_general(
        v, p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, D, N)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    do = do_ref[0]  # (G, D, N)

    # Recompute p in VMEM (flash-style; saving p would cost an HBM pass).
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, M)
    s = s * scale + bias[None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p32 = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p32.astype(q.dtype)

    # dV[d,m] = sum_n dO[d,n] p[n,m]
    dv = jax.lax.dot_general(
        do, p, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, D, M)
    # dP[n,m] = sum_d dO[d,n] v[d,m]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, M)
    # Softmax VJP through the fp32 softmax: the cast p32->dtype is a
    # straight-through value change; its grad contribution matches the
    # XLA path (convert_element_type has identity-like VJP).
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))  # (G,N,M)

    # dBias accumulates over the window-chunk grid dim (innermost).
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
    dbias_ref[0] += jnp.sum(ds, axis=0)

    ds_scaled = (ds * scale).astype(q.dtype)
    # dQ[d,n] = sum_m k[d,m] dS[n,m]
    dq = jax.lax.dot_general(
        k, ds_scaled, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, D, N)
    # dK[d,m] = sum_n q[d,n] dS[n,m]
    dk = jax.lax.dot_general(
        q, ds_scaled, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, D, M)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(h, b, g, n, d):
    qkv = pl.BlockSpec((1, g, d, n), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, n, n), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def window_attention(q, k, v, bias, scale, interpret=False):
    """Fused window attention.

    q, k, v: (H, B, D, N) D-major in the compute dtype (see the module
    docstring for why); bias: (H, N, N) fp32.
    Returns (H, B, D, N) in the compute dtype.
    """
    return _fwd(q, k, v, bias, scale, interpret)


def _fwd(q, k, v, bias, scale, interpret):
    h, b, d, n = q.shape
    g = _pick_chunk(b, n, d, n_io=4, n_tmp=2, itemsize=q.dtype.itemsize)
    qkv_spec, bias_spec = _specs(h, b, g, n, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(h, b // g),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((h, b, d, n), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(2),
    )(q, k, v, bias)


def _fwd_rule(q, k, v, bias, scale, interpret):
    return _fwd(q, k, v, bias, scale, interpret), (q, k, v, bias)


def _bwd_rule(scale, interpret, res, do):
    q, k, v, bias = res
    h, b, d, n = q.shape
    g = _pick_chunk(b, n, d, n_io=7, n_tmp=4, itemsize=q.dtype.itemsize)
    qkv_spec, bias_spec = _specs(h, b, g, n, d)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(h, b // g),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h, b, d, n), q.dtype),
            jax.ShapeDtypeStruct((h, b, d, n), k.dtype),
            jax.ShapeDtypeStruct((h, b, d, n), v.dtype),
            jax.ShapeDtypeStruct((h, n, n), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(2),
    )(q, k, v, bias, do)
    return dq, dk, dv, dbias


window_attention.defvjp(_fwd_rule, _bwd_rule)


def window_attention_sharded(q, k, v, bias, scale, mesh, axis="data",
                             interpret=False):
    """shard_map-wrapped kernel for multi-device meshes.

    ``pallas_call`` is an opaque custom call to the SPMD partitioner, so
    inside a >1-device global-view pjit program the plain kernel would
    force gathers/replication.  The window batch (axis 1 of q/k/v) is
    embarrassingly parallel, so mapping it over the data axis is exact;
    the bias is replicated and its cotangent is psum-reduced across the
    mesh by shard_map's transpose (matching the einsum path's global
    gradient).  Requires the global window batch to divide the mesh size
    (the trainer's batch divisibility guarantee covers this: windows per
    image are constant).
    """
    from jax.sharding import PartitionSpec as P

    qkv = P(None, axis, None, None)
    f = jax.shard_map(
        lambda q_, k_, v_, b_: window_attention(q_, k_, v_, b_, scale,
                                                interpret),
        mesh=mesh, in_specs=(qkv, qkv, qkv, P(None, None, None)),
        out_specs=qkv,
        # pallas_call's out_shape carries no vma annotation, which the
        # jax-0.9 rep checker requires inside shard_map; transposition
        # (incl. the replicated-bias cotangent psum) is driven by the
        # specs and is covered by the gradient-equality test.
        check_vma=False)
    return f(q, k, v, bias)
