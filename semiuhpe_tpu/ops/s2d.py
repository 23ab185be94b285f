"""Space-to-depth execution of low-channel convolutions (TPU MXU shaping).

The reference's backbones run 224px inputs through early stages with 3-64
channels (/root/reference/src/networks.py:301-307 EfficientNetV2-S).  On
TPU the MXU contracts 128x128 tiles, so a 3->24-channel stem conv uses
~1-2% of the array and the whole stem..stage-2 region executes at 8-23%
MFU, while channel-rich controls of the same byte volume reach 55-71%
(measured: scripts/conv_shape_probe.py, BENCH_NOTES.md).

This module re-executes those convolutions EXACTLY in space-to-depth
space: tensors carry (H/2, W/2, 4C) with phase-major channels (channel
index = (a*2+b)*C + c for pixel phase (a,b)), and each original conv
becomes either

* a dense LIFT — one conv over s2d tensors whose kernel is the original
  kernel scattered under the phase algebra (structural zeros included:
  4x the FLOPs, but with >=4x better MXU lane shaping; a measured win
  whenever the original Cout is small), or
* a 4-PHASE decomposition — four 2x2-kernel convs (one per output pixel
  phase, each reading a shifted block window), 16/9 the FLOPs of the
  original, used when Cout >= 128 so each call already fills the lanes.

Both are exact reorderings of the same multiply-accumulate set (equal up
to float summation order).  Parameters keep the ORIGINAL (k,k,Cin,Cout)
shape — checkpoints, pretrained importers and param-count tests are
unaffected; only execution changes.

Supported: kernel 1x1 (pad 0) and 3x3 (pad 1), stride 1 or 2, groups=1 —
exactly the shapes in the fused-MBConv stages of the zoo's early trunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, Hb, Wb, a, b, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    b, hb, wb, c4 = x.shape
    assert c4 % 4 == 0, c4
    c = c4 // 4
    x = x.reshape(b, hb, wb, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * hb, 2 * wb, c)


def _phase_maps(kernel: int, stride: int):
    """Static (a, di) -> (block_tap, input_phase) maps for the lift.

    Original conv (pad (k-1)//2): out row o reads in rows stride*o + di,
    di in [-(k-1)//2, (k-1)//2].  With o = 2I + a the input row equals
    2*(stride*I) + stride*a + di, i.e. block stride*I + floor((stride*a +
    di)/2) at phase (stride*a + di) mod 2.
    """
    half = (kernel - 1) // 2
    out = []
    for a in range(2):
        for di in range(-half, half + 1):
            r = stride * a + di
            out.append((a, di + half, r // 2, r % 2))  # floor div for neg
    return out


def lift_kernel(w, stride: int):
    """Scatter (k,k,Cin,Cout) into the dense s2d kernel (K,K,4Cin,4Cout).

    K = 3 for k=3 (block window {-1,0,1}); K = 1 for k=1 (block-diagonal
    phase structure).  The lifted conv uses the SAME stride and pad
    (K-1)//2 over block coordinates.
    """
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    assert w.shape[1] == k and k in (1, 3), w.shape
    assert k == 3 or stride == 1, "1x1 lift only supports stride 1"
    bk = 3 if k == 3 else 1
    rows = _phase_maps(k, stride)
    lifted = jnp.zeros((bk, bk, 4 * cin, 4 * cout), w.dtype)
    for a, di, bi, pa in rows:
        for b, dj, bj, pb in rows:
            pin = pa * 2 + pb
            pout = a * 2 + b
            lifted = lifted.at[
                bi + (bk - 1) // 2, bj + (bk - 1) // 2,
                pin * cin:(pin + 1) * cin,
                pout * cout:(pout + 1) * cout].set(w[di, dj])
    return lifted


def _four_phase_weights(w, stride: int):
    """Per-output-phase 2x2 block kernels for the 4-phase decomposition.

    Output phase a at block I reads blocks start+t, t in {0,1}, with
    start = stride*I + a - 1; tap (t, input-phase pa) holds original
    di = 2*(a - 1 + t) + pa - stride*a  (stride 1) or 2t + pa - 2
    (stride 2); entries with |di| > 1 are structurally absent.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "4-phase decomposition is for 3x3 kernels"
    ws = {}
    for a in range(2):
        for b in range(2):
            wab = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
            for t in range(2):
                for u in range(2):
                    for pa in range(2):
                        for pb in range(2):
                            di = 2 * (a - 1 + t) + pa - stride * a
                            dj = 2 * (b - 1 + u) + pb - stride * b
                            if abs(di) <= 1 and abs(dj) <= 1:
                                pin = pa * 2 + pb
                                wab = wab.at[
                                    t, u, pin * cin:(pin + 1) * cin, :
                                ].set(w[di + 1, dj + 1])
            ws[(a, b)] = wab
    return ws


def _conv(x, w, stride: int, pad: int):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_conv(x, w, stride: int, *, four_phase: bool | None = None):
    """Original conv ``w`` (k,k,Cin,Cout), executed on an s2d tensor.

    ``x``: (B, Hb, Wb, 4Cin) phase-major; returns (B, Hb', Wb', 4Cout)
    phase-major, Hb' = Hb // stride.  ``four_phase=None`` auto-selects:
    4-phase for 3x3 kernels with Cout >= 128 (each of the four calls
    still fills the MXU lanes at 16/9 the FLOPs), dense lift otherwise.
    """
    k, _, cin, cout = w.shape
    assert x.shape[-1] == 4 * cin, (x.shape, w.shape)
    if k == 1:
        return _conv(x, lift_kernel(w, stride), stride, 0)
    if four_phase is None:
        four_phase = cout >= 128
    if not four_phase:
        return _conv(x, lift_kernel(w, stride), stride, 1)

    ws = _four_phase_weights(w, stride)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hb, wb = x.shape[1], x.shape[2]
    ho, wo = hb // stride, wb // stride
    outs = []
    for a in range(2):
        for b in range(2):
            # windows start at padded block index stride*I + a (rows), so
            # slice rows [a : a + stride*(ho-1) + 2] and convolve VALID.
            xs = jax.lax.slice(
                xp, (0, a, b, 0),
                (xp.shape[0], a + stride * (ho - 1) + 2,
                 b + stride * (wo - 1) + 2, xp.shape[3]))
            outs.append(_conv(xs, ws[(a, b)], stride, 0))
    out = jnp.stack(outs, axis=3)  # (B, Ho, Wo, 4, Cout)
    return out.reshape(out.shape[0], ho, wo, 4 * cout)


def s2d_batch_stats(x):
    """Per-original-channel batch (mean, mean-of-squares) of an s2d tensor.

    x: (B, Hb, Wb, 4C).  Stats are computed per 4C channel then averaged
    over the 4 phase groups — EXACTLY the per-C stats of the original
    (B, 2Hb, 2Wb, C) tensor (each original channel's pixels are split
    evenly across its 4 phase channels).  Returned as (mean, E[x^2]) in
    float32 so callers can pool across devices before forming the biased
    variance (var = E[x^2] - mean^2, matching flax BatchNorm).
    """
    c = x.shape[-1] // 4
    xf = x.astype(jnp.float32)
    m4 = jnp.mean(xf, axis=(0, 1, 2))
    s4 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    m = jnp.mean(m4.reshape(4, c), axis=0)
    s = jnp.mean(s4.reshape(4, c), axis=0)
    return m, s


def phase_tile(v, c4: int):
    """Tile a per-original-channel vector (C,) to s2d channels (4C,)."""
    c = c4 // 4
    assert v.shape[-1] == c
    return jnp.tile(v, 4)
