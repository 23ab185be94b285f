"""TinyViT-11M/21M backbone (flax, NHWC) with the Fisher regression head.

Behavioral parity with /root/reference/src/tiny_vit.py (Microsoft TinyViT,
arXiv 2207.10666): conv stem (/4), one MBConv stage, three window-attention
stages with cached relative-position attention biases, depthwise local conv
between attention and MLP, PatchMerging downsampling; head replaced by the
576->128->64->9 regressor (/root/reference/src/networks.py:419-428).

TPU design: the relative-position bias index table is a *static* numpy
constant baked at trace time (a gather of a (heads, n_offsets) parameter),
window partitioning is pure reshape/transpose (layout-friendly), all
attention math runs at the given `dtype` (bfloat16-safe) with fp32 softmax.
"""

from __future__ import annotations

import contextlib
import contextvars
import itertools
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.models.layers import ConvBN, RegressionHead, StochasticDepth


_ATTN_MODE_OVERRIDE = contextvars.ContextVar("pallas_attn_mode",
                                             default=None)


@contextlib.contextmanager
def pallas_attn_mode(mode: str):
    """Force the attention lowering for code traced in this context.

    Used by cli/export.py: a Mosaic custom call baked into an exported
    graph is not portable StableHLO, so serve graphs trace with
    pallas_attn_mode('off').
    """
    token = _ATTN_MODE_OVERRIDE.set(mode)
    try:
        yield
    finally:
        _ATTN_MODE_OVERRIDE.reset(token)


def _pallas_attn_mode() -> str:
    """'off' | 'on' | 'interpret' — fused Pallas window attention toggle.

    Default: on for TPU backends (the fused kernel keeps the fp32 logits
    in VMEM; see ops/pallas_window_attention.py), off elsewhere (the XLA
    einsum path is fine on CPU and keeps tests fast).
    """
    override = _ATTN_MODE_OVERRIDE.get()
    if override is not None:
        return override
    v = os.environ.get("SEMIUHPE_PALLAS_ATTN")
    if v is not None:
        mode = {"0": "off", "1": "on"}.get(v, v)
        if mode not in ("off", "on", "interpret"):
            raise ValueError(
                f"SEMIUHPE_PALLAS_ATTN={v!r}: expected 0, 1, or interpret")
        return mode
    return "on" if jax.default_backend() == "tpu" else "off"


def _gelu(v):
    """TinyViT's GELU.  fp32: exact erf, matching torch nn.GELU()
    (/root/reference/src/tiny_vit.py uses the torch default everywhere),
    so parity/golden/import paths stay bit-faithful.  bfloat16: the tanh
    approximation — measured 28.7 ms/step cheaper in stage-1 alone at the
    bench shapes (scripts/s1_decompose.py: XLA's erf lowering costs ~2x
    the surrounding convs on the 385 MB expanded tensors; tanh is one VPU
    transcendental).  max|erf-tanh| = 4.7e-4 absolute (at x~2.7), below
    the ~2e-3 rounding noise bf16 itself adds to unit-scale activations,
    so the swap is invisible at bf16 training precision
    (tests/test_models.py::test_gelu_mode).  ``SEMIUHPE_GELU=erf|tanh``
    overrides either way."""
    mode = os.environ.get("SEMIUHPE_GELU", "auto")
    if mode == "tanh":
        approx = True
    elif mode == "erf":
        approx = False
    else:
        approx = v.dtype == jnp.bfloat16
    return nn.gelu(v, approximate=approx)


def _attention_bias_idxs(resolution: Tuple[int, int]) -> Tuple[np.ndarray, int]:
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class WindowAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    resolution: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, N, C)
        b, n, _ = x.shape
        idxs, n_offsets = _attention_bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_offsets))
        x = nn.LayerNorm(dtype=self.dtype)(x)
        d = self.key_dim  # attn_ratio = 1 in TinyViT blocks
        qkv = nn.Dense(self.num_heads * d * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, self.num_heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H, d)
        mode = _pallas_attn_mode()
        if mode in ("on", "interpret"):
            from semiuhpe_tpu.ops.pallas_window_attention import (
                window_attention, window_attention_sharded)
            from semiuhpe_tpu.parallel.mesh import current_trace_mesh
            bias_dense = biases[:, idxs].astype(jnp.float32)  # (H, N, N)
            # Kernel layout is D-major (H, B, d, N): d=32 on sublanes
            # avoids the 4x lane-padding tax (see the kernel docstring).
            qh, kh, vh = (t.transpose(2, 0, 3, 1) for t in (q, k, v))
            ctx = current_trace_mesh()
            if ctx is not None and ctx[0].size > 1:
                # Inside a multi-device jit_step: shard_map the kernel
                # over the window batch (the partitioner treats the bare
                # pallas_call as opaque and would gather otherwise).
                out = window_attention_sharded(
                    qh, kh, vh, bias_dense, d ** -0.5, ctx[0], ctx[1],
                    mode == "interpret")
            else:
                out = window_attention(qh, kh, vh, bias_dense, d ** -0.5,
                                       mode == "interpret")  # (H, B, d, N)
            out = out.transpose(1, 3, 0, 2)  # -> (B, N, H, d)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (d ** -0.5)
            attn = attn + biases[:, idxs][None]  # (1, H, N, N)
            attn = jnp.asarray(
                nn.softmax(attn.astype(jnp.float32), axis=-1), self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(b, n, self.num_heads * d)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class TinyViTMlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = _gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x


class TinyViTBlock(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.window_size
        res = x
        if h == ws and w == ws:
            y = WindowAttention(self.dim, c // self.num_heads, self.num_heads,
                                (ws, ws), dtype=self.dtype)(x.reshape(b, h * w, c))
            y = y.reshape(b, h, w, c)
        else:
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            ph, pw = h + pad_b, w + pad_r
            nh, nw = ph // ws, pw // ws
            xw = xp.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(b * nh * nw, ws * ws, c)
            yw = WindowAttention(self.dim, c // self.num_heads, self.num_heads,
                                 (ws, ws), dtype=self.dtype)(xw)
            yw = yw.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = yw.reshape(b, ph, pw, c)[:, :h, :w]
        x = res + StochasticDepth(self.drop_path)(y, train)

        # Depthwise local conv between attention and MLP.
        x = ConvBN(c, 3, 1, groups=c, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)

        y = TinyViTMlp(int(c * self.mlp_ratio), c, dtype=self.dtype)(
            x.reshape(b, h * w, c), train)
        x = x + StochasticDepth(self.drop_path)(y.reshape(b, h, w, c), train)
        return x


class TinyViTMBConv(nn.Module):
    """Stage-0 MBConv: 1x1 expand (x4) -> 3x3 dw -> 1x1 project, GELU acts,
    residual + trailing GELU; conv3 BN scale zero-init."""

    dim: int
    expand_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = int(x.shape[-1] * self.expand_ratio)
        act = _gelu
        shortcut = x
        x = ConvBN(hidden, 1, 1, activation=act, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        x = ConvBN(hidden, 3, 1, groups=hidden, activation=act, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        x = ConvBN(self.dim, 1, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        x = StochasticDepth(self.drop_path)(x, train)
        return act(x + shortcut)


class PatchMerging(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _gelu
        x = ConvBN(self.out_dim, 1, 1, activation=act, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        x = ConvBN(self.out_dim, 3, 2, groups=self.out_dim, activation=act,
                   dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = ConvBN(self.out_dim, 1, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        return x


class TinyViT(nn.Module):
    embed_dims: Sequence[int] = (96, 192, 384, 576)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 18)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    head_hidden: Sequence[int] = (128, 64)
    num_outputs: int = 9
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, features_only: bool = False):
        act = _gelu
        # Patch embed: two stride-2 3x3 convs -> /4.
        x = ConvBN(self.embed_dims[0] // 2, 3, 2, activation=act,
                   dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = ConvBN(self.embed_dims[0], 3, 2, activation=None,
                   dtype=self.dtype, axis_name=self.axis_name)(x, train)

        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        block_id = 0
        n_stages = len(self.depths)
        for i in range(n_stages):
            dim = self.embed_dims[i]
            for j in range(self.depths[i]):
                if i == 0:
                    x = TinyViTMBConv(dim, 4.0, float(dpr[block_id]),
                                      dtype=self.dtype, axis_name=self.axis_name)(x, train)
                else:
                    res = (x.shape[1], x.shape[2])
                    x = TinyViTBlock(dim, res, self.num_heads[i],
                                     self.window_sizes[i], self.mlp_ratio,
                                     float(dpr[block_id]), dtype=self.dtype,
                                     axis_name=self.axis_name)(x, train)
                block_id += 1
            if i < n_stages - 1:
                x = PatchMerging(self.embed_dims[i + 1], dtype=self.dtype,
                                 axis_name=self.axis_name)(x, train)

        x = jnp.mean(x, axis=(1, 2))  # (B, C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_head")(x)
        if features_only:  # post-norm_head features (pretrained checks)
            return x
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def tiny_vit_21m(**kw):
    return TinyViT(embed_dims=(96, 192, 384, 576), depths=(2, 2, 6, 2),
                   num_heads=(3, 6, 12, 18), window_sizes=(7, 7, 14, 7),
                   drop_path_rate=0.2, **kw)


def tiny_vit_11m(**kw):
    return TinyViT(embed_dims=(64, 128, 256, 448), depths=(2, 2, 6, 2),
                   num_heads=(2, 4, 8, 14), window_sizes=(7, 7, 14, 7),
                   drop_path_rate=0.1, **kw)
