"""BPJDet body-part detector: YOLOv5-P6 with part-offset channels (flax).

Inference-only port of the reference's vendored detector
(/root/reference/models/yolo.py, models/common.py, models/yolov5*.yaml):
CSPDarknet-P6 backbone (Focus stem, C3 blocks, SPP) + PANet neck + Detect
head extended with ``num_offsets`` body-part center-offset channels decoded
against the anchor grid (yolo.py:68-77).  Channel/depth scaling follows the
yaml multiples (s6: 0.33/0.50, m6: 0.67/0.75, l6: 1.0/1.0).

TPU-first: NHWC, static shapes (letterboxed input), the whole forward is
one jit program; the decode emits an (N, 5+nc+num_offsets) matrix that the
host-side NMS consumes.  TTA (multi-scale/flip with de-scaling,
yolo.py:151-216) composes jitted forwards per scale.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# P3/8 P4/16 P5/32 P6/64 anchors (yolov5m6.yaml/l6.yaml share these).
ANCHORS_P6 = (
    ((19, 27), (44, 40), (38, 94)),
    ((96, 68), (86, 152), (180, 137)),
    ((140, 301), (303, 264), (238, 542)),
    ((436, 615), (739, 380), (925, 792)),
)
STRIDES_P6 = (8, 16, 32, 64)


def _make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


class ConvBA(nn.Module):
    """Conv + BN + SiLU (the reference's Conv block)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Focus(nn.Module):
    """Space-to-depth stem: (b, h, w, c) -> (b, h/2, w/2, 4c) -> Conv."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        patches = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1)
        return ConvBA(self.features, self.kernel, dtype=self.dtype,
                      name="conv")(patches, train)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBA(self.features, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBA(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        a = ConvBA(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        b = ConvBA(hidden, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBA(self.features, 1, dtype=self.dtype,
                      name="cv3")(jnp.concatenate([a, b], -1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling (kernels 3/5/7 in the P6 models)."""

    features: int
    kernels: Sequence[int] = (3, 5, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBA(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for k in self.kernels:
            pools.append(nn.max_pool(x, (k, k), strides=(1, 1),
                                     padding=[(k // 2, k // 2)] * 2))
        return ConvBA(self.features, 1, dtype=self.dtype,
                      name="cv2")(jnp.concatenate(pools, -1), train)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


class YOLOv5P6(nn.Module):
    """P6 backbone+neck with offset-aware Detect; returns the decoded
    (B, N, 5+nc+num_offsets) prediction matrix."""

    depth_multiple: float = 0.67
    width_multiple: float = 0.75
    nc: int = 2
    num_offsets: int = 2
    anchors: Sequence = ANCHORS_P6
    dtype: Any = jnp.float32

    def _w(self, c):
        return _make_divisible(c * self.width_multiple)

    def _d(self, n):
        return max(round(n * self.depth_multiple), 1)

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = True):
        w, d = self._w, self._d
        dt = self.dtype
        # Backbone (yolov5m6.yaml backbone table).
        x = Focus(w(64), 3, dtype=dt, name="b0")(x, train)          # P1/2
        x = ConvBA(w(128), 3, 2, dtype=dt, name="b1")(x, train)     # P2/4
        x = C3(w(128), d(3), dtype=dt, name="b2")(x, train)
        x = ConvBA(w(256), 3, 2, dtype=dt, name="b3")(x, train)     # P3/8
        p3 = C3(w(256), d(9), dtype=dt, name="b4")(x, train)
        x = ConvBA(w(512), 3, 2, dtype=dt, name="b5")(p3, train)    # P4/16
        p4 = C3(w(512), d(9), dtype=dt, name="b6")(x, train)
        x = ConvBA(w(768), 3, 2, dtype=dt, name="b7")(p4, train)    # P5/32
        p5 = C3(w(768), d(3), dtype=dt, name="b8")(x, train)
        x = ConvBA(w(1024), 3, 2, dtype=dt, name="b9")(p5, train)   # P6/64
        x = SPP(w(1024), (3, 5, 7), dtype=dt, name="b10")(x, train)
        p6 = C3(w(1024), d(3), shortcut=False, dtype=dt, name="b11")(x, train)

        # PANet neck.
        h12 = ConvBA(w(768), 1, dtype=dt, name="h12")(p6, train)
        x = jnp.concatenate([_upsample2(h12), p5], -1)
        h15 = C3(w(768), d(3), False, dtype=dt, name="h15")(x, train)

        h16 = ConvBA(w(512), 1, dtype=dt, name="h16")(h15, train)
        x = jnp.concatenate([_upsample2(h16), p4], -1)
        h19 = C3(w(512), d(3), False, dtype=dt, name="h19")(x, train)

        h20 = ConvBA(w(256), 1, dtype=dt, name="h20")(h19, train)
        x = jnp.concatenate([_upsample2(h20), p3], -1)
        out3 = C3(w(256), d(3), False, dtype=dt, name="h23")(x, train)

        x = ConvBA(w(256), 3, 2, dtype=dt, name="h24")(out3, train)
        x = jnp.concatenate([x, h20], -1)
        out4 = C3(w(512), d(3), False, dtype=dt, name="h26")(x, train)

        x = ConvBA(w(512), 3, 2, dtype=dt, name="h27")(out4, train)
        x = jnp.concatenate([x, h16], -1)
        out5 = C3(w(768), d(3), False, dtype=dt, name="h29")(x, train)

        x = ConvBA(w(768), 3, 2, dtype=dt, name="h30")(out5, train)
        x = jnp.concatenate([x, h12], -1)
        out6 = C3(w(1024), d(3), False, dtype=dt, name="h32")(x, train)

        feats = [out3, out4, out5, out6]
        no = 5 + self.nc + self.num_offsets
        na = len(self.anchors[0])
        raw = [nn.Conv(no * na, (1, 1), dtype=dt, name=f"detect{i}")(f)
               for i, f in enumerate(feats)]
        if not decode:
            return raw
        return self.decode(raw)

    def decode(self, raw: List[jnp.ndarray]) -> jnp.ndarray:
        """Anchor-grid decode of every level -> (B, N, no), pixel units.
        Mirrors Detect.forward inference math (yolo.py:60-77):
        xy = (2*sig-0.5+grid)*stride, wh = (2*sig)^2*anchor,
        offsets = (4*sig-2)*anchor + grid*stride."""
        na = len(self.anchors[0])
        no = 5 + self.nc + self.num_offsets
        outs = []
        for i, r in enumerate(raw):
            b, ny, nx, _ = r.shape
            stride = STRIDES_P6[i]
            anchors = jnp.asarray(self.anchors[i], r.dtype)  # (na, 2)
            y = jax.nn.sigmoid(r.reshape(b, ny, nx, na, no))
            gx = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1).astype(r.dtype)
            gy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0).astype(r.dtype)
            grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1,ny,nx,1,2)
            xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
            wh = (y[..., 2:4] * 2.0) ** 2 * anchors[None, None, None]
            rest = y[..., 4:5 + self.nc]
            n_pairs = self.num_offsets // 2
            off = y[..., 5 + self.nc:].reshape(b, ny, nx, na, n_pairs, 2)
            off = (off * 4.0 - 2.0) * anchors[None, None, None, :, None, :]
            off = off + grid[..., None, :] * stride
            off = off.reshape(b, ny, nx, na, self.num_offsets)
            out = jnp.concatenate([xy, wh, rest, off], -1)
            outs.append(out.reshape(b, -1, no))
        return jnp.concatenate(outs, 1)


def yolov5_bpjdet(variant: str = "l6", nc: int = 2, num_offsets: int = 2,
                  dtype=jnp.float32) -> YOLOv5P6:
    """BPJDet body-head model sizes (README uses ch_head_l_1536 = l6)."""
    mults = {"s6": (0.33, 0.50), "m6": (0.67, 0.75), "l6": (1.0, 1.0)}
    d, w = mults[variant]
    return YOLOv5P6(depth_multiple=d, width_multiple=w, nc=nc,
                    num_offsets=num_offsets, dtype=dtype)


def tta_forward(model, variables, img: jnp.ndarray,
                scales: Sequence[float] = (1.0,),
                flips: Sequence[Optional[int]] = None) -> jnp.ndarray:
    """Test-time augmentation: multi-scale + horizontal-flip forwards with
    de-scaling/de-flipping of boxes and offset points (yolo.py:151-216)."""
    if flips is None:
        flips = [None] * len(scales)
    h, w = img.shape[1:3]
    preds = []
    for s, f in zip(scales, flips):
        x = img
        if f == 3:
            x = x[:, :, ::-1]
        if s != 1.0:
            nh, nw = int(round(h * s / 64) * 64), int(round(w * s / 64) * 64)
            x = jax.image.resize(x, (x.shape[0], nh, nw, x.shape[3]), "bilinear")
        p = model.apply(variables, x, train=False)
        p = np.array(p)  # writable host copy
        actual_s = (x.shape[1] / h) if s != 1.0 else 1.0
        p[..., :4] /= actual_s
        p[..., -model.num_offsets:] /= actual_s
        if f == 3:
            p[..., 0] = w - p[..., 0]
            for k in range(model.num_offsets // 2):
                col = p.shape[-1] - model.num_offsets + 2 * k
                p[..., col] = w - p[..., col]
        preds.append(p)
    return np.concatenate(preds, 1)
