"""MobileNetV2 backbone with regression head.

Capability parity with the reference's from-scratch MobileNet
(/root/reference/src/networks.py:123-226): standard MobileNetV2 trunk
(width 1.0, ReLU6), head 1280->256->64->9.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semiuhpe_tpu.models.layers import ConvBN, RegressionHead, relu6


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        residual = x
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, 1, 1, activation=relu6, dtype=self.dtype,
                       axis_name=self.axis_name)(y, train)
        y = ConvBN(hidden, 3, self.strides, groups=hidden, activation=relu6,
                   dtype=self.dtype, axis_name=self.axis_name)(y, train)
        y = ConvBN(self.features, 1, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train)
        if self.strides == 1 and inp == self.features:
            return residual + y
        return y


# (expand t, channels c, repeats n, stride s) — MobileNetV2 paper table 2.
_V2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    width_mult: float = 1.0
    head_hidden: Sequence[int] = (256, 64)
    num_outputs: int = 9
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ch = _make_divisible(32 * self.width_mult)
        x = ConvBN(ch, 3, 2, activation=relu6, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        for t, c, n, s in _V2_CFG:
            out_c = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(out_c, s if i == 0 else 1, t,
                                     dtype=self.dtype, axis_name=self.axis_name)(x, train)
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBN(last, 1, 1, activation=relu6, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def mobilenet_v2(**kw):
    return MobileNetV2(**kw)
