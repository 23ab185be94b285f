"""Shared flax building blocks for the backbone zoo.

TPU-first conventions:
* NHWC layout throughout (XLA's native TPU conv layout — no transposes).
* `dtype` controls compute precision (bfloat16 recommended on TPU);
  parameters and batch-norm statistics stay float32.
* BatchNorm takes an optional `axis_name` so that under pjit/shard_map the
  statistics are reduced across the data-parallel mesh axis (the reference
  is single-GPU, /root/reference/src/networks.py:32 — cross-replica BN is
  how the same effective semantics survive sharding).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional activation (NHWC)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    activation: Optional[Callable] = nn.relu
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    padding: Optional[int] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.kernel_size - 1) // 2 if self.padding is None else self.padding
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block; reduction computed from `se_features` (input-block width)."""

    se_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_features, (1, 1), dtype=self.dtype)(pooled)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class StochasticDepth(nn.Module):
    """Row-wise drop-path (torchvision-style) for residual branches."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not train or self.rate == 0.0:
            return x
        import jax

        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / keep


class MBConv(nn.Module):
    """Inverted residual with depthwise conv (+SE), silu activation."""

    features: int
    expand_ratio: float
    kernel_size: int = 3
    strides: int = 1
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    activation: Callable = nn.silu
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        residual = x
        if self.expand_ratio != 1:
            x = ConvBN(hidden, 1, 1, activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
        x = ConvBN(hidden, self.kernel_size, self.strides, groups=hidden,
                   activation=self.activation, dtype=self.dtype,
                   axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
        if self.se_ratio > 0:
            x = SqueezeExcite(max(1, int(inp * self.se_ratio)), dtype=self.dtype)(x)
        x = ConvBN(self.features, 1, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
        if self.strides == 1 and inp == self.features:
            x = StochasticDepth(self.drop_rate)(x, train) + residual
        return x


class FusedMBConv(nn.Module):
    """EfficientNetV2 fused block: single 3x3 conv instead of expand+dw."""

    features: int
    expand_ratio: float
    kernel_size: int = 3
    strides: int = 1
    drop_rate: float = 0.0
    activation: Callable = nn.silu
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        residual = x
        if self.expand_ratio != 1:
            x = ConvBN(hidden, self.kernel_size, self.strides,
                       activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
            x = ConvBN(self.features, 1, 1, activation=None, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
        else:
            x = ConvBN(self.features, self.kernel_size, self.strides,
                       activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
        if self.strides == 1 and inp == self.features:
            x = StochasticDepth(self.drop_rate)(x, train) + residual
        return x


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


class RegressionHead(nn.Module):
    """MLP regressor ending in the 9 Fisher-matrix logits.

    Mirrors the reference's replacement classifier heads
    (/root/reference/src/networks.py:310-319 and siblings): per hidden layer
    Dense -> BatchNorm1d -> ReLU6, preceded by Dropout, ending in a plain
    Dense(num_outputs).  Linear weights ~ N(0, 0.01), zero bias (reference
    init, networks.py:321-331).
    """

    hidden: Sequence[int] = (512, 128)
    num_outputs: int = 9
    dropout: float = 0.2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        kinit = nn.initializers.normal(stddev=0.01)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for h in self.hidden:
            x = nn.Dense(h, kernel_init=kinit, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
            x = relu6(x)
        x = nn.Dense(self.num_outputs, kernel_init=kinit, dtype=jnp.float32)(x)
        return x
