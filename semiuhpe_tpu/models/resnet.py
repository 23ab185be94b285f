"""ResNet-18/50 backbones with the Fisher regression head (flax, NHWC).

Capability parity with /root/reference/src/networks.py:443-471 (torchvision
resnets with the classifier swapped for the MLP regressor): resnet18 head
512->128->64->9, resnet50 head 2048->512->128->9.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semiuhpe_tpu.models.layers import ConvBN, RegressionHead


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train)
        y = ConvBN(self.features, 3, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.strides, activation=None,
                              dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_features = self.features * 4
        residual = x
        y = ConvBN(self.features, 1, 1, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train)
        y = ConvBN(out_features, 1, 1, activation=None, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train)
        if self.strides != 1 or x.shape[-1] != out_features:
            residual = ConvBN(out_features, 1, self.strides, activation=None,
                              dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = True
    head_hidden: Sequence[int] = (512, 128)
    num_outputs: int = 9
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, features_only: bool = False):
        x = ConvBN(64, 7, 2, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block = Bottleneck if self.bottleneck else BasicBlock
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block(64 * 2**i, strides, dtype=self.dtype,
                          axis_name=self.axis_name)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if features_only:  # pooled trunk features (pretrained-import checks)
            return x
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def resnet18(**kw):
    return ResNet(stage_sizes=(2, 2, 2, 2), bottleneck=False,
                  head_hidden=(128, 64), **kw)


def resnet50(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                  head_hidden=(512, 128), **kw)
