"""RepVGG-B1g2 backbone with structural re-parameterization.

Capability parity with /root/reference/src/repvgg.py (train-time 3x3 + 1x1 +
identity branches; deploy-time fused single 3x3 conv via
``reparameterize_params``) and the head wiring at src/networks.py:257-266
(2048->512->128->9).

TPU notes: branches are expressed so XLA fuses the three BN-scaled adds;
the deploy path turns the whole block into one conv — use it for serving.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.models.layers import RegressionHead


class RepVGGBlock(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.deploy:
            y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                        padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                        use_bias=True, dtype=self.dtype, name="reparam")(x)
            return nn.relu(y)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name if train else None,
                                name=name)

        dense = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                        padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype, name="dense_conv")(x)
        dense = bn("dense_bn")(dense)
        one = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                      padding="VALID", feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype, name="one_conv")(x)
        one = bn("one_bn")(one)
        y = dense + one
        if x.shape[-1] == self.features and self.strides == 1:
            y = y + bn("id_bn")(x)
        return nn.relu(y)


# RepVGG-B1: a=2, b=4 -> widths (64, 128, 256, 512) * a, last 512 * b.
_B1_WIDTHS = (64, 128, 256, 512, 2048)
_B1_DEPTHS = (1, 4, 6, 16, 1)


class RepVGG(nn.Module):
    """RepVGG-B1g2: optional groupwise (g=2) conv at even global layer
    indices 2..26 (stage0 = index 0), following the g2_map convention of
    /root/reference/src/repvgg.py:213-214,237-239."""

    widths: Sequence[int] = _B1_WIDTHS
    depths: Sequence[int] = _B1_DEPTHS
    group_every_other: int = 2
    head_hidden: Sequence[int] = (512, 128)
    num_outputs: int = 9
    deploy: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, features_only: bool = False):
        layer_idx = 0
        for stage, (w, d) in enumerate(zip(self.widths, self.depths)):
            w = min(w, 128) if stage == 0 else w
            for j in range(d):
                strides = 2 if j == 0 else 1
                groups = (self.group_every_other
                          if (layer_idx % 2 == 0 and 2 <= layer_idx <= 26) else 1)
                if w % max(groups, 1) != 0 or (j == 0 and stage > 0):
                    groups = 1
                x = RepVGGBlock(w, strides, groups, deploy=self.deploy,
                                dtype=self.dtype, axis_name=self.axis_name)(x, train)
                layer_idx += 1
        x = jnp.mean(x, axis=(1, 2))
        if features_only:  # pooled trunk features (pretrained-import checks)
            return x
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def repvgg_b1g2(**kw):
    return RepVGG(**kw)


# ---------------------------------------------------------------------------
# Structural re-parameterization (train-time -> deploy-time weights)
# ---------------------------------------------------------------------------

def _fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold BN into the conv kernel; kernel HWIO."""
    std = np.sqrt(bn_var + eps)
    t = bn_scale / std
    return kernel * t[None, None, None, :], bn_bias - bn_mean * t


def reparameterize_params(params, batch_stats):
    """Convert train-time RepVGG params to deploy-time fused 3x3 convs.

    Returns a new params pytree where each RepVGGBlock_* contains a single
    `reparam` conv with bias; pair with ``RepVGG(deploy=True)``.  Host-side
    numpy (one-off model-surgery, not a hot path).
    """
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    new_params = {}
    for name, p in params.items():
        if not name.startswith("RepVGGBlock"):
            new_params[name] = p
            continue
        bs = batch_stats[name]
        k3, b3 = _fuse_conv_bn(p["dense_conv"]["kernel"], p["dense_bn"]["scale"],
                               p["dense_bn"]["bias"], bs["dense_bn"]["mean"],
                               bs["dense_bn"]["var"])
        k1, b1 = _fuse_conv_bn(p["one_conv"]["kernel"], p["one_bn"]["scale"],
                               p["one_bn"]["bias"], bs["one_bn"]["mean"],
                               bs["one_bn"]["var"])
        k1_pad = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        kernel = k3 + k1_pad
        bias = b3 + b1
        if "id_bn" in p:
            cin = k3.shape[2]  # per-group input channels (HWIO grouped conv)
            cout = k3.shape[3]
            kid = np.zeros_like(k3)
            # Identity kernel: center tap connecting channel i to itself,
            # laid out per conv group.
            groups = cout // cin if cin else 1
            for o in range(cout):
                kid[1, 1, o % cin, o] = 1.0
            kid, bid = _fuse_conv_bn(kid, p["id_bn"]["scale"], p["id_bn"]["bias"],
                                     bs["id_bn"]["mean"], bs["id_bn"]["var"])
            kernel = kernel + kid
            bias = bias + bid
        new_params[name] = {"reparam": {"kernel": jnp.asarray(kernel),
                                        "bias": jnp.asarray(bias)}}
    return jax.tree_util.tree_map(jnp.asarray, new_params)
