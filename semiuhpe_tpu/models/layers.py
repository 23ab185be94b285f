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


class ConvS2D(nn.Module):
    """Conv executed in space-to-depth space (ops/s2d.py).

    The parameter keeps the ORIGINAL (k, k, Cin, Cout) shape and the
    standard flax name/init, so checkpoints and pretrained importers are
    identical to the plain ``nn.Conv`` path; only execution differs.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from semiuhpe_tpu.ops.s2d import s2d_conv

        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, cin, self.features),
            jnp.float32)
        return s2d_conv(x.astype(self.dtype), kernel.astype(self.dtype),
                        self.strides)


class BatchNormS2D(nn.Module):
    """BatchNorm over an s2d tensor with original per-channel semantics.

    Parameters/stats match ``nn.BatchNorm`` exactly in name, shape and
    meaning (scale/bias + running mean/var over the ORIGINAL channels):
    batch statistics pool the 4 phase groups, which is identical to the
    plain BN statistics of the un-s2d tensor.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        import jax

        from semiuhpe_tpu.ops.s2d import phase_tile, s2d_batch_stats

        c4 = x.shape[-1]
        c = c4 // 4
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, meansq = s2d_batch_stats(x)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                meansq = jax.lax.pmean(meansq, self.axis_name)
            var = meansq - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        shift = (bias - mean * scale
                 * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return (x.astype(self.dtype) * phase_tile(mul, c4)
                + phase_tile(shift, c4))


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional activation (NHWC).

    ``s2d=True`` executes on space-to-depth tensors (B, H/2, W/2, 4C)
    with identical parameters and math (ops/s2d.py) — the TPU MXU-shaping
    path for the zoo's low-channel early stages.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    activation: Optional[Callable] = nn.relu
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    padding: Optional[int] = None
    bn_eps: float = 1e-5
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.s2d:
            assert self.groups == 1 and self.padding is None, \
                "s2d execution supports dense same-padded convs only"
            x = ConvS2D(self.features, self.kernel_size, self.strides,
                        dtype=self.dtype, name="Conv_0")(x)
            x = BatchNormS2D(momentum=0.9, epsilon=self.bn_eps,
                             dtype=self.dtype,
                             axis_name=self.axis_name if train else None,
                             name="BatchNorm_0")(x, use_running_average=not train)
            if self.activation is not None:
                x = self.activation(x)
            return x
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


class _RawBN(nn.Module):
    """Declares nn.BatchNorm's variables (params scale/bias, batch_stats
    mean/var — same names, shapes, dtypes, inits) WITHOUT computing: the
    Pallas fused-MBConv path consumes the raw coefficients.  Name this
    module "BatchNorm_0" inside a ConvBN-shaped scope and the parameter
    tree is byte-identical to the unfused path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,),
                                               jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,),
                                             jnp.float32))
        return scale, bias, mean, var


class _RawConvParams(nn.Module):
    """Declares nn.Conv's parameters (kernel [+ bias], same names/inits)
    without running the convolution."""

    shape: Sequence[int]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            tuple(self.shape), jnp.float32)
        if not self.use_bias:
            return kernel
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[-1],), jnp.float32)
        return kernel, bias


class _ExpandRawBN(nn.Module):
    """ConvBN-shaped scope where the 1x1 conv RUNS (XLA matmul) but the
    BatchNorm is returned raw for the Pallas middle to apply."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (1, 1), strides=(1, 1),
                    padding=[(0, 0), (0, 0)], use_bias=False,
                    dtype=self.dtype, name="Conv_0")(x)
        bn = _RawBN(self.features, name="BatchNorm_0")()
        return y, bn


class _DWRawBN(nn.Module):
    """ConvBN-shaped scope for the depthwise conv: kernel and BN both
    declared raw (the Pallas middle executes them)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = _RawConvParams((self.kernel_size, self.kernel_size, 1,
                            self.features), name="Conv_0")()
        bn = _RawBN(self.features, name="BatchNorm_0")()
        return k, bn


class _SERawParams(nn.Module):
    """SqueezeExcite-shaped scope declaring both 1x1 convs raw."""

    in_features: int
    se_features: int

    @nn.compact
    def __call__(self):
        k1, b1 = _RawConvParams((1, 1, self.in_features, self.se_features),
                                use_bias=True, name="Conv_0")()
        k2, b2 = _RawConvParams((1, 1, self.se_features, self.in_features),
                                use_bias=True, name="Conv_1")()
        return (k1.reshape(self.in_features, self.se_features), b1,
                k2.reshape(self.se_features, self.in_features), b2)


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
    """Inverted residual with depthwise conv (+SE), silu activation.

    ``pallas`` selects the fused-middle execution path
    (ops/pallas_mbconv.py): the BN+silu+dw3x3+BN+silu+SE chain between
    the two 1x1 matmuls runs as two Pallas kernels (one HBM pass per
    direction each) instead of XLA's many elementwise/reduce passes.
    None (default) resolves via SEMIUHPE_PALLAS_MBCONV / backend
    autodetection; parameters, batch stats and init are byte-identical
    across both paths, so checkpoints/importers/EMA are unaffected.
    Requires silu activation (the kernels hard-code it)."""

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
    pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from semiuhpe_tpu.ops import pallas_mbconv as pm

        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        residual = x
        use_pallas = (self.pallas if self.pallas is not None
                      else pm.pallas_mbconv_enabled())
        use_pallas = (
            use_pallas and self.expand_ratio != 1
            and self.activation is nn.silu
            and pm.fused_middle_supported(
                (x.shape[0], x.shape[1], x.shape[2], hidden),
                self.strides, self.se_ratio > 0, self.kernel_size))
        if use_pallas:
            h_raw, bn1 = _ExpandRawBN(hidden, dtype=self.dtype,
                                      name="ConvBN_0")(x)
            dw_k, bn2 = _DWRawBN(hidden, self.kernel_size,
                                 name="ConvBN_1")()
            se_feats = max(1, int(inp * self.se_ratio))
            w1, c1, w2, c2 = _SERawParams(hidden, se_feats,
                                          name="SqueezeExcite_0")()
            s1, b1, m1, v1 = bn1
            s2, b2, m2, v2 = bn2
            x, new1, new2 = pm.mbconv_middle(
                h_raw, dw_k.astype(self.dtype),
                dict(scale=s1, bias=b1, mean=m1.value, var=v1.value),
                dict(scale=s2, bias=b2, mean=m2.value, var=v2.value),
                (w1.astype(self.dtype), c1, w2.astype(self.dtype), c2),
                train=train, eps=self.bn_eps, momentum=0.9)
            if train and not self.is_initializing():
                m1.value, v1.value = new1
                m2.value, v2.value = new2
            x = ConvBN(self.features, 1, 1, activation=None,
                       dtype=self.dtype, axis_name=self.axis_name,
                       bn_eps=self.bn_eps, name="ConvBN_2")(x, train)
        else:
            if self.expand_ratio != 1:
                x = ConvBN(hidden, 1, 1, activation=self.activation,
                           dtype=self.dtype, axis_name=self.axis_name,
                           bn_eps=self.bn_eps)(x, train)
            x = ConvBN(hidden, self.kernel_size, self.strides, groups=hidden,
                       activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps)(x, train)
            if self.se_ratio > 0:
                x = SqueezeExcite(max(1, int(inp * self.se_ratio)),
                                  dtype=self.dtype)(x)
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
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        residual = x
        if self.expand_ratio != 1:
            x = ConvBN(hidden, self.kernel_size, self.strides,
                       activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps,
                       s2d=self.s2d)(x, train)
            x = ConvBN(self.features, 1, 1, activation=None, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps,
                       s2d=self.s2d)(x, train)
        else:
            x = ConvBN(self.features, self.kernel_size, self.strides,
                       activation=self.activation, dtype=self.dtype,
                       axis_name=self.axis_name, bn_eps=self.bn_eps,
                       s2d=self.s2d)(x, train)
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
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, kernel_init=kinit, dtype=self.dtype)(x)
            if i == len(self.hidden) - 1:
                # Explicit handle on the penultimate feature (the last
                # hidden Dense's pre-BN output) — what the reference's
                # save_feat forward hook captures (agent.py:376-381, e.g.
                # 'fc.4').  Sown here so consumers never have to guess the
                # head's position or Dense nesting from intermediates.
                self.sow("intermediates", "penultimate_feature", x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
            x = relu6(x)
        if not self.hidden:
            self.sow("intermediates", "penultimate_feature", x)
        x = nn.Dense(self.num_outputs, kernel_init=kinit, dtype=jnp.float32)(x)
        return x
