"""pytorchcv EfficientNet (v1) pretrained-import validation.

Torch twin of the pytorchcv "efficientnet_b4b" module layout the
reference loads (/root/reference/src/networks.py:359-374):
features.init_block.conv.{conv,bn}, spatial stages
features.stage{s}.unit{u} (EffiDwsConvUnit dw_conv/se/pw_conv for the
expand=1 stage, EffiInvResUnit conv1/conv2/se/conv3 otherwise, stages
split at stride-2 blocks), features.final_block.{conv,bn}, output head.
Random weights; pooled trunk feature equivalence at 64px over all 32
b4 blocks."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semiuhpe_tpu.models import build_network  # noqa: E402
from semiuhpe_tpu.models.convert import import_pytorchcv_efficientnet  # noqa: E402
from semiuhpe_tpu.models.efficientnet import (  # noqa: E402
    _round_channels, _round_repeats, _BASE, _SCALES)


class _ConvBlock(tnn.Module):
    def __init__(self, cin, cout, k, s, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return tnn.functional.silu(self.bn(self.conv(x)))


class _SE(tnn.Module):
    def __init__(self, channels, squeeze):
        super().__init__()
        self.conv1 = tnn.Conv2d(channels, squeeze, 1)
        self.conv2 = tnn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv2(tnn.functional.silu(self.conv1(s)))
        return x * torch.sigmoid(s)


class _DwsUnit(tnn.Module):
    """expand=1: dw -> SE -> pw (no activation after pw)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.dw_conv = _ConvBlock(cin, cin, k, 1, groups=cin)
        self.se = _SE(cin, max(1, cin // 4))
        self.pw_conv = _PwBlock(cin, cout)
        self.res = cin == cout

    def forward(self, x):
        y = self.pw_conv(self.se(self.dw_conv(x)))
        return x + y if self.res else y


class _PwBlock(tnn.Module):
    """1x1 conv + BN, NO activation (project)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class _InvResUnit(tnn.Module):
    def __init__(self, cin, cout, k, s, expand):
        super().__init__()
        mid = cin * expand
        self.conv1 = _ConvBlock(cin, mid, 1, 1)
        self.conv2 = _ConvBlock(mid, mid, k, s, groups=mid)
        self.se = _SE(mid, max(1, cin // 4))
        self.conv3 = _PwBlock(mid, cout)
        self.res = s == 1 and cin == cout

    def forward(self, x):
        y = self.conv3(self.se(self.conv2(self.conv1(x))))
        return x + y if self.res else y


class TorchEffNetB4(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        wm, dm = _SCALES["b4"]
        strides = (1, 2, 2, 2, 1, 2, 1)
        init_block = tnn.Module()
        init_block.conv = _ConvBlock(3, _round_channels(32, wm), 3, 2)
        features = tnn.Module()
        features.init_block = init_block
        cin = _round_channels(32, wm)
        stage_mods, stage = [], None
        for (expand, ch, repeats, _, k), s in zip(_BASE, strides):
            cout = _round_channels(ch, wm)
            for j in range(_round_repeats(repeats, dm)):
                if j == 0 and (s == 2 or stage is None):
                    stage = tnn.Module()
                    stage._units = []
                    stage_mods.append(stage)
                stride = s if j == 0 else 1
                if expand == 1:
                    u = _DwsUnit(cin, cout, k)
                else:
                    u = _InvResUnit(cin, cout, k, stride, expand)
                setattr(stage, f"unit{len(stage._units) + 1}", u)
                stage._units.append(u)
                cin = cout
        for i, st in enumerate(stage_mods):
            setattr(features, f"stage{i + 1}", st)
        final_block = _PwBlock(cin, _round_channels(1280, wm))
        features.final_block = final_block
        self.features = features
        self.output = tnn.Linear(_round_channels(1280, wm), num_classes)
        self._stages = stage_mods
        self._final = final_block

    def forward(self, x, features_only=False):
        x = self.features.init_block.conv(x)
        for st in self._stages:
            for u in st._units:
                x = u(x)
        x = tnn.functional.silu(self._final(x))
        x = x.mean((2, 3))
        return x if features_only else self.output(x)


def test_b4_pytorchcv_layout_roundtrip():
    gen = torch.Generator().manual_seed(0)
    tnet = TorchEffNetB4()
    tnet.eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)

    net = build_network("effinet", dtype=jnp.float32)
    template = jax.jit(
        lambda k: net.init({"params": k}, jnp.zeros((1, 64, 64, 3)),
                           train=False))(jax.random.key(0))
    variables = import_pytorchcv_efficientnet(template, tnet.state_dict())

    x = np.random.default_rng(1).normal(
        size=(2, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        t_feat = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      features_only=True).numpy()
    f_feat = np.asarray(net.apply(variables, jnp.asarray(x), train=False,
                                  features_only=True))
    np.testing.assert_allclose(f_feat, t_feat, atol=1e-3, rtol=1e-2)


def test_b4_stage_unit_numbering_covers_all_blocks():
    """The stride-split stage/unit numbering must consume every torch unit
    (b4: 32 blocks over 5 spatial stages)."""
    tnet = TorchEffNetB4()
    names = {k.split(".")[1] + "." + k.split(".")[2]
             for k in tnet.state_dict() if k.startswith("features.stage")}
    per_stage = {}
    for n in names:
        s, u = n.split(".")
        per_stage.setdefault(s, set()).add(u)
    assert sorted(per_stage) == [f"stage{i}" for i in range(1, 6)]
    assert sum(len(v) for v in per_stage.values()) == 32
