"""Pretrained-backbone import validation against real checkpoint layouts.

The reference initializes trunks from torchvision ``resnet50`` /
``efficientnet_v2_s(weights='DEFAULT')`` and the official
``RepVGG-B1g2-train.pth`` (/root/reference/src/networks.py:301-331,
232-244,443-471).  This environment has no network access and no
torchvision, so these tests validate the converters against *structurally
faithful torch twins*: torch modules reproducing the upstream models'
exact state_dict layout (module registration order, tensor shapes, BN
eps, SE placement, classifier head) with random weights.  Output
equivalence of the pooled trunk features proves every one of the
~270/~500 trunk tensors landed in the right flax slot with the right
layout transpose — the silent-misalignment failure mode ordered matching
is prone to.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semiuhpe_tpu.models import build_network  # noqa: E402
from semiuhpe_tpu.models.convert import (  # noqa: E402
    import_repvgg_backbone,
    import_torch_backbone,
    module_registration_order,
)


def _randomize_bn_stats(module, gen):
    """Give every BN non-trivial running stats so eval output depends on
    them (a stats misalignment then breaks output equivalence loudly)."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)


# ---------------------------------------------------------------------------
# torchvision resnet50 twin (Bottleneck layout, fc head)
# ---------------------------------------------------------------------------

class _TorchBottleneck(tnn.Module):
    """torchvision.models.resnet.Bottleneck registration order:
    conv1,bn1,conv2,bn2,conv3,bn3,(downsample) — stride on conv2."""

    def __init__(self, inplanes, width, stride=1):
        super().__init__()
        out = width * 4
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchResNet50(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, (blocks, width) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512))):
            layers = []
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                layers.append(_TorchBottleneck(inplanes, width, stride))
                inplanes = width * 4
            setattr(self, f"layer{i + 1}", tnn.Sequential(*layers))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x, features_only=False):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        return x if features_only else self.fc(x)


# ---------------------------------------------------------------------------
# torchvision efficientnet_v2_s twin (features.0..8, classifier head)
# ---------------------------------------------------------------------------

def _conv_bn_act(cin, cout, k, s, groups=1, act=True):
    """torchvision Conv2dNormActivation: conv(bias=False), BN(eps 1e-3),
    optional SiLU."""
    mods = [tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(cout, eps=1e-3)]
    if act:
        mods.append(tnn.SiLU(inplace=True))
    return tnn.Sequential(*mods)


class _TorchSE(tnn.Module):
    """torchvision SqueezeExcitation: avgpool/fc1/fc2 registration order,
    SiLU activation, sigmoid scale."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc1 = tnn.Conv2d(channels, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, channels, 1)
        self.activation = tnn.SiLU(inplace=True)
        self.scale_activation = tnn.Sigmoid()

    def forward(self, x):
        s = self.fc2(self.activation(self.fc1(self.avgpool(x))))
        return x * self.scale_activation(s)


class _TorchFusedMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, stride):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        hidden = cin * expand
        if expand != 1:
            self.block = tnn.Sequential(
                _conv_bn_act(cin, hidden, 3, stride),
                _conv_bn_act(hidden, cout, 1, 1, act=False))
        else:
            self.block = tnn.Sequential(_conv_bn_act(cin, cout, 3, stride))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _TorchMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, stride):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        hidden = cin * expand
        self.block = tnn.Sequential(
            _conv_bn_act(cin, hidden, 1, 1),
            _conv_bn_act(hidden, hidden, 3, stride, groups=hidden),
            _TorchSE(hidden, max(1, cin // 4)),
            _conv_bn_act(hidden, cout, 1, 1, act=False))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


# (block, expand, stride, channels, layers) — efficientnet_v2_s config.
_V2S_STAGES = [
    ("fused", 1, 1, 24, 2),
    ("fused", 4, 2, 48, 4),
    ("fused", 4, 2, 64, 4),
    ("mb", 4, 2, 128, 6),
    ("mb", 6, 1, 160, 9),
    ("mb", 6, 2, 256, 15),
]


class TorchEffNetV2S(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        feats = [_conv_bn_act(3, 24, 3, 2)]
        cin = 24
        for kind, expand, stride, cout, layers in _V2S_STAGES:
            stage = []
            for j in range(layers):
                s = stride if j == 0 else 1
                cls = _TorchFusedMBConv if kind == "fused" else _TorchMBConv
                stage.append(cls(cin, cout, expand, s))
                cin = cout
            feats.append(tnn.Sequential(*stage))
        feats.append(_conv_bn_act(cin, 1280, 1, 1))
        self.features = tnn.Sequential(*feats)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2),
                                         tnn.Linear(1280, num_classes))

    def forward(self, x, features_only=False):
        x = torch.flatten(self.avgpool(self.features(x)), 1)
        return x if features_only else self.classifier(x)


# ---------------------------------------------------------------------------
# official RepVGG-B1g2 twin (train-mode branches, linear head)
# ---------------------------------------------------------------------------

class _TorchRepVGGBlock(tnn.Module):
    """Official RepVGGBlock registration order: rbr_identity (BN) first,
    then rbr_dense (conv+bn), then rbr_1x1 — the order our name-mapped
    converter exists to handle."""

    def __init__(self, cin, cout, stride=1, groups=1):
        super().__init__()
        self.nonlinearity = tnn.ReLU()
        self.rbr_identity = (tnn.BatchNorm2d(cin)
                             if cout == cin and stride == 1 else None)
        self.rbr_dense = _conv_bn_named(cin, cout, 3, stride, 1, groups)
        self.rbr_1x1 = _conv_bn_named(cin, cout, 1, stride, 0, groups)

    def forward(self, x):
        y = self.rbr_dense(x) + self.rbr_1x1(x)
        if self.rbr_identity is not None:
            y = y + self.rbr_identity(x)
        return self.nonlinearity(y)


class _conv_bn_named(tnn.Module):
    """Official conv_bn helper: children named 'conv' and 'bn'."""

    def __init__(self, cin, cout, k, stride, pad, groups):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, pad, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TorchRepVGGB1g2(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        widths = (64, 128, 256, 512, 2048)
        depths = (4, 6, 16, 1)
        g2_layers = set(range(2, 27, 2))
        self.stage0 = _TorchRepVGGBlock(3, widths[0], stride=2)
        cin, layer_idx = widths[0], 1
        for s, (w, d) in enumerate(zip(widths[1:], depths), start=1):
            blocks = []
            for j in range(d):
                stride = 2 if j == 0 else 1
                groups = 2 if layer_idx in g2_layers else 1
                blocks.append(_TorchRepVGGBlock(cin, w, stride, groups))
                cin = w
                layer_idx += 1
            setattr(self, f"stage{s}", tnn.Sequential(*blocks))
        self.gap = tnn.AdaptiveAvgPool2d(1)
        self.linear = tnn.Linear(widths[-1], num_classes)

    def forward(self, x, features_only=False):
        x = self.stage0(x)
        for s in range(1, 5):
            x = getattr(self, f"stage{s}")(x)
        x = torch.flatten(self.gap(x), 1)
        return x if features_only else self.linear(x)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _trunk_equivalence(torch_net, flax_name, size, atol,
                       importer=None, n=2):
    gen = torch.Generator().manual_seed(0)
    torch_net.eval()
    _randomize_bn_stats(torch_net, gen)

    net = build_network(flax_name, dtype=jnp.float32)
    # Template from a JITTED init: keys arrive alphabetically re-sorted —
    # the exact condition that silently misaligned the round-1 converter.
    template = jax.jit(
        lambda k: net.init({"params": k},
                           jnp.zeros((1, size, size, 3)), train=False)
    )(jax.random.key(0))
    if importer is None:
        variables = import_torch_backbone(
            net, template, torch_net.state_dict(), (size, size, 3))
    else:
        variables = importer(template, torch_net.state_dict())

    x = np.random.default_rng(1).normal(
        size=(n, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           features_only=True).numpy()
    f_feat = np.asarray(
        net.apply(variables, jnp.asarray(x), train=False,
                  features_only=True))
    np.testing.assert_allclose(f_feat, t_feat, atol=atol, rtol=1e-3)
    # Head must be untouched (fresh N(0,0.01) init, not torch classifier).
    for a, b in zip(
            jax.tree_util.tree_leaves(template["params"]["RegressionHead_0"]),
            jax.tree_util.tree_leaves(variables["params"]["RegressionHead_0"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resnet50_torchvision_layout_roundtrip():
    _trunk_equivalence(TorchResNet50(), "resnet50", 64, atol=2e-4)


def test_efficientnet_v2_s_torchvision_layout_roundtrip():
    _trunk_equivalence(TorchEffNetV2S(), "effinetv2", 64, atol=5e-4)


def test_repvgg_b1g2_official_layout_roundtrip():
    _trunk_equivalence(TorchRepVGGB1g2(), "repvgg", 64, atol=2e-4,
                       importer=import_repvgg_backbone)


def test_tensor_count_audit_efficientnet_v2_s():
    """Trunk tensor counts agree exactly (the strict check that catches a
    missing/extra block before any silent zip truncation)."""
    tnet = TorchEffNetV2S()
    sd = {k: v for k, v in tnet.state_dict().items()
          if not k.startswith("classifier.")
          and not k.endswith("num_batches_tracked")}
    n_params = sum(1 for k in sd
                   if not k.endswith(("running_mean", "running_var")))
    n_stats = len(sd) - n_params

    net = build_network("effinetv2", dtype=jnp.float32)
    order = module_registration_order(net, (64, 64, 3))
    f_params = [p for p in order["params"] if p[0] != "RegressionHead_0"]
    f_stats = [p for p in order["batch_stats"] if p[0] != "RegressionHead_0"]
    assert len(f_params) == n_params == 450
    assert len(f_stats) == n_stats == 220


def test_misaligned_architecture_raises():
    """A checkpoint from the wrong variant must fail loudly."""
    tnet = TorchResNet50()
    net = build_network("effinetv2", dtype=jnp.float32)
    template = net.init({"params": jax.random.key(0)},
                        jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError):
        import_torch_backbone(net, template, tnet.state_dict(), (64, 64, 3))


def test_pretrained_into_state_hits_student_and_teacher():
    """--pretrained must initialize BOTH nets' trunks (reference loads
    pretrained weights in each of the two get_network calls) while the two
    heads keep their independent fresh inits."""
    from semiuhpe_tpu.models.convert import pretrained_into_state
    from semiuhpe_tpu.training.state import create_train_state

    tnet = TorchResNet50()
    tnet.eval()
    net = build_network("resnet50", dtype=jnp.float32)
    state = jax.jit(
        lambda k: create_train_state(net, k, (64, 64, 3), 1e-4)
    )(jax.random.key(0))
    new = pretrained_into_state(jax.device_get(state), net,
                                tnet.state_dict(), (64, 64, 3), "resnet50")

    w = tnet.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(new.params["ConvBN_0"]["Conv_0"]["kernel"]), w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.ema_params["ConvBN_0"]["Conv_0"]["kernel"]), w, atol=1e-6)
    # Heads: untouched and still independent between student and teacher.
    h = np.asarray(new.params["RegressionHead_0"]["Dense_0"]["kernel"])
    he = np.asarray(new.ema_params["RegressionHead_0"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(
        h, np.asarray(state.params["RegressionHead_0"]["Dense_0"]["kernel"]))
    assert np.abs(h - he).max() > 0


def test_registration_order_differs_from_sorted_order():
    """Meta-test: the condition that motivated order recapture is real —
    a jitted template's key order differs from registration order."""
    net = build_network("effinetv2", dtype=jnp.float32)
    order = module_registration_order(net, (64, 64, 3))["params"]
    assert order != sorted(order)
    tops = []
    for p in order:
        if p[0] not in tops:
            tops.append(p[0])
    # Head conv (ConvBN_1) registers AFTER all blocks, despite sorting
    # right after the stem alphabetically.
    assert tops[-2:] == ["ConvBN_1", "RegressionHead_0"]
