"""TinyViT pretrained-checkpoint import validation.

Torch twin of the official microsoft/Cream TinyViT module layout (the
checkpoints the reference loads via tiny_vit_21m_224(pretrained=True),
/root/reference/src/networks.py:389-416): Conv2d_BN children named c/bn,
patch_embed.seq.{0,2}, layers.{i}.blocks.{j} with levit-style Attention
(norm/qkv/proj/attention_biases), local_conv, Mlp(norm/fc1/fc2),
layers.{i}.downsample.conv{1,2,3}, norm_head, 1000-class head.  Output
equivalence of the post-norm_head pooled features at 224px exercises
both window-attention paths (28x28/ws7 partitioned, 14x14/ws14 and
7x7/ws7 global)."""

import itertools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semiuhpe_tpu.models import build_network  # noqa: E402
from semiuhpe_tpu.models.convert import import_tinyvit_backbone  # noqa: E402


class _Conv2dBN(tnn.Module):
    def __init__(self, a, b, k=1, s=1, pad=0, groups=1):
        super().__init__()
        self.c = tnn.Conv2d(a, b, k, s, pad, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(b)

    def forward(self, x):
        return self.bn(self.c(x))


class _PatchEmbed(tnn.Module):
    def __init__(self, embed_dim):
        super().__init__()
        self.seq = tnn.Sequential(
            _Conv2dBN(3, embed_dim // 2, 3, 2, 1), tnn.GELU(),
            _Conv2dBN(embed_dim // 2, embed_dim, 3, 2, 1))

    def forward(self, x):
        return self.seq(x)


class _MBConv(tnn.Module):
    def __init__(self, dim, expand=4.0):
        super().__init__()
        h = int(dim * expand)
        self.conv1 = _Conv2dBN(dim, h, 1)
        self.act1 = tnn.GELU()
        self.conv2 = _Conv2dBN(h, h, 3, 1, 1, groups=h)
        self.act2 = tnn.GELU()
        self.conv3 = _Conv2dBN(h, dim, 1)
        self.act3 = tnn.GELU()

    def forward(self, x):
        s = x
        x = self.act1(self.conv1(x))
        x = self.act2(self.conv2(x))
        x = self.conv3(x)
        return self.act3(x + s)


class _PatchMerging(tnn.Module):
    def __init__(self, dim, out_dim):
        super().__init__()
        self.act = tnn.GELU()
        self.conv1 = _Conv2dBN(dim, out_dim, 1)
        self.conv2 = _Conv2dBN(out_dim, out_dim, 3, 2, 1, groups=out_dim)
        self.conv3 = _Conv2dBN(out_dim, out_dim, 1)

    def forward(self, x):
        return self.conv3(self.act(self.conv2(self.act(self.conv1(x)))))


class _Attention(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, resolution):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.scale = key_dim ** -0.5
        h = num_heads * key_dim * 3
        self.norm = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, h)
        self.proj = tnn.Linear(num_heads * key_dim, dim)
        pts = list(itertools.product(range(resolution), range(resolution)))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, len(offsets)))
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(pts), len(pts)))

    def forward(self, x):  # (B, N, C)
        b, n, _ = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(b, n, self.num_heads, -1)
        q, k, v = qkv.split([self.key_dim] * 3, dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.proj(out)


class _Mlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.norm(x))))


class _TinyViTBlock(tnn.Module):
    def __init__(self, dim, num_heads, window_size):
        super().__init__()
        self.ws = window_size
        self.attn = _Attention(dim, dim // num_heads, num_heads, window_size)
        self.local_conv = _Conv2dBN(dim, dim, 3, 1, 1, groups=dim)
        self.mlp = _Mlp(dim, int(dim * 4))

    def forward(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        res = x
        if h == self.ws and w == self.ws:
            x = self.attn(x)
        else:
            x = x.view(b, h, w, c)
            ws = self.ws
            pb, pr = (ws - h % ws) % ws, (ws - w % ws) % ws
            x = torch.nn.functional.pad(x, (0, 0, 0, pr, 0, pb))
            ph, pw = h + pb, w + pr
            nh, nw = ph // ws, pw // ws
            x = (x.view(b, nh, ws, nw, ws, c).transpose(2, 3)
                 .reshape(b * nh * nw, ws * ws, c))
            x = self.attn(x)
            x = (x.view(b, nh, nw, ws, ws, c).transpose(2, 3)
                 .reshape(b, ph, pw, c)[:, :h, :w].reshape(b, n, c))
        x = res + x
        x = x.transpose(1, 2).reshape(b, c, h, w)
        x = self.local_conv(x)
        x = x.view(b, c, n).transpose(1, 2)
        return x + self.mlp(x)


class TorchTinyViT21M(tnn.Module):
    """Official layers.{i}.blocks/downsample layout, 21m config."""

    dims = (96, 192, 384, 576)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 18)
    wss = (7, 7, 14, 7)

    def __init__(self, num_classes=1000):
        super().__init__()
        self.patch_embed = _PatchEmbed(self.dims[0])
        self.layers = tnn.ModuleList()
        for i, d in enumerate(self.depths):
            layer = tnn.Module()
            if i == 0:
                layer.blocks = tnn.ModuleList(
                    [_MBConv(self.dims[0]) for _ in range(d)])
            else:
                layer.blocks = tnn.ModuleList(
                    [_TinyViTBlock(self.dims[i], self.heads[i], self.wss[i])
                     for _ in range(d)])
            if i < len(self.depths) - 1:
                layer.downsample = _PatchMerging(self.dims[i],
                                                 self.dims[i + 1])
            self.layers.append(layer)
        self.norm_head = tnn.LayerNorm(self.dims[-1])
        self.head = tnn.Linear(self.dims[-1], num_classes)

    def forward(self, x, features_only=False):
        x = self.patch_embed(x)
        for i, layer in enumerate(self.layers):
            if i == 0:
                for blk in layer.blocks:
                    x = blk(x)
            else:
                b, c, h, w = x.shape
                t = x.flatten(2).transpose(1, 2)
                for blk in layer.blocks:
                    t = blk(t, (h, w))
                x = t.transpose(1, 2).reshape(b, c, h, w)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x)
        x = x.flatten(2).mean(2)
        x = self.norm_head(x)
        return x if features_only else self.head(x)


def test_tinyvit_21m_official_layout_roundtrip():
    gen = torch.Generator().manual_seed(0)
    tnet = TorchTinyViT21M()
    tnet.eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
            if isinstance(m, _Attention):
                m.attention_biases.normal_(0, 0.2, generator=gen)

    net = build_network("tinyvit", dtype=jnp.float32)
    template = jax.jit(
        lambda k: net.init({"params": k}, jnp.zeros((1, 224, 224, 3)),
                           train=False))(jax.random.key(0))
    variables = import_tinyvit_backbone(template, tnet.state_dict())

    x = np.random.default_rng(1).normal(
        size=(2, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        t_feat = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      features_only=True).numpy()
    f_feat = np.asarray(net.apply(variables, jnp.asarray(x), train=False,
                                  features_only=True))
    np.testing.assert_allclose(f_feat, t_feat, atol=2e-3, rtol=1e-2)


def test_tinyvit_wrong_depths_fails():
    tnet = TorchTinyViT21M()
    net = build_network("tinyvit", dtype=jnp.float32)
    template = net.init({"params": jax.random.key(0)},
                        jnp.zeros((1, 224, 224, 3)), train=False)
    sd = {k: v for k, v in tnet.state_dict().items()
          if "blocks.5" not in k}  # truncate stage 2
    with pytest.raises(ValueError):
        import_tinyvit_backbone(template, sd)
