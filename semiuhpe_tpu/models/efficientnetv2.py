"""EfficientNetV2 S/M/L — the paper's main backbone family.

Capability parity with /root/reference/src/networks.py:301-331 (torchvision
efficientnet_v2_s with a 1280->512->128->9 regression head).  Stage configs
follow the EfficientNetV2 paper (arXiv 2104.00298) / torchvision.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semiuhpe_tpu.models.layers import ConvBN, FusedMBConv, MBConv, RegressionHead

# (block, expand, kernel, stride, channels, layers, use_se)
_CONFIGS = {
    "s": dict(
        stem=24,
        stages=[
            ("fused", 1, 3, 1, 24, 2, False),
            ("fused", 4, 3, 2, 48, 4, False),
            ("fused", 4, 3, 2, 64, 4, False),
            ("mb", 4, 3, 2, 128, 6, True),
            ("mb", 6, 3, 1, 160, 9, True),
            ("mb", 6, 3, 2, 256, 15, True),
        ],
    ),
    "m": dict(
        stem=24,
        stages=[
            ("fused", 1, 3, 1, 24, 3, False),
            ("fused", 4, 3, 2, 48, 5, False),
            ("fused", 4, 3, 2, 80, 5, False),
            ("mb", 4, 3, 2, 160, 7, True),
            ("mb", 6, 3, 1, 176, 14, True),
            ("mb", 6, 3, 2, 304, 18, True),
            ("mb", 6, 3, 1, 512, 5, True),
        ],
    ),
    "l": dict(
        stem=32,
        stages=[
            ("fused", 1, 3, 1, 32, 4, False),
            ("fused", 4, 3, 2, 64, 7, False),
            ("fused", 4, 3, 2, 96, 7, False),
            ("mb", 4, 3, 2, 192, 10, True),
            ("mb", 6, 3, 1, 224, 19, True),
            ("mb", 6, 3, 2, 384, 25, True),
            ("mb", 6, 3, 1, 640, 7, True),
        ],
    ),
}


class EfficientNetV2(nn.Module):
    variant: str = "s"
    head_hidden: Sequence[int] = (512, 128)
    num_outputs: int = 9
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    # Execute stem + the first N (fused-MBConv) stages in space-to-depth
    # space (ops/s2d.py): exact same math/params, MXU-shaped for the
    # low-channel 224px region.  0 disables.
    s2d_stages: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True, features_only: bool = False):
        from semiuhpe_tpu.ops.s2d import depth_to_space, space_to_depth

        # torchvision EfficientNetV2 uses BN eps 1e-3 (matters when importing
        # pretrained torch weights).
        eps = 1e-3
        cfg = _CONFIGS[self.variant]
        n_fused = sum(1 for st in cfg["stages"] if st[0] == "fused")
        s2d_n = min(self.s2d_stages, n_fused)
        # Every stride-2 point inside the s2d region needs an even block
        # count; all standard sizes (224/96/64) are multiples of 16.
        if x.shape[1] % 16 or x.shape[2] % 16:
            s2d_n = 0
        if s2d_n:
            x = space_to_depth(x)
        x = ConvBN(cfg["stem"], 3, 2, activation=nn.silu, dtype=self.dtype,
                   axis_name=self.axis_name, bn_eps=eps, s2d=s2d_n > 0)(x, train)
        total_blocks = sum(s[5] for s in cfg["stages"])
        block_id = 0
        for i, (kind, expand, kernel, stride, ch, layers, use_se) in \
                enumerate(cfg["stages"]):
            if s2d_n and i == s2d_n:
                x = depth_to_space(x)
            in_s2d = s2d_n > 0 and i < s2d_n
            for j in range(layers):
                rate = self.drop_path_rate * block_id / total_blocks
                s = stride if j == 0 else 1
                if kind == "fused":
                    x = FusedMBConv(ch, expand, kernel, s, drop_rate=rate,
                                    dtype=self.dtype, axis_name=self.axis_name,
                                    bn_eps=eps, s2d=in_s2d)(x, train)
                else:
                    x = MBConv(ch, expand, kernel, s,
                               se_ratio=0.25 if use_se else 0.0, drop_rate=rate,
                               dtype=self.dtype, axis_name=self.axis_name,
                               bn_eps=eps)(x, train)
                block_id += 1
        if s2d_n == len(cfg["stages"]):
            x = depth_to_space(x)
        x = ConvBN(1280, 1, 1, activation=nn.silu, dtype=self.dtype,
                   axis_name=self.axis_name, bn_eps=eps)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:  # pooled trunk features (pretrained-import checks)
            return x
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def _default_s2d_stages() -> int:
    """Space-to-depth execution depth (1 = stem only + N-1 fused stages).

    Default 1 (stem only): A/B'd on quiet TPU v5e at the full SSL step —
    73.6 ms vs 74.3-74.6 baseline, reproduced back-to-back twice
    (BENCH_NOTES.md).  The stem is the one conv where the dense lift has
    no downside: its input-gradient conv is dead code (no gradient flows
    to the image), so only fwd+wgrad pay the 4x-FLOP lift while the
    3-channel pathology (~1-2% MFU) goes away.  Deeper regions were
    A/B'd and REJECTED (90.9 ms at N=2): with dgrad included every
    other lift loses to XLA's native lowering.  SEMIUHPE_S2D_STAGES
    overrides (0 disables).
    """
    import os

    return int(os.environ.get("SEMIUHPE_S2D_STAGES", "1"))


def efficientnetv2_s(**kw):
    kw.setdefault("s2d_stages", _default_s2d_stages())
    return EfficientNetV2(variant="s", **kw)


def efficientnetv2_m(**kw):
    kw.setdefault("s2d_stages", _default_s2d_stages())
    return EfficientNetV2(variant="m", **kw)


def efficientnetv2_l(**kw):
    kw.setdefault("s2d_stages", _default_s2d_stages())
    return EfficientNetV2(variant="l", **kw)
