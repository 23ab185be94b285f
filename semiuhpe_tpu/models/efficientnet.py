"""EfficientNet B0-B7 (v1) backbones with regression head.

Capability parity with /root/reference/src/networks.py:359-386 (pytorchcv
efficientnet_b4b with out_dim->512->128->9 head).  Standard compound-scaled
MBConv architecture (arXiv 1905.11946).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semiuhpe_tpu.models.layers import ConvBN, MBConv, RegressionHead

# width_mult, depth_mult per variant (resolution is whatever the crop is).
_SCALES = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}
# base config: (expand, channels, repeats, stride, kernel)
_BASE = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_channels(c, width_mult, divisor=8):
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r, depth_mult):
    return int(math.ceil(depth_mult * r))


class EfficientNet(nn.Module):
    variant: str = "b4"
    head_hidden: Sequence[int] = (512, 128)
    num_outputs: int = 9
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, features_only: bool = False):
        wm, dm = _SCALES[self.variant]
        x = ConvBN(_round_channels(32, wm), 3, 2, activation=nn.silu,
                   dtype=self.dtype, axis_name=self.axis_name)(x, train)
        total = sum(_round_repeats(r, dm) for _, _, r, _, _ in _BASE)
        block_id = 0
        for expand, ch, repeats, stride, kernel in _BASE:
            out_c = _round_channels(ch, wm)
            for j in range(_round_repeats(repeats, dm)):
                rate = self.drop_path_rate * block_id / total
                x = MBConv(out_c, expand, kernel, stride if j == 0 else 1,
                           se_ratio=0.25, drop_rate=rate,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
                block_id += 1
        x = ConvBN(_round_channels(1280, wm), 1, 1, activation=nn.silu,
                   dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if features_only:  # pooled trunk features (pretrained-import checks)
            return x
        x = RegressionHead(self.head_hidden, self.num_outputs, dropout=0.2,
                           dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


def efficientnet(variant="b4", **kw):
    return EfficientNet(variant=variant, **kw)
