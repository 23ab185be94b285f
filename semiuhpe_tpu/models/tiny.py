"""Tiny CNN backbone for smoke tests, CI and CPU demos (not in the
reference zoo — kept deliberately small so end-to-end runs compile in
seconds on the virtual CPU mesh)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from semiuhpe_tpu.models.layers import ConvBN, RegressionHead


class TinyCNN(nn.Module):
    widths: Sequence[int] = (16, 32, 64)
    head_hidden: Sequence[int] = (32,)
    num_outputs: int = 9
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for w in self.widths:
            x = ConvBN(w, 3, 2, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return RegressionHead(self.head_hidden, self.num_outputs, dropout=0.1,
                              dtype=self.dtype, axis_name=self.axis_name)(x, train)


def tiny_cnn(**kw):
    return TinyCNN(**kw)
