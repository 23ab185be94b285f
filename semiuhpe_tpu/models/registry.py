"""Backbone dispatch — the TPU-native counterpart of ``get_network``
(/root/reference/src/networks.py:15-33).

``build_network(name)`` returns an un-initialized flax Module; all modules
share the call signature ``module.apply(variables, x_nhwc, train=...,
rngs={'dropout': ...}, mutable=['batch_stats'])`` and output (B, 9) Fisher
logits in float32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp


def build_network(name: str, num_outputs: int = 9, dtype: Any = jnp.float32,
                  axis_name: Optional[str] = None, **kw):
    from semiuhpe_tpu.models import efficientnet, efficientnetv2, mobilenet, repvgg, resnet

    common = dict(num_outputs=num_outputs, dtype=dtype, axis_name=axis_name)
    name = name.lower()
    if name == "tiny":
        # Minimal conv net for smoke tests / CI — not a reference backbone.
        from semiuhpe_tpu.models import tiny
        return tiny.tiny_cnn(**common, **kw)
    if name == "mobilenet":
        return mobilenet.mobilenet_v2(**common, **kw)
    if name == "resnet18":
        return resnet.resnet18(**common, **kw)
    if name == "resnet50":
        return resnet.resnet50(**common, **kw)
    if name == "repvgg":
        return repvgg.repvgg_b1g2(**common, **kw)
    if name in ("effinetv2", "efficientnetv2", "effinetv2_s"):
        return efficientnetv2.efficientnetv2_s(**common, **kw)
    if name in ("effinetv2_m",):
        return efficientnetv2.efficientnetv2_m(**common, **kw)
    if name in ("effinetv2_l",):
        return efficientnetv2.efficientnetv2_l(**common, **kw)
    if name.startswith("effinet") or name.startswith("efficientnet_b"):
        variant = name.split("_")[-1] if "_" in name else "b4"
        variant = variant if variant.startswith("b") else "b4"
        return efficientnet.efficientnet(variant=variant, **common, **kw)
    if name == "tinyvit":
        from semiuhpe_tpu.models import tinyvit

        return tinyvit.tiny_vit_21m(**common, **kw)
    if name == "tinyvit_11m":
        from semiuhpe_tpu.models import tinyvit

        return tinyvit.tiny_vit_11m(**common, **kw)
    raise NotImplementedError(f"unknown backbone: {name}")


BACKBONES = (
    "mobilenet", "resnet18", "resnet50", "repvgg", "effinetv2", "effinetv2_m",
    "effinetv2_l", "effinet", "tinyvit", "tinyvit_11m",
)
