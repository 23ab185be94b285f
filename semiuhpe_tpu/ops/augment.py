"""On-device batched augmentations: pose-irrelevant cut-occlusion.

TPU-native re-design of /root/reference/src/augments.py (random_cutout_tensor
/ random_cutmix_tensor): the reference fills rectangles with a Python loop
over batch x holes on GPU tensors; here the same distributions (3 holes,
centers ~ N(image_center, size/6), half-extents ~ U[10, 20)) drive a fully
vectorized mask built from broadcasted iotas, so the whole op is a handful
of fused elementwise kernels under jit — no loops, no dynamic shapes.

Images are NHWC, already normalized; fill value 0 equals the reference's
zero-fill on normalized tensors (ImageNet-mean gray).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hole_mask(rng, batch, height, width, n_holes, dtype):
    """(B, H, W, 1) mask that is True inside any of the sampled holes."""
    k_cx, k_cy, k_sz = jax.random.split(rng, 3)
    cx = jax.random.normal(k_cx, (batch, n_holes)) * (width / 6.0) + width / 2.0
    cy = jax.random.normal(k_cy, (batch, n_holes)) * (height / 6.0) + height / 2.0
    cx = cx.astype(jnp.int32)
    cy = cy.astype(jnp.int32)
    size = jax.random.randint(k_sz, (batch, n_holes, 2), 10, 20)

    x0 = jnp.clip(cx - size[..., 0], 0, width)[:, :, None, None]
    x1 = jnp.clip(cx + size[..., 0], 0, width)[:, :, None, None]
    y0 = jnp.clip(cy - size[..., 1], 0, height)[:, :, None, None]
    y1 = jnp.clip(cy + size[..., 1], 0, height)[:, :, None, None]

    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, height, width), 3)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, height, width), 2)
    inside = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)  # (B, holes, H, W)
    return jnp.any(inside, axis=1)[..., None]  # (B, H, W, 1)


def random_cutout(rng: jax.Array, images: jnp.ndarray, n_holes: int = 3) -> jnp.ndarray:
    """Zero-fill random rectangles (CutOut, arXiv 1708.04552)."""
    b, h, w, _ = images.shape
    mask = _hole_mask(rng, b, h, w, n_holes, images.dtype)
    return jnp.where(mask, jnp.zeros_like(images), images)


def random_cutmix(rng: jax.Array, images: jnp.ndarray, n_holes: int = 3) -> jnp.ndarray:
    """Fill random rectangles from a random batch permutation (CutMix,
    arXiv 1905.04899) — the occluder is another head crop, which is the
    paper's pose-irrelevant occlusion."""
    b, h, w, _ = images.shape
    k_perm, k_mask = jax.random.split(rng)
    mask = _hole_mask(k_mask, b, h, w, n_holes, images.dtype)
    donors = jnp.take(images, jax.random.permutation(k_perm, b), axis=0)
    return jnp.where(mask, donors, images)
