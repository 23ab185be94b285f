"""On-device batched augmentations: pose-irrelevant cut-occlusion.

TPU-native re-design of /root/reference/src/augments.py (random_cutout_tensor
/ random_cutmix_tensor): the reference fills rectangles with a Python loop
over batch x holes on GPU tensors; here the same distributions (3 holes,
centers ~ N(image_center, size/6), half-extents ~ U[10, 20)) drive fully
vectorized masks built from broadcasted iotas — a handful of fused
elementwise kernels under jit, no loops, no dynamic shapes.

Structure: ``sample_holes`` draws the hole geometry (and the CutMix donor
permutation) from an explicit rng; ``apply_cutout`` / ``apply_cutmix``
consume it.  The same sampled parameters feed the fused Pallas kernel in
``ops.pallas_augment`` so both implementations are bit-comparable.

Images are NHWC, already normalized; fill value 0 equals the reference's
zero-fill on normalized tensors (ImageNet-mean gray).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class HoleParams(NamedTuple):
    x0: jnp.ndarray  # (B, n_holes) int32
    x1: jnp.ndarray
    y0: jnp.ndarray
    y1: jnp.ndarray


def sample_holes(rng: jax.Array, batch: int, height: int, width: int,
                 n_holes: int = 3, base_size: int = 224) -> HoleParams:
    """Reference hole distribution: centers ~ N(image_center, dim/6),
    half-extents ~ U[10, 20) *at the reference's 224px crop size*
    (/root/reference/src/augments.py:12-35 hard-codes 10-20px because it
    only ever sees 224px inputs).  The occlusion is resolution-proportional
    here: half-extents scale by min(h, w)/base_size, so a 96px smoke crop
    gets ~4-9px holes with the same relative coverage instead of holes
    spanning 40% of the face.  At 224px this is bit-identical to the
    reference bounds."""
    k_cx, k_cy, k_sz = jax.random.split(rng, 3)
    cx = (jax.random.normal(k_cx, (batch, n_holes)) * (width / 6.0)
          + width / 2.0).astype(jnp.int32)
    cy = (jax.random.normal(k_cy, (batch, n_holes)) * (height / 6.0)
          + height / 2.0).astype(jnp.int32)
    scale = min(height, width) / float(base_size)
    lo = max(1, round(10 * scale))
    hi = max(lo + 1, round(20 * scale))
    size = jax.random.randint(k_sz, (batch, n_holes, 2), lo, hi)
    return HoleParams(
        x0=jnp.clip(cx - size[..., 0], 0, width),
        x1=jnp.clip(cx + size[..., 0], 0, width),
        y0=jnp.clip(cy - size[..., 1], 0, height),
        y1=jnp.clip(cy + size[..., 1], 0, height),
    )


def hole_mask(holes: HoleParams, height: int, width: int) -> jnp.ndarray:
    """(B, H, W, 1) boolean mask, True inside any hole."""
    x0 = holes.x0[:, :, None, None]
    x1 = holes.x1[:, :, None, None]
    y0 = holes.y0[:, :, None, None]
    y1 = holes.y1[:, :, None, None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, height, width), 3)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, height, width), 2)
    inside = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)  # (B, holes, H, W)
    return jnp.any(inside, axis=1)[..., None]


def apply_cutout(images: jnp.ndarray, holes: HoleParams) -> jnp.ndarray:
    b, h, w, _ = images.shape
    mask = hole_mask(holes, h, w)
    return jnp.where(mask, jnp.zeros_like(images), images)


def apply_cutmix(images: jnp.ndarray, holes: HoleParams,
                 donor_idx: jnp.ndarray) -> jnp.ndarray:
    b, h, w, _ = images.shape
    mask = hole_mask(holes, h, w)
    donors = jnp.take(images, donor_idx, axis=0)
    return jnp.where(mask, donors, images)


def random_cutout(rng: jax.Array, images: jnp.ndarray, n_holes: int = 3) -> jnp.ndarray:
    """Zero-fill random rectangles (CutOut, arXiv 1708.04552)."""
    b, h, w, _ = images.shape
    return apply_cutout(images, sample_holes(rng, b, h, w, n_holes))


def random_cutmix(rng: jax.Array, images: jnp.ndarray, n_holes: int = 3) -> jnp.ndarray:
    """Fill random rectangles from a random batch permutation (CutMix,
    arXiv 1905.04899) — the occluder is another head crop, which is the
    paper's pose-irrelevant occlusion."""
    b, h, w, _ = images.shape
    k_perm, k_mask = jax.random.split(rng)
    holes = sample_holes(k_mask, b, h, w, n_holes)
    donor_idx = jax.random.permutation(k_perm, b)
    return apply_cutmix(images, holes, donor_idx)
