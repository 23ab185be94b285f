"""Fused Pallas kernel for the strong-view cut-occlusion pipeline.

One VMEM pass per image applies CutOut *and* CutMix together — including
the reference's sequencing subtlety: the reference applies CutOut to the
whole batch first and only then CutMix, so donor pixels already carry the
donor's own CutOut holes (/root/reference/src/agent.py:125-126 calls the
two augs back-to-back).  The fused kernel reproduces that exactly by also
evaluating the *donor's* cutout mask.

Layout: images are viewed as (B, H, W*C) so the lane dimension is W*C
(672 for 224x3 — well tiled); hole masks over x become lane-index masks
via lane // C.  The donor image block is fetched by a scalar-prefetched
index map — the CutMix gather costs no extra HBM pass.

This kernel exists as the template for fusing more of the input pipeline
on-chip; for the current recipe the XLA mask version is already fused into
neighbouring elementwise ops, so both paths are supported and tested
against each other (`tests/test_pallas.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semiuhpe_tpu.ops.augment import HoleParams, sample_holes


def _kernel(donor_idx_ref, cut_ref, mix_ref, img_ref, donor_ref, out_ref,
            *, height: int, width: int, channels: int, n_holes: int):
    b = pl.program_id(0)
    lanes = width * channels
    x_of_lane = jax.lax.broadcasted_iota(jnp.int32, (height, lanes), 1) // channels
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (height, lanes), 0)

    def any_hole(params_ref, row):
        mask = jnp.zeros((height, lanes), jnp.bool_)
        for hole in range(n_holes):
            x0 = params_ref[row, 0, hole]
            x1 = params_ref[row, 1, hole]
            y0 = params_ref[row, 2, hole]
            y1 = params_ref[row, 3, hole]
            mask = mask | ((x_of_lane >= x0) & (x_of_lane < x1)
                           & (y_idx >= y0) & (y_idx < y1))
        return mask

    img = img_ref[0]
    donor = donor_ref[0]

    cut_self = any_hole(cut_ref, b)
    cut_donor = any_hole(cut_ref, donor_idx_ref[b])
    mix_self = any_hole(mix_ref, b)

    zero = jnp.zeros_like(img)
    donor_after_cut = jnp.where(cut_donor, zero, donor)
    self_after_cut = jnp.where(cut_self, zero, img)
    out_ref[0] = jnp.where(mix_self, donor_after_cut, self_after_cut)


def fused_cut_occlusion(images: jnp.ndarray, cut: HoleParams, mix: HoleParams,
                        donor_idx: jnp.ndarray) -> jnp.ndarray:
    """CutOut-then-CutMix in a single fused pass.  images: (B, H, W, C)."""
    b, h, w, c = images.shape
    n_holes = cut.x0.shape[1]
    flat = images.reshape(b, h, w * c)

    def pack(p: HoleParams):
        return jnp.stack([p.x0, p.x1, p.y0, p.y1], 1).astype(jnp.int32)  # (B,4,n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # donor_idx, cut params, mix params
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i, d, cu, mi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w * c), lambda i, d, cu, mi: (d[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i, d, cu, mi: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, height=h, width=w, channels=c,
                               n_holes=n_holes)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        grid_spec=grid_spec,
    )(donor_idx.astype(jnp.int32), pack(cut), pack(mix), flat, flat)
    return out.reshape(b, h, w, c)


def random_fused_cut_occlusion(rng: jax.Array, images: jnp.ndarray,
                               n_holes: int = 3) -> jnp.ndarray:
    """Sampling + fused apply; semantics == random_cutmix(random_cutout(x))
    with the same three rng streams as the unfused path."""
    b, h, w, _ = images.shape
    k_cut, k_mix = jax.random.split(rng)
    cut = sample_holes(k_cut, b, h, w, n_holes)
    k_perm, k_mask = jax.random.split(k_mix)
    mix = sample_holes(k_mask, b, h, w, n_holes)
    donor_idx = jax.random.permutation(k_perm, b)
    return fused_cut_occlusion(images, cut, mix, donor_idx)
