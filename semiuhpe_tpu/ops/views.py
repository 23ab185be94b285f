"""On-device weak/strong view generation from raw uint8 head crops.

At ~2k imgs/sec device speed the host loader's per-sample PIL work
(RandomResizedCrop x2, rotation, normalization, float conversion) is the
training bottleneck (BENCH_NOTES.md).  This module moves the whole view
pipeline after the head crop onto the TPU: the loader ships ONE uint8
(S, S, 3) base crop per sample (4x smaller transfer, ~3x less host work)
and the device produces both views inside the train step:

* weak: RandomResizedCrop scale (0.8, 1.25) ratio 1:1 + 5% PIL BLUR
  (exact 5x5 ring kernel, see ``_pil_blur``);
* strong: optional pose-altering rotation U(-30, 30) deg (bilinear affine
  warp about the center, zero fill — PIL rotate+recrop semantics) +
  RandomResizedCrop scale (0.6, 1.5);
* ImageNet normalization.

Semantics match data/augments_host.py statistically (bilinear resampling
instead of PIL's; the label algebra — ``aug_rot_mat_z`` per sampled angle
— is identical and covered by tests).  The RRC here never needs the
attempt-loop: with ratio 1:1 on a square input every side <= S is valid,
so side = S * sqrt(clip(area_frac, 0, 1)) with the >1 fallback being the
full frame, exactly torchvision's fallback behavior.

Relative measurements (v5e, b128 @224, in-jit scan; round-1 absolute ms
were under-synced — see BENCH_NOTES.md): blur+RRC x2+normalize is a few
ms/batch, ~2 orders faster than gather-based warps; host-side per-sample
cost drops 5.4x.  The affine rotation warp is gather-bound on TPU (two
orders slower than the separable RRC): keep ``rotate_aug`` host-side
(PIL) when using device views, or accept the cost for full-range SSL; a
shear/FFT formulation remains a candidate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) so importing this module never initializes a backend and
# never captures tracers when imported lazily.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_u8(imgs: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) uint8 -> normalized float32."""
    return (imgs.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def batch_images(batch) -> jnp.ndarray:
    """The network-ready image tensor of a batch: the host-prepared
    ``img``, or — raw-views mode (``--device_views``, packed/staged
    pools) — the uint8 ``img_raw`` crop normalized here.  Every consumer
    of eval/sweep batches must go through this (a raw-views batch has no
    ``img`` key at all)."""
    if "img" in batch:
        return jnp.asarray(batch["img"])
    return normalize_u8(jnp.asarray(batch["img_raw"]))


def weak_view_images(rng: jax.Array, base_u8: jnp.ndarray) -> jnp.ndarray:
    """One freshly-sampled normalized weak view per raw uint8 crop.

    What the dynamic-threshold sweep must score in raw-crop modes: the
    reference sweep iterates the unlabeled loader, whose batches are
    *weak-augmented* (compute_dynamic_entropy_threshold, agent.py:386-391)
    — scoring the un-augmented raw crop instead shifts the entropy
    distribution and therefore the quantile threshold."""
    return make_views(rng, base_u8, base_u8.shape[1], make_strong=False)["img"]


def _resample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample img (S, S, C) float at fractional coords ys/xs (H, W); zero
    fill outside."""
    s = img.shape[0]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < s) & (xi >= 0) & (xi < s)
        v = img[jnp.clip(yi, 0, s - 1), jnp.clip(xi, 0, s - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def _bilinear_weights(coords: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(B, out) fractional source coords -> (B, out, in) dense bilinear
    weight matrices (tent kernel, zero outside).  Dense on purpose: the
    resample then runs as two MXU matmuls instead of TPU-hostile gathers."""
    src = jax.lax.broadcasted_iota(jnp.float32, (1, 1, in_size), 2)
    return jnp.clip(1.0 - jnp.abs(coords[..., None] - src), 0.0, None)


def random_resized_crop_batch(rng: jax.Array, imgs: jnp.ndarray,
                              scale: Tuple[float, float],
                              out_size: int) -> jnp.ndarray:
    """(B, S, S, C) float -> (B, out, out, C); per-image random square crop
    with area fraction ~ U(scale), resized bilinearly.

    Separable implementation: out = W_y @ img @ W_x^T with per-image dense
    bilinear weight matrices — everything rides the MXU (a gather-based
    warp measured 832 ms/batch128; this form is ~2 orders faster)."""
    b, s = imgs.shape[0], imgs.shape[1]
    u = jax.random.uniform(rng, (b, 3))
    area_frac = scale[0] + u[:, 0] * (scale[1] - scale[0])
    side = s * jnp.sqrt(jnp.clip(area_frac, 0.0, 1.0))
    y0 = u[:, 1] * (s - side)
    x0 = u[:, 2] * (s - side)
    step = side / out_size
    grid = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    ys = y0[:, None] + grid[None] * step[:, None] - 0.5  # (B, out)
    xs = x0[:, None] + grid[None] * step[:, None] - 0.5
    w_y = _bilinear_weights(ys, s)  # (B, out, S)
    w_x = _bilinear_weights(xs, s)
    c = imgs.shape[-1]
    # Keep the lane (last) dimension wide (S*C / out) at every step — a
    # (..., C=3) trailing layout tiles onto 3 of 128 lanes and is ~40x slower.
    tmp = jnp.matmul(w_y, imgs.reshape(b, s, s * c),
                     preferred_element_type=jnp.float32)  # (B, out, S*C)
    tmp = tmp.reshape(b, out_size, s, c).transpose(0, 1, 3, 2)
    tmp = tmp.reshape(b, out_size * c, s)
    out = jnp.matmul(tmp, jnp.swapaxes(w_x, -1, -2),
                     preferred_element_type=jnp.float32)  # (B, out*C, out)
    out = out.reshape(b, out_size, c, out_size).transpose(0, 1, 3, 2)
    return out


def rotate_batch(angles_deg: jnp.ndarray, imgs: jnp.ndarray) -> jnp.ndarray:
    """Rotate each (S, S, C) image by its angle about the center (PIL
    rotate(angle) + center-recrop semantics: counterclockwise in image
    coords, zero fill)."""
    s = imgs.shape[1]

    def one(img, angle_deg):
        a = jnp.deg2rad(angle_deg)
        c, si = jnp.cos(a), jnp.sin(a)
        ctr = (s - 1) / 2.0
        yy = jnp.arange(s, dtype=jnp.float32)[:, None].repeat(s, 1) - ctr
        xx = jnp.arange(s, dtype=jnp.float32)[None, :].repeat(s, 0) - ctr
        # Inverse map of a CCW rotation by `a` of the content.
        xs = c * xx - si * yy + ctr
        ys = si * xx + c * yy + ctr
        return _resample_bilinear(img, ys, xs)

    return jax.vmap(one)(imgs, angles_deg)


def _pil_blur(imgs: jnp.ndarray) -> jnp.ndarray:
    """PIL ``ImageFilter.BLUR``, exactly (the reference's 5% weak-view blur,
    dataset_300WLP.py:115): a 5x5 ring kernel — outer ring of ones, hollow
    3x3 center — divided by 16, rounded to the nearest integer like PIL's
    uint8 output, with the outer 2-pixel border copied through unfiltered
    (PIL leaves pixels without full kernel support unchanged).  Byte-parity
    with PIL is asserted in tests/test_views.py."""
    c = imgs.shape[-1]
    ring = (jnp.ones((5, 5), imgs.dtype).at[1:4, 1:4].set(0.0)) / 16.0
    kernel = jnp.tile(ring[:, :, None, None], (1, 1, 1, c))
    blurred = jax.lax.conv_general_dilated(
        imgs, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    blurred = jnp.floor(blurred + 0.5)
    h, w = imgs.shape[1], imgs.shape[2]
    inner_y = (jnp.arange(h) >= 2) & (jnp.arange(h) < h - 2)
    inner_x = (jnp.arange(w) >= 2) & (jnp.arange(w) < w - 2)
    interior = inner_y[:, None] & inner_x[None, :]
    return jnp.where(interior[None, :, :, None], blurred, imgs)


def make_views(rng: jax.Array, base_u8: jnp.ndarray, out_size: int,
               rotate_aug: bool = False, blur_prob: float = 0.05,
               make_strong: bool = True, flip_prob: float = 0.5):
    """(B, S, S, 3) uint8 base crops -> dict(img, img_strong, aug_rot_mat,
    rot_angle_deg, flip) with normalized float32 views.  One fused jit
    program; the caller applies ``aug_rot_mat`` to labels exactly like the
    host pipeline (aug_rot_mat_z convention).

    Flip semantics follow the reference: the 50% horizontal flip hits the
    BASE crop before both views (process_not_annotated_image,
    dataset_COCOHead.py:81-83), so weak and strong stay consistent and no
    teacher adjustment is needed.  For labeled use the returned ``flip``
    mask: the reference negates yaw/roll (dataset_300WLP.py:110-113),
    which in matrix form is R' = F R F with F = diag(-1, 1, 1)
    (ops.so3.flip_rotation)."""
    b = base_u8.shape[0]
    k_flip, k_blur, k_weak, k_rot, k_strong = jax.random.split(rng, 5)
    imgs = base_u8.astype(jnp.float32)

    flip = jax.random.uniform(k_flip, (b,)) < flip_prob
    imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)

    do_blur = jax.random.uniform(k_blur, (b, 1, 1, 1)) < blur_prob
    imgs = jnp.where(do_blur, _pil_blur(imgs), imgs)

    weak = random_resized_crop_batch(k_weak, imgs, (0.8, 1.25), out_size)
    out = {"img": (weak / 255.0 - IMAGENET_MEAN) / IMAGENET_STD,
           "flip": flip}

    if not make_strong:
        out["img_strong"] = jnp.zeros_like(out["img"])
        out["aug_rot_mat"] = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                              (b, 3, 3))
        out["rot_angle_deg"] = jnp.zeros((b,), jnp.float32)
        return out

    if rotate_aug:
        angles = jax.random.uniform(k_rot, (b,)) * 60.0 - 30.0
        s_img = rotate_batch(angles, imgs)
    else:
        angles = jnp.zeros((b,), jnp.float32)
        s_img = imgs
    strong = random_resized_crop_batch(k_strong, s_img, (0.6, 1.5), out_size)
    out["img_strong"] = ((strong / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)

    ra = jnp.deg2rad(angles)
    c, s = jnp.cos(ra), jnp.sin(ra)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    out["aug_rot_mat"] = jnp.stack(
        [c, s, zeros, -s, c, zeros, zeros, zeros, ones], -1
    ).reshape(b, 3, 3)
    out["rot_angle_deg"] = angles
    return out
