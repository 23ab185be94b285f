"""Host-side weak/strong augmentation views (loader workers, PIL/numpy).

Behavioral parity with ``process_annotated_image`` /
``process_not_annotated_image`` (/root/reference/src/datasets/
dataset_300WLP.py:106-160):

* weak view: 50% h-flip (labels: yaw/roll negated by the caller), 5% PIL
  blur, RandomResizedCrop(scale=(0.8, 1.25), ratio 1:1);
* strong view: optional pose-altering rotation U(-30, 30) deg about the
  image center with expand+re-crop, RandomResizedCrop(scale=(0.6, 1.5));
  the rotation angle is returned so the trainer can build ``aug_rot_mat``;
* ImageNet mean/std normalization to float32 HWC (NHWC batches on device).

All randomness flows through an explicit ``np.random.Generator`` so loader
workers are reproducible.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageFilter

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
CROP_SIZE = 224


def normalize(img: Image.Image) -> np.ndarray:
    """PIL -> normalized float32 HWC."""
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def denormalize(arr: np.ndarray) -> np.ndarray:
    """Normalized HWC -> uint8 HWC (for visual fixtures)."""
    img = (arr * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def random_resized_crop(rng: np.random.Generator, img: Image.Image,
                        scale: Tuple[float, float],
                        out_size: int = CROP_SIZE) -> Image.Image:
    """torchvision RandomResizedCrop semantics with ratio fixed to 1:1
    (10 area-sampling attempts, center-crop fallback)."""
    width, height = img.size
    area = width * height
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        side = int(round(math.sqrt(target_area)))
        if 0 < side <= width and side <= height:
            top = int(rng.integers(0, height - side + 1))
            left = int(rng.integers(0, width - side + 1))
            crop = img.crop((left, top, left + side, top + side))
            return crop.resize((out_size, out_size), Image.BILINEAR)
    side = min(width, height)
    left = (width - side) // 2
    top = (height - side) // 2
    return img.crop((left, top, left + side, top + side)).resize(
        (out_size, out_size), Image.BILINEAR)


def rotate_expand_recrop(img: Image.Image, angle_deg: float,
                         out_size: int = CROP_SIZE) -> Image.Image:
    """Rotate about the image center with expand=True, then crop the central
    ``out_size`` square (reference strong rotation, dataset_300WLP.py:129-136)."""
    c = out_size // 2
    rot = img.rotate(angle_deg, center=(c, c), expand=True)
    w, h = rot.size
    x0, y0 = w // 2 - c, h // 2 - c
    return rot.crop((x0, y0, x0 + out_size, y0 + out_size))


def aug_rot_mat_z(angle_deg: float) -> np.ndarray:
    """The label-space rotation induced by an in-plane image rotation of
    ``angle_deg`` (reference convention, dataset_300WLP.py:195-198)."""
    ra = angle_deg * np.pi / 180.0
    return np.asarray(
        [[np.cos(ra), np.sin(ra), 0.0],
         [-np.sin(ra), np.cos(ra), 0.0],
         [0.0, 0.0, 1.0]], np.float32)


def weak_strong_views(
    rng: np.random.Generator,
    img: Image.Image,
    augment_strong: bool = False,
    rotate_aug: bool = False,
    flip: bool = False,
    out_size: int = CROP_SIZE,
) -> Tuple[np.ndarray, Optional[np.ndarray], float]:
    """Produce the (weak, strong, rot_angle) triple.  ``flip`` must be
    decided by the caller (labels change with it)."""
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if rng.uniform() < 0.05:
        img = img.filter(ImageFilter.BLUR)

    weak = normalize(random_resized_crop(rng, img, (0.8, 1.25), out_size))

    strong = None
    rot_angle = 0.0
    if augment_strong:
        s_img = img
        if rotate_aug:
            rot_angle = round(float(rng.uniform()) * 60.0 - 30.0, 3)
            s_img = rotate_expand_recrop(s_img, rot_angle, out_size)
        strong = normalize(random_resized_crop(rng, s_img, (0.6, 1.5), out_size))
    return weak, strong, rot_angle
