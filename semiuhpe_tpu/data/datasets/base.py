"""Dataset protocol + a procedural synthetic head-pose dataset.

The synthetic set renders a rotation-dependent pattern (an orthographically
projected, shaded box wireframe) so that pose is *learnable* from pixels —
used by tests, the e2e demo CLI, and the throughput benchmark, since this
environment ships no real datasets.
"""

from __future__ import annotations

from typing import Dict, Optional, Protocol

import numpy as np
from PIL import Image

from semiuhpe_tpu.data.augments_host import (
    CROP_SIZE, aug_rot_mat_z, weak_strong_views)


class HeadPoseDataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]: ...


def wrap_angle_180(angle: float) -> float:
    """Wrap a degree angle into [-180, 180] (reference idiom repeated in
    every dataset module, e.g. dataset_300WLP.py:181-183)."""
    while abs(angle) > 180:
        angle = angle - np.sign(angle) * 360
    return float(angle)


def wrap_clip_89(angle: float) -> float:
    """Wrap to +-180 then clip to +-89.99 (front-range label sanitation,
    dataset_300WLP.py:181-187)."""
    return float(np.clip(wrap_angle_180(angle), -89.99, 89.99))


def euler_to_rot_np(pitch_deg, yaw_deg, roll_deg) -> np.ndarray:
    """R = Rz(roll) Ry(yaw) Rx(pitch), pure numpy (loader workers must not
    touch the accelerator).  Same convention as ops.so3.euler_to_matrix and
    the reference's get_6DRepNet_Rot (/root/reference/src/utils.py:204-225)."""
    x, y, z = np.radians([pitch_deg, yaw_deg, roll_deg])
    cx, sx, cy, sy, cz, sz = np.cos(x), np.sin(x), np.cos(y), np.sin(y), np.cos(z), np.sin(z)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


_CUBE = np.array(
    [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32)
_EDGES = [(a, b) for a in range(8) for b in range(a + 1, 8)
          if sum(abs(_CUBE[a] - _CUBE[b])) == 2]


def render_pose_image(rot: np.ndarray, size: int = CROP_SIZE,
                      rng: Optional[np.random.Generator] = None) -> Image.Image:
    """Draw a shaded 'head box': front face brighter, wireframe edges.
    Orientation is unambiguously visible (no symmetries)."""
    import cv2

    img = np.full((size, size, 3), 96, np.uint8)
    pts3 = _CUBE * 0.5
    # Mark the 'face' direction with an asymmetric nose vertex.
    pts3 = np.concatenate([pts3, [[0.0, 0.0, 0.9], [0.35, 0.35, 0.0]]], 0)
    proj = (rot @ pts3.T).T
    scale = size * 0.3
    xy = (proj[:, :2] * scale + size / 2).astype(np.int32)
    depth_order = np.argsort(proj[:, 2])
    for a, b in _EDGES:
        shade = int(100 + 60 * (proj[a, 2] + proj[b, 2]) / 2)
        cv2.line(img, tuple(xy[a]), tuple(xy[b]), (shade, 255 - shade, 128), 2)
    cv2.circle(img, tuple(xy[8]), 8, (250, 80, 60), -1)   # nose
    cv2.circle(img, tuple(xy[9]), 5, (60, 80, 250), -1)   # right-cheek marker
    if rng is not None:
        noise = rng.integers(-12, 12, img.shape, np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return Image.fromarray(img)


class SyntheticHeadPose:
    """Deterministic synthetic dataset with the reference sample schema
    ``{idx, rot_mat, euler_angles, img, img_strong, aug_rot_mat}``."""

    def __init__(self, n: int = 512, augment_strong: bool = False,
                 rotate_aug: bool = False, full_range: bool = False,
                 seed: int = 0, size: int = CROP_SIZE, offset: int = 0,
                 raw_views: bool = False, eval_transform: bool = False):
        """``offset`` shifts the pose-index space so labeled (phase 'train')
        and unlabeled (phase 'ulb_train') splits are disjoint — the
        semi-supervised label-scarce regime of the reference's ss_ratio
        split (dataset_300WLP.py:264-305) on synthetic data."""
        self.n = n
        self.offset = offset
        self.augment_strong = augment_strong
        self.rotate_aug = rotate_aug
        self.size = size
        self.raw_views = raw_views
        self.eval_transform = eval_transform
        total = n + offset
        base = np.random.default_rng(seed)
        lim = 179.0 if full_range else 75.0
        self.eulers = np.stack([
            base.uniform(-75.0, 75.0, total),
            base.uniform(-lim, lim, total),
            base.uniform(-75.0, 75.0, total),
        ], -1).astype(np.float32)[offset:]  # (pitch, yaw, roll) degrees
        self.seed = seed
        # Identity of the rendered pool: everything the pixels/labels
        # depend on.  Recorded into packed caches (data/packed.py) so a
        # changed split/seed/size can't silently reuse a stale pack.
        self.fingerprint = (f"synthetic:n={n}:offset={offset}:seed={seed}"
                            f":size={size}:full_range={full_range}")

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        idx = idx % self.n
        rng = np.random.default_rng(
            (self.seed + 1) * 1_000_003 + self.offset + idx)
        pitch, yaw, roll = self.eulers[idx]
        rot = euler_to_rot_np(pitch, yaw, roll)
        img = render_pose_image(rot, self.size, rng)
        if self.raw_views:
            # Device-side view mode (ops/views.py): ship the raw uint8 base
            # crop; the train step generates weak/strong views + aug_rot_mat
            # on device and adjusts labels there.
            return {
                "idx": np.int32(idx),
                "rot_mat": rot.astype(np.float32),
                "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
                "img_raw": np.asarray(img, np.uint8),
            }
        if self.eval_transform:
            # Deterministic test transform: plain normalize of the raw
            # render — identical to what the device-views eval path does
            # with img_raw, so metrics are comparable across the
            # --device_views flag (the reference applies no stochastic
            # views at test either).
            from semiuhpe_tpu.ops.views import IMAGENET_MEAN, IMAGENET_STD
            arr = np.asarray(img, np.float32) / 255.0
            return {
                "idx": np.int32(idx),
                "rot_mat": rot.astype(np.float32),
                "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
                "img": ((arr - IMAGENET_MEAN) / IMAGENET_STD).astype(
                    np.float32),
            }
        weak, strong, rot_angle = weak_strong_views(
            rng, img, augment_strong=self.augment_strong,
            rotate_aug=self.rotate_aug, flip=False, out_size=self.size)
        aug = aug_rot_mat_z(rot_angle)
        rot = aug @ rot  # label moves with the strong rotation (reference :201)
        sample = {
            "idx": np.int32(idx),
            "rot_mat": rot.astype(np.float32),
            "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
            "img": weak.astype(np.float32),
            "aug_rot_mat": aug,
        }
        sample["img_strong"] = (strong.astype(np.float32) if strong is not None
                                else np.zeros_like(weak))
        return sample
