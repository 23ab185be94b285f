"""BIWI train (unlabeled) / test datasets from FSA-Net preprocessed .npz.

Parity with /root/reference/src/datasets/dataset_BIWI{train,test}.py:
64x64 crops + (yaw, pitch, roll) degree labels; upscaled to the crop size;
test: plain normalized crop with Euler/R labels (angles wrapped to +-180
and clipped to +-89.99); ulb_train: weak/strong views (labels carried for
diagnostics only).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from semiuhpe_tpu.data.augments_host import (
    aug_rot_mat_z, normalize, weak_strong_views)
from semiuhpe_tpu.data.datasets.base import euler_to_rot_np, wrap_clip_89


class DatasetBIWI:
    def __init__(self, images: np.ndarray, poses: np.ndarray, phase: str,
                 rotate_aug: bool = False, out_size: int = 224,
                 seed=None):
        self.images = images
        self.poses = poses  # (N, 3) of (yaw, pitch, roll) degrees
        self.phase = phase
        self.rotate_aug = rotate_aug
        self.out_size = out_size
        self.seed = seed

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        idx = idx % len(self.images)
        rng = (np.random.default_rng() if self.seed is None
               else np.random.default_rng(self.seed * 11_000_023 + idx))
        yaw, pitch, roll = (wrap_clip_89(a) for a in self.poses[idx])
        img = Image.fromarray(self.images[idx].astype(np.uint8)).resize(
            (self.out_size, self.out_size))

        if self.phase == "test":
            tensor = normalize(img).astype(np.float32)
            return {
                "idx": np.int32(idx),
                "rot_mat": euler_to_rot_np(pitch, yaw, roll),
                "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
                "img": tensor,
                "img_strong": np.zeros_like(tensor),
            }

        flip = rng.uniform() < 0.5
        if flip:
            yaw, roll = -yaw, -roll
        weak, strong, rot_angle = weak_strong_views(
            rng, img, augment_strong=True, rotate_aug=self.rotate_aug,
            flip=flip, out_size=self.out_size)
        aug = aug_rot_mat_z(rot_angle)
        return {
            "idx": np.int32(idx),
            "rot_mat": (aug @ euler_to_rot_np(pitch, yaw, roll)).astype(np.float32),
            "img": weak.astype(np.float32),
            "img_strong": strong.astype(np.float32),
            "aug_rot_mat": aug,
        }


def make_biwi(name: str, phase: str, config):
    if name == "biwitest":
        assert phase == "test", phase
        db = np.load(config.data_dir_BIWItest)
    else:
        assert phase == "ulb_train", phase
        db = np.load(config.data_dir_BIWItrain)
    images = db["image"]
    poses = db["pose"]
    return DatasetBIWI(images, poses, phase,
                       rotate_aug=getattr(config, "rotate_aug", False),
                       out_size=getattr(config, "input_size", 224))
