"""AFLW2000 front-range test set.

Capability parity with /root/reference/src/datasets/dataset_AFLW2000.py:
fixed ad = 0.2 crop from the mat's ``pt2d`` landmarks, Euler labels wrapped
to +-180, and the pre-filter that drops faces with any |angle| >= 90 deg
(36 of 2000); no shuffling, no augmentation, no drop_last.
"""

from __future__ import annotations

import os
from os.path import isfile, join

import numpy as np
import scipy.io as sio
from PIL import Image

from semiuhpe_tpu.data.augments_host import normalize
from semiuhpe_tpu.data.crops import head_crop_from_landmarks
from semiuhpe_tpu.data.datasets.base import euler_to_rot_np, wrap_angle_180


class DatasetAFLW2000:
    def __init__(self, img_files, anno_files, out_size: int = 224):
        self.img_files = img_files
        self.anno_files = anno_files
        self.out_size = out_size

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, idx: int):
        img = Image.open(self.img_files[idx]).convert("RGB")
        mat = sio.loadmat(self.anno_files[idx])
        pitch, yaw, roll = (wrap_angle_180(a)
                            for a in np.degrees(mat["Pose_Para"][0][:3]))
        crop = head_crop_from_landmarks(img, mat["pt2d"], ad=0.2,
                                        out_size=self.out_size)
        tensor = normalize(crop).astype(np.float32)
        return {
            "idx": np.int32(idx),
            "rot_mat": euler_to_rot_np(pitch, yaw, roll),
            "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
            "img": tensor,
            "img_strong": np.zeros_like(tensor),
        }


def make_aflw2000(phase: str, config):
    assert phase == "test", phase
    path = config.data_dir_AFLW2000
    mats = sorted(join(path, f) for f in os.listdir(path)
                  if isfile(join(path, f)) and f.endswith(".mat"))
    jpgs = sorted(join(path, f) for f in os.listdir(path)
                  if isfile(join(path, f)) and f.endswith(".jpg"))
    keep_j, keep_m = [], []
    for m, j in zip(mats, jpgs):
        angles = [wrap_angle_180(a)
                  for a in np.degrees(sio.loadmat(m)["Pose_Para"][0][:3])]
        if all(abs(a) < 90 for a in angles):
            keep_m.append(m)
            keep_j.append(j)
    return DatasetAFLW2000(keep_j, keep_m,
                           out_size=getattr(config, 'input_size', 224))
