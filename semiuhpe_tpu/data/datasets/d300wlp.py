"""300W-LP labeled / unlabeled dataset.

Capability parity with /root/reference/src/datasets/dataset_300WLP.py:
* four subsets (AFW/HELEN/IBUG/LFPW) plus their ``_Flip`` mirrored copies;
* landmark-driven aspect-ratio-invariant crop with random ad ~ U(0.2, 0.4);
* Euler labels from the .mat ``Pose_Para`` (degrees), wrapped to +-180 and
  clipped to +-89.99; rotation label R = Rz Ry Rx;
* 50% h-flip with yaw/roll negation; weak/strong views; pose-altering
  rotation recorded as ``aug_rot_mat`` (applied to the GT too);
* deterministic semi-supervised split: per-subset index shuffle with
  Mersenne seed 666, first ``ss_ratio`` fraction labeled, complement
  unlabeled — byte-for-byte the reference's split (seed-666 parity,
  dataset_300WLP.py:264-305).
"""

from __future__ import annotations

import os
import random
from os.path import isfile, join
from typing import List, Tuple

import numpy as np
import scipy.io as sio
from PIL import Image

from semiuhpe_tpu.data.augments_host import aug_rot_mat_z, weak_strong_views
from semiuhpe_tpu.data.crops import head_crop_from_landmarks
from semiuhpe_tpu.data.datasets.base import euler_to_rot_np, wrap_clip_89

SUBSETS = ("AFW", "HELEN", "IBUG", "LFPW")


def load_mat_pose(anno_path: str) -> np.ndarray:
    pose = sio.loadmat(anno_path)["Pose_Para"][0]
    return np.degrees(pose[:3]).astype(np.float64)  # (pitch, yaw, roll)


def load_landmarks(anno_path: str, img_w: int) -> np.ndarray:
    """68 landmarks as (2, 68); the _Flip copies share the original's
    landmark file with x mirrored (dataset_300WLP.py:33-40)."""
    lms_path = anno_path[:-4] + "_pts.mat"
    lms_path = lms_path.replace("300W_LP", "300W_LP/landmarks")
    flipped = "_Flip" in lms_path
    if flipped:
        lms_path = lms_path.replace("_Flip", "")
    pt2d = sio.loadmat(lms_path)["pts_2d"].T.copy()
    if flipped:
        pt2d[0, :] = img_w - pt2d[0, :]
    return pt2d


class Dataset300WLP:
    def __init__(self, img_files: List[str], anno_files: List[str], phase: str,
                 augment_strong: bool = False, rotate_aug: bool = False,
                 out_size: int = 224, seed=None, raw_views: bool = False):
        self.img_files = img_files
        self.anno_files = anno_files
        self.phase = phase
        self.augment_strong = augment_strong
        self.rotate_aug = rotate_aug
        self.out_size = out_size
        self.seed = seed
        self.raw_views = raw_views

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, idx: int):
        idx = idx % len(self.img_files)
        # Fresh entropy per call for training (augs differ every epoch, like
        # the reference's global RNG); seeded only when reproducibility is
        # requested (tests).
        rng = (np.random.default_rng() if self.seed is None
               else np.random.default_rng(self.seed * 7_000_003 + idx))
        img = Image.open(self.img_files[idx]).convert("RGB")
        pitch, yaw, roll = load_mat_pose(self.anno_files[idx])
        pt2d = load_landmarks(self.anno_files[idx], img.size[0])

        ad = rng.uniform() * 0.2 + 0.2
        crop = head_crop_from_landmarks(img, pt2d, ad, self.out_size)

        pitch, yaw, roll = map(wrap_clip_89, (pitch, yaw, roll))
        if self.raw_views:
            # Device-views mode: ship the base crop; flip/blur/RRC (+ the
            # flip/rotation label algebra) run on device (ops/views.py,
            # training.steps.labeled_device_views).
            return {
                "idx": np.int32(idx),
                "rot_mat": euler_to_rot_np(pitch, yaw, roll).astype(np.float32),
                "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
                "img_raw": np.asarray(crop, np.uint8),
            }
        flip = rng.uniform() < 0.5
        if flip:
            yaw, roll = -yaw, -roll

        weak, strong, rot_angle = weak_strong_views(
            rng, crop, augment_strong=self.augment_strong,
            rotate_aug=self.rotate_aug, flip=flip, out_size=self.out_size)
        aug = aug_rot_mat_z(rot_angle)
        rot = aug @ euler_to_rot_np(pitch, yaw, roll)

        sample = {
            "idx": np.int32(idx),
            "rot_mat": rot.astype(np.float32),
            "euler_angles": np.asarray([pitch, yaw, roll], np.float32),
            "img": weak.astype(np.float32),
            "aug_rot_mat": aug,
        }
        sample["img_strong"] = (strong.astype(np.float32) if strong is not None
                                else np.zeros_like(sample["img"]))
        return sample


def scan_300wlp(data_dir: str) -> dict:
    out = {}
    for sub in SUBSETS:
        path = join(data_dir, sub)
        mats = sorted(join(path, f) for f in os.listdir(path)
                      if isfile(join(path, f)) and f.endswith(".mat"))
        jpgs = sorted(join(path, f) for f in os.listdir(path)
                      if isfile(join(path, f)) and f.endswith(".jpg"))
        out[sub] = {
            "mat": mats, "jpg": jpgs,
            "mat_flip": [m.replace("LP/" + sub, "LP/" + sub + "_Flip") for m in mats],
            "jpg_flip": [j.replace("LP/" + sub, "LP/" + sub + "_Flip") for j in jpgs],
        }
    return out


def split_indices(total: int, ss_ratio: float) -> Tuple[List[int], List[int]]:
    """The reference's deterministic labeled/unlabeled split: Mersenne
    seed-666 shuffle, first ss_ratio fraction labeled."""
    index_arr = list(range(total))
    random.Random(666).shuffle(index_arr)
    labeled = int(total * ss_ratio)
    return index_arr[:labeled], index_arr[labeled:]


def make_300wlp(phase: str, config):
    assert phase in ("train", "ulb_train", "train_all"), phase
    files = scan_300wlp(config.data_dir_300WLP)
    jpgs, mats = [], []
    for sub in SUBSETS:
        d = files[sub]
        if phase == "train_all":
            pick = list(range(len(d["jpg"])))
        else:
            lab, ulb = split_indices(len(d["jpg"]), config.ss_ratio)
            pick = lab if phase == "train" else ulb
        jpgs += [d["jpg"][i] for i in pick] + [d["jpg_flip"][i] for i in pick]
        mats += [d["mat"][i] for i in pick] + [d["mat_flip"][i] for i in pick]
    return Dataset300WLP(
        jpgs, mats, phase,
        augment_strong=(phase == "ulb_train"),
        rotate_aug=getattr(config, "rotate_aug", False) and phase == "ulb_train",
        out_size=getattr(config, "input_size", 224),
        raw_views=getattr(config, "device_views", False),
    )
