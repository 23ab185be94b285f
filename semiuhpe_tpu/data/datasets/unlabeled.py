"""Shared unlabeled head dataset: (image, bbox) items -> weak/strong views.

Factors out the idiom every unlabeled dataset module in the reference
repeats (dataset_{COCOHead,CrowdHuman,WildHead,WiderFace}.py): center-based
bbox crop with ad ~ U(ad_base, ad_base + 0.1), 50% flip + 5% blur on the
shared base image, RandomResizedCrop weak/strong views, pose-altering
rotation recorded in ``aug_rot_mat``.  Sample schema:
``{idx, img, img_strong, aug_rot_mat}`` (no labels).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from semiuhpe_tpu.data.augments_host import aug_rot_mat_z, weak_strong_views
from semiuhpe_tpu.data.crops import head_crop_from_bbox, head_crop_from_landmarks


class UnlabeledHeads:
    def __init__(self, img_files: Sequence[str], bboxes: Sequence,
                 ad_base: float = 0.1, top_scale: float = 1.0,
                 rotate_aug: bool = False, out_size: int = 224,
                 landmarks: bool = False, seed: Optional[int] = None,
                 raw_views: bool = False):
        self.img_files = list(img_files)
        self.bboxes = list(bboxes)
        self.ad_base = ad_base
        self.top_scale = top_scale
        self.rotate_aug = rotate_aug
        self.out_size = out_size
        self.landmarks = landmarks
        self.seed = seed
        self.raw_views = raw_views

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, idx: int):
        idx = idx % len(self.img_files)
        rng = (np.random.default_rng() if self.seed is None
               else np.random.default_rng(self.seed * 9_000_011 + idx))
        img = Image.open(self.img_files[idx]).convert("RGB")
        if self.landmarks:
            ad = rng.uniform() * 0.2 + 0.2
            crop = head_crop_from_landmarks(img, np.asarray(self.bboxes[idx]),
                                            ad, self.out_size)
        else:
            ad = rng.uniform() * 0.1 + self.ad_base
            crop = head_crop_from_bbox(img, self.bboxes[idx], ad, self.out_size,
                                       top_scale=self.top_scale)
        if self.raw_views:
            return {"idx": np.int32(idx),
                    "img_raw": np.asarray(crop, np.uint8)}
        flip = rng.uniform() < 0.5
        weak, strong, rot_angle = weak_strong_views(
            rng, crop, augment_strong=True, rotate_aug=self.rotate_aug,
            flip=flip, out_size=self.out_size)
        return {
            "idx": np.int32(idx),
            "img": weak.astype(np.float32),
            "img_strong": strong.astype(np.float32),
            "aug_rot_mat": aug_rot_mat_z(rot_angle),
        }


def sort_labels_by_image_id(annotations: List[dict]) -> dict:
    out: dict = {}
    for a in annotations:
        out.setdefault(str(a["image_id"]), []).append(a)
    return out
