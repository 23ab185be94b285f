"""DAD-3DHeads labeled train / val dataset (full-range rotation matrices).

Parity with /root/reference/src/datasets/dataset_DAD3DHeads.py:
* labels: rotation matrix from ``rot_180 @ model_view_matrix`` (the DAD
  benchmark frame, :222-226); Euler derived via scipy for range filtering
  only (front-range faces dropped when full-range, :227-240);
* the filtered list is cached to ``{split}_HeadPoseEstimation.json``
  (:248-283) so the scan runs once;
* center-based bbox crop with ad ~ U(0.1, 0.2) for train, fixed 0.15 for
  val; labeled side has no view augmentation (``augment_weak=False`` in the
  reference loaders);
* samples carry ``rot_mat`` only (no euler_angles key — DAD GT Euler is
  unreliable near gimbal lock).
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from semiuhpe_tpu.data.augments_host import normalize
from semiuhpe_tpu.data.crops import head_crop_from_bbox
from semiuhpe_tpu.data.datasets.base import wrap_angle_180
from semiuhpe_tpu.ops.so3 import limit_angle

ROT_180_4 = np.diag([1.0, -1.0, -1.0, 1.0])


def pose_label_from_annotation(anno: dict) -> tuple[np.ndarray, list]:
    """(rotation_matrix, [pitch, yaw, roll] degrees) from a DAD annotation
    json dict with a 4x4 ``model_view_matrix``."""
    from scipy.spatial.transform import Rotation

    mv = np.asarray(anno["model_view_matrix"], np.float32)
    rot = (ROT_180_4 @ mv)[:3, :3]
    ax, ay, az = Rotation.from_matrix(rot.T.copy()).as_euler("xyz", degrees=True)
    pitch = limit_angle(ax - 180.0)
    yaw = limit_angle(ay)
    roll = limit_angle(az)

    return rot, [wrap_angle_180(pitch), wrap_angle_180(yaw),
                 wrap_angle_180(roll)]


def build_pose_list(db_path: str, split: str, is_full_range: bool):
    """Scan {split}.json, compute labels, drop front-range faces when
    full-range, cache to {split}_HeadPoseEstimation.json."""
    cache = os.path.join(db_path, split, f"{split}_HeadPoseEstimation.json")
    if os.path.exists(cache):
        d = json.load(open(cache))
        return d["images"], d["annotations"]

    items = json.load(open(os.path.join(db_path, split, f"{split}.json")))
    imgs, annos = [], []
    for item in items:
        item_id = item["item_id"]
        bbox = item["bbox"]  # [x, y, w, h]
        img_path = os.path.join(db_path, split, "images", item_id + ".png")
        anno_path = os.path.join(db_path, split, "annotations", item_id + ".json")
        rot, euler = pose_label_from_annotation(json.load(open(anno_path)))
        pitch, yaw, roll = euler
        is_front = abs(pitch) < 90 and abs(yaw) < 90 and abs(roll) < 90
        if not is_full_range and is_front:
            continue
        imgs.append(img_path)
        annos.append([bbox, rot.tolist(), euler])

    with open(cache, "w") as f:
        json.dump({"images": imgs, "annotations": annos}, f)
    return imgs, annos


class DatasetDAD3DHeads:
    def __init__(self, img_files, annos, phase: str, out_size: int = 224,
                 seed=None, raw_views: bool = False):
        self.img_files = img_files
        self.annos = annos
        self.phase = phase
        self.out_size = out_size
        self.seed = seed
        self.raw_views = raw_views

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, idx: int):
        idx = idx % len(self.img_files)
        rng = (np.random.default_rng() if self.seed is None
               else np.random.default_rng(self.seed * 13_000_027 + idx))
        bbox, rot, _euler = self.annos[idx]
        img = Image.open(self.img_files[idx]).convert("RGB")
        ad = (rng.uniform() * 0.1 + 0.1) if self.phase == "train" else 0.15
        crop = head_crop_from_bbox(img, bbox, ad, self.out_size, top_scale=1.0)
        if self.raw_views:
            # Device-views mode: the DAD labeled side takes NO view augs
            # (reference loaders use augment_weak=False), so the device
            # step only normalizes — pass labeled_weak_aug=False there.
            return {
                "idx": np.int32(idx),
                "rot_mat": np.asarray(rot, np.float32),
                "img_raw": np.asarray(crop, np.uint8),
            }
        tensor = normalize(crop).astype(np.float32)
        return {
            "idx": np.int32(idx),
            "rot_mat": np.asarray(rot, np.float32),
            "img": tensor,
            "img_strong": np.zeros_like(tensor),
        }


def make_dad3dheads(phase: str, config):
    assert phase in ("train", "val", "test"), phase
    split = "val" if phase in ("val", "test") else "train"
    imgs, annos = build_pose_list(config.data_dir_DAD3DHeads, split,
                                  config.is_full_range)
    return DatasetDAD3DHeads(
        imgs, annos, split, out_size=getattr(config, "input_size", 224),
        raw_views=(split == "train"
                   and getattr(config, "device_views", False)))
