"""Single head-crop pose inference + mesh overlay.

Parity with /root/reference/predict.py: each image in ``--imgs_dir`` is a
well-cropped head; resize to the net input, predict the rotation,
extract Euler angles in the training-set convention, lift to a global
6DoF with the edges_scale=0.05 inset bbox, render the head mesh overlay.

Usage:
    python -m semiuhpe_tpu.cli.predict <ckpt_dir> --imgs_dir test_imgs/X \
        --config settings/DAD3DHeads_COCOHead.yml --network effinetv2
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np
from PIL import Image

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.data.augments_host import normalize
from semiuhpe_tpu.cli.infer_common import PoseModel
from semiuhpe_tpu.cli.train import setup_compile_cache
from semiuhpe_tpu.render.renderer import Renderer


def main(argv=None):
    setup_compile_cache()
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--imgs_dir", type=str, required=True)
    extra.add_argument("--out_dir", type=str, default=None)
    extra.add_argument("--alpha", type=float, default=1.0)
    extra_args, rest = extra.parse_known_args(argv)

    config = get_config("test", rest)
    pose = PoseModel(config)
    renderer = Renderer()

    out_dir = extra_args.out_dir or (extra_args.imgs_dir.rstrip("/") + "_results")
    os.makedirs(out_dir, exist_ok=True)

    edges_scale = 0.05
    results = []
    for name in sorted(os.listdir(extra_args.imgs_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        path = os.path.join(extra_args.imgs_dir, name)
        img = Image.open(path).convert("RGB")
        w, h = img.size
        bbox = [int(edges_scale * w), int(edges_scale * h),
                int((1 - edges_scale) * w), int((1 - edges_scale) * h)]
        intrinsics = np.array([[w + h, 0, w // 2], [0, w + h, h // 2],
                               [0, 0, 1]], np.float64)
        img_cv2 = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR)

        crop = normalize(img.resize((pose.size, pose.size))).astype(np.float32)
        rot = pose.rotations(crop[None])[0]
        pitch, yaw, roll = pose.euler_from_rot(rot)

        global_pose = pose.global_pose(rot, bbox, intrinsics)
        tv = renderer.transform_vertices(img_cv2, [global_pose])
        vis = renderer.render(img_cv2, tv, alpha=extra_args.alpha)

        out_name = os.path.splitext(name)[0] + f"_{config.train_labeled}.jpg"
        cv2.imwrite(os.path.join(out_dir, out_name), vis)
        results.append((name, pitch, yaw, roll))
        print(f"{name}\tpitch {pitch:.2f}\tyaw {yaw:.2f}\troll {roll:.2f}")
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
