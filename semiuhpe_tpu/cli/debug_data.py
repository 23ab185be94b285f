"""Dataset debug visualizer — the reference's executable-module pattern.

Every reference dataset file carries an ``if __name__ == '__main__'`` block
that dumps annotated/augmented crops with GT pose axes drawn on them for
eyeballing (SURVEY.md §4.1, e.g. dataset_300WLP.py:316-411).  This CLI is
the consolidated equivalent: pick any dataset/phase, dump the first N
samples as JPEGs with yaw/pitch/roll axes rendered from the sample's
``rot_mat`` (proving crop + label-transform agreement visually), weak and
strong views side by side.

Usage:
    python -m semiuhpe_tpu.cli.debug_data --dataset synthetic \
        --dataset_phase ulb_train --n 8 --out /tmp/debug_crops \
        [--rotate_aug true ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.data.augments_host import denormalize
from semiuhpe_tpu.data.datasets import get_dataset
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.render.vis_plot import draw_axis_ypr
import jax.numpy as jnp


def _axes_overlay(img_hwc: np.ndarray, rot_mat: np.ndarray) -> np.ndarray:
    img = denormalize(img_hwc)[:, :, ::-1].copy()  # BGR for cv2
    e = np.degrees(np.asarray(so3.matrix_to_euler(
        jnp.asarray(rot_mat[None]), full_range=True)))[0]
    pitch, yaw, roll = (float(v) for v in e)
    size = img.shape[0] // 3
    return draw_axis_ypr(img, yaw, pitch, roll, size=size)


def main(argv=None):
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--dataset", type=str, default="synthetic")
    extra.add_argument("--dataset_phase", type=str, default="ulb_train")
    extra.add_argument("--n", type=int, default=8)
    extra.add_argument("--out", type=str, default="debug_crops")
    args, rest = extra.parse_known_args(argv)

    config = get_config("test", rest)
    ds = get_dataset(args.dataset, args.dataset_phase, config)
    os.makedirs(args.out, exist_ok=True)

    for i in range(min(args.n, len(ds))):
        s = dict(ds[i])
        # Raw-views datasets (--device_views) carry uint8 img_raw instead
        # of a normalized img; normalize so the overlay path is uniform.
        if "img" not in s and "img_raw" in s:
            from semiuhpe_tpu.ops.views import batch_images
            s["img"] = np.asarray(batch_images(s))
        panels = []
        if "rot_mat" in s:
            panels.append(_axes_overlay(s["img"], s["rot_mat"]))
        else:
            panels.append(denormalize(s["img"])[:, :, ::-1].copy())
        if "img_strong" in s and np.abs(s["img_strong"]).sum() > 0:
            if "rot_mat" in s:
                panels.append(_axes_overlay(s["img_strong"], s["rot_mat"]))
            else:
                panels.append(denormalize(s["img_strong"])[:, :, ::-1].copy())
        canvas = np.concatenate(panels, axis=1)
        path = os.path.join(args.out,
                            f"{args.dataset}_{args.dataset_phase}_{i:04d}.jpg")
        cv2.imwrite(path, canvas)
    print(f"wrote {min(args.n, len(ds))} debug crops to {args.out}")
    return args.out


if __name__ == "__main__":
    main(sys.argv[1:])
