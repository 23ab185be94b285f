"""Offline tool: crop OpenImagesV6 human heads into WildHead-format files.

Parity with /root/reference/tools/headcrop_OpenImageV6.py: scan the
detections.csv splits for the /m/04hgtk (Human head) label, drop
depiction/group/inside boxes and heads smaller than 30px, crop with a 1.2x
margin (zero-padded at image borders), and write
``OpenImagesV6_<n>_<x>,<y>,<w>,<h>.jpg`` files whose filename encodes the
head bbox inside the crop — the format the WildHead dataset loader parses.

Usage:
    python -m semiuhpe_tpu.cli.headcrop_openimages --root /path/to/oiv6 \
        --out head_images_wild_30_oi [--min_size 30]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import cv2
import numpy as np

TARGET_LABEL = "/m/04hgtk"  # OpenImages "Human head"
SPLITS = (("validation/labels/detections.csv", "validation/data"),
          ("test/labels/detections.csv", "test/data"),
          ("train/labels/detections.csv", "train/data"))


def crop_one(img: np.ndarray, x_min, y_min, x_max, y_max, scale_ratio=1.2):
    img_h, img_w = img.shape[:2]
    head_w, head_h = x_max - x_min, y_max - y_min
    xc, yc = x_min + head_w / 2, y_min + head_h / 2
    x1 = int(xc - head_w / 2 * scale_ratio)
    y1 = int(yc - head_h / 2 * scale_ratio)
    x2 = int(xc + head_w / 2 * scale_ratio)
    y2 = int(yc + head_h / 2 * scale_ratio)
    pad_l, x1 = (-x1, 0) if x1 < 0 else (0, x1)
    pad_t, y1 = (-y1, 0) if y1 < 0 else (0, y1)
    pad_r, x2 = (x2 - img_w + 1, img_w - 1) if x2 > img_w - 1 else (0, x2)
    pad_b, y2 = (y2 - img_h + 1, img_h - 1) if y2 > img_h - 1 else (0, y2)
    crop = img[y1:y2, x1:x2]
    crop = cv2.copyMakeBorder(crop, pad_t, pad_b, pad_l, pad_r,
                              cv2.BORDER_CONSTANT, value=(0, 0, 0))
    cx, cy = crop.shape[1] / 2, crop.shape[0] / 2
    bx, by = int(cx - head_w / 2), int(cy - head_h / 2)
    return crop, (bx, by, int(head_w), int(head_h))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="OpenImagesV6 root dir")
    ap.add_argument("--out", default="head_images_wild_30_oi")
    ap.add_argument("--min_size", type=int, default=30)
    ap.add_argument("--scale_ratio", type=float, default=1.2)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    count = 0
    for csv_rel, data_rel in SPLITS:
        csv_path = os.path.join(args.root, csv_rel)
        if not os.path.exists(csv_path):
            continue
        with open(csv_path) as f:
            reader = csv.reader(f)
            next(reader)  # header
            for row in reader:
                image_id, _, label = row[0], row[1], row[2]
                if label != TARGET_LABEL:
                    continue
                x_min, x_max, y_min, y_max = (float(v) for v in row[4:8])
                is_group, is_depiction, is_inside = (int(row[10]), int(row[11]),
                                                     int(row[12]))
                if is_depiction or is_group or is_inside:
                    continue
                img_path = os.path.join(args.root, data_rel, image_id + ".jpg")
                img = cv2.imread(img_path)
                if img is None:
                    continue
                h, w = img.shape[:2]
                x0, x1 = max(0, x_min * w), min(w - 1, x_max * w)
                y0, y1 = max(0, y_min * h), min(h - 1, y_max * h)
                if (x1 - x0) < args.min_size or (y1 - y0) < args.min_size:
                    continue
                crop, bbox = crop_one(img, x0, y0, x1, y1, args.scale_ratio)
                count += 1
                name = (f"OpenImagesV6_{count:06d}_"
                        f"{bbox[0]},{bbox[1]},{bbox[2]},{bbox[3]}.jpg")
                cv2.imwrite(os.path.join(args.out, name), crop)
    print(f"wrote {count} head crops to {args.out}")
    return count


if __name__ == "__main__":
    main(sys.argv[1:])
