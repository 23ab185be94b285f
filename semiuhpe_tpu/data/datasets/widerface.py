"""WiderFace unlabeled dataset (face boxes, front-range ablation).

Parity with /root/reference/src/datasets/dataset_WiderFace.py:
``wider_face_{train,val}_bbx_gt.txt`` parsing (per-face attribute fields:
x1 y1 w h blur expression illumination invalid occlusion pose), faces
< 25px dropped, invalid boxes dropped, center-based crop with ad ~
U(0.1, 0.2) and 2x top headroom (faces need hair margin).
"""

from __future__ import annotations

import os

from semiuhpe_tpu.data.datasets.unlabeled import UnlabeledHeads

MIN_FACE_SIZE = 25


def parse_bbx_gt(anno_path: str, imgs_root: str):
    img_files, bboxes = [], []
    with open(anno_path) as f:
        lines = [ln.strip() for ln in f]
    i = 0
    while i < len(lines):
        name = lines[i]
        n = int(lines[i + 1])
        i += 2
        rows = max(n, 1)  # zero-face images still carry one all-zero row
        for j in range(rows):
            parts = lines[i + j].split()
            if len(parts) < 10 or n == 0:
                continue
            x1, y1, w, h = (int(v) for v in parts[:4])
            invalid = int(parts[7])
            if invalid or w < MIN_FACE_SIZE or h < MIN_FACE_SIZE:
                continue
            img_files.append(os.path.join(imgs_root, name))
            bboxes.append([x1, y1, w, h])
        i += rows
    return img_files, bboxes


def make_widerface(phase: str, config):
    assert phase == "ulb_train", phase
    db = config.data_dir_WiderFace
    img_files, bboxes = [], []
    for split in ("train", "val"):
        anno = os.path.join(db, f"wider_face_split/wider_face_{split}_bbx_gt.txt")
        root = os.path.join(db, f"WIDER_{split}/images")
        if os.path.exists(anno):
            f, b = parse_bbx_gt(anno, root)
            img_files += f
            bboxes += b
    return UnlabeledHeads(img_files, bboxes, ad_base=0.1, top_scale=2.0,
                          rotate_aug=getattr(config, "rotate_aug", False),
                          out_size=getattr(config, "input_size", 224),
                          raw_views=getattr(config, "device_views", False))
