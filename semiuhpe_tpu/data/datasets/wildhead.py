"""WildHead unlabeled dataset (pre-cropped COCO + CrowdHuman + OpenImagesV6
heads, 403,216 crops at >=30px).

Parity with /root/reference/src/datasets/dataset_WildHead.py: three crop
folders (head_images_wild_30_{hp,ch,oi}), head bbox encoded in the filename
suffix ``_x,y,w,h``; center-based crop ad ~ U(0.1, 0.2).
"""

from __future__ import annotations

import os

from semiuhpe_tpu.data.datasets.unlabeled import UnlabeledHeads

_FOLDERS = {
    "COCOHead": "head_images_wild_30_hp",
    "CrowdHuman": "head_images_wild_30_ch",
    "OpenImage": "head_images_wild_30_oi",
}


def scan_wildhead(db_path: str):
    names = []
    for folder in _FOLDERS.values():
        full = os.path.join(db_path, folder)
        if os.path.isdir(full):
            names += os.listdir(full)
    names.sort()
    img_files, bboxes = [], []
    for name in names:
        folder = next((f for key, f in _FOLDERS.items() if key in name), None)
        if folder is None:
            continue
        x, y, w, h = (int(v) for v in name[:-4].split("_")[-1].split(","))
        img_files.append(os.path.join(db_path, folder, name))
        bboxes.append([x, y, w, h])
    return img_files, bboxes


def make_wildhead(phase: str, config):
    assert phase == "ulb_train", phase
    img_files, bboxes = scan_wildhead(config.data_dir_WildHead)
    return UnlabeledHeads(img_files, bboxes, ad_base=0.1, top_scale=1.0,
                          rotate_aug=getattr(config, "rotate_aug", False),
                          out_size=getattr(config, "input_size", 224),
                          raw_views=getattr(config, "device_views", False))
