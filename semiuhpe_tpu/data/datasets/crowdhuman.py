"""CrowdHuman unlabeled dataset (BFJDet head boxes).

Parity with /root/reference/src/datasets/dataset_CrowdHuman.py: val+train
BFJDet jsons with per-instance ``h_bbox`` [x,y,w,h] (zero-sized when head
invisible), ignore-flagged instances removed, heads < 30px dropped,
center-based crop with ad ~ U(0.1, 0.2).
"""

from __future__ import annotations

import json
import os

from semiuhpe_tpu.data.datasets.unlabeled import UnlabeledHeads, sort_labels_by_image_id

MIN_HEAD_SIZE = 30


def scan_crowdhuman(db_path: str):
    img_files, bboxes = [], []
    pairs = [
        (os.path.join(db_path, "yolov5_format/images/val"),
         os.path.join(db_path, "BFJDet/instances_val_full_bhf_new.json")),
        (os.path.join(db_path, "yolov5_format/images/train"),
         os.path.join(db_path, "BFJDet/instances_train_full_bhf_new.json")),
    ]
    for imgs_root, anno_path in pairs:
        anno = json.load(open(anno_path))
        by_image = sort_labels_by_image_id(anno["annotations"])
        for info in anno["images"]:
            image_id = str(info["id"])
            if image_id not in by_image:
                continue
            path = os.path.join(imgs_root, info["file_name"])
            for inst in by_image[image_id]:
                if inst.get("ignore", 0):
                    continue
                h_bbox = inst.get("h_bbox")
                if not h_bbox or h_bbox[2] < MIN_HEAD_SIZE or h_bbox[3] < MIN_HEAD_SIZE:
                    continue
                img_files.append(path)
                bboxes.append(list(h_bbox))
    return img_files, bboxes


def make_crowdhuman(phase: str, config):
    assert phase == "ulb_train", phase
    img_files, bboxes = scan_crowdhuman(config.data_dir_CrowdHuman)
    return UnlabeledHeads(img_files, bboxes, ad_base=0.1, top_scale=1.0,
                          rotate_aug=getattr(config, "rotate_aug", False),
                          out_size=getattr(config, "input_size", 224),
                          raw_views=getattr(config, "device_views", False))
