"""COCOHead unlabeled dataset (HumanParts / Hier-R-CNN head boxes).

Parity with /root/reference/src/datasets/dataset_COCOHead.py: val+train2017
images, per-instance ``hier`` field (head box = first 5 of 30: x1,y1,x2,y2,v),
heads smaller than 30px dropped, center-based crop with ad ~ U(0.1, 0.2).
"""

from __future__ import annotations

import json
import os

from semiuhpe_tpu.data.datasets.unlabeled import UnlabeledHeads, sort_labels_by_image_id

MIN_HEAD_SIZE = 30


def scan_cocohead(db_path: str):
    img_files, bboxes = [], []
    pairs = [
        (os.path.join(db_path, "images/val2017"),
         os.path.join(db_path, "annotations_HumanParts/person_humanparts_val2017.json")),
        (os.path.join(db_path, "images/train2017"),
         os.path.join(db_path, "annotations_HumanParts/person_humanparts_train2017.json")),
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
                h_bbox = inst["hier"][:5]  # [x1, y1, x2, y2, v]
                if h_bbox[-1] == 0:
                    continue
                w, h = h_bbox[2] - h_bbox[0], h_bbox[3] - h_bbox[1]
                if w < MIN_HEAD_SIZE or h < MIN_HEAD_SIZE:
                    continue
                img_files.append(path)
                bboxes.append([h_bbox[0], h_bbox[1], w, h])
    return img_files, bboxes


def make_cocohead(phase: str, config):
    assert phase == "ulb_train", phase
    img_files, bboxes = scan_cocohead(config.data_dir_COCOHead)
    return UnlabeledHeads(img_files, bboxes, ad_base=0.1, top_scale=1.0,
                          rotate_aug=getattr(config, "rotate_aug", False),
                          out_size=getattr(config, "input_size", 224),
                          raw_views=getattr(config, "device_views", False))
