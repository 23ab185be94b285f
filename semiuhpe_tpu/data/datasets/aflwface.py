"""AFLWFace unlabeled dataset (19-landmark crops, front-range ablation).

Parity with /root/reference/src/datasets/dataset_AFLWFace.py:
``AFLWinfo_release.mat`` (24,386 faces, landmarks (2, 19)), faces whose
image appears in AFLW2000.txt excluded (no test leakage), landmark-driven
crop with ad ~ U(0.2, 0.4) and double top headroom.
"""

from __future__ import annotations

from os.path import join

import scipy.io as sio

from semiuhpe_tpu.data.datasets.unlabeled import UnlabeledHeads

TOTAL_FACES = 24386


def scan_aflwface(db_path: str):
    mat = sio.loadmat(join(db_path, "AFLWinfo_release.mat"))
    lms = mat["data"].reshape((TOTAL_FACES, 2, 19))
    exclude = {ln.strip() for ln in open(join(db_path, "AFLW2000.txt"))}
    img_files, landmarks = [], []
    for i in range(TOTAL_FACES):
        name = mat["nameList"][i, 0][0]
        base = name.split("/")[-1]
        if base in exclude:
            continue
        img_files.append(join(db_path, "images", base))
        landmarks.append(lms[i])
    return img_files, landmarks


def make_aflwface(phase: str, config):
    assert phase == "ulb_train", phase
    img_files, landmarks = scan_aflwface(config.data_dir_AFLWFace)
    return UnlabeledHeads(img_files, landmarks, landmarks=True,
                          rotate_aug=getattr(config, "rotate_aug", False),
                          out_size=getattr(config, "input_size", 224),
                          raw_views=getattr(config, "device_views", False))
