"""Multi-person image pipeline: detect -> associate -> pose -> render.

Parity with /root/reference/image.py: BPJDet YOLOv5 body-head detection
(letterbox 1536, conf 0.5, iou 0.75), offset-driven body-head association
(inside-IoU 0.6), square head crops (edges_scale -0.05), batched pose
inference, head-mesh overlays.

Usage:
    python -m semiuhpe_tpu.cli.image <ckpt_dir> --img_path path.jpg \
        --det_weights weights/bpjdet_l6.npz --config settings/...yml
"""

from __future__ import annotations

import argparse
import sys

import cv2

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.cli.infer_common import Detector, PoseModel, render_heads
from semiuhpe_tpu.cli.train import setup_compile_cache
from semiuhpe_tpu.render.renderer import Renderer


def main(argv=None):
    setup_compile_cache()
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--img_path", type=str, required=True)
    extra.add_argument("--det_weights", type=str, default=None)
    extra.add_argument("--det_variant", type=str, default="l6")
    extra.add_argument("--imgsz", type=int, default=1536)
    extra.add_argument("--conf_thres_det", type=float, default=0.5)
    extra.add_argument("--iou_thres_det", type=float, default=0.75)
    extra.add_argument("--match_iou_thres", type=float, default=0.6)
    extra.add_argument("--alpha", type=float, default=1.0)
    args, rest = extra.parse_known_args(argv)

    config = get_config("test", rest)
    pose = PoseModel(config)
    renderer = Renderer()
    detector = Detector(args.det_weights, args.det_variant, args.imgsz,
                        args.conf_thres_det, args.iou_thres_det,
                        args.match_iou_thres)

    import os

    if os.path.isdir(args.img_path):
        paths = [os.path.join(args.img_path, n)
                 for n in sorted(os.listdir(args.img_path))
                 if n.lower().endswith((".jpg", ".jpeg", ".png"))]
    else:
        paths = [args.img_path]

    outs = []
    for path in paths:
        img = cv2.imread(path)
        assert img is not None, f"cannot read {path}"
        bboxes, points, scores = detector.detect_heads(img)

        # Keep only body detections with a matched head (image.py:186-190).
        head_bboxes = [p[0][3:7] for p in points if p[0][2] != 0]
        out = render_heads(img, pose, renderer, head_bboxes, alpha=args.alpha)
        out_path = path[:-4] + "_res_BPJDetSemiUHPE.jpg"
        cv2.imwrite(out_path, out)
        print(f"{len(head_bboxes)} heads -> {out_path}")
        outs.append(out_path)
    return outs if os.path.isdir(args.img_path) else outs[0]


if __name__ == "__main__":
    main(sys.argv[1:])
