"""Multi-person video pipeline: per-frame detect -> pose -> render -> mp4.

Parity with /root/reference/video.py (frame loop, FPS overlay, mp4 writer;
gif export optional via --gif).

Usage:
    python -m semiuhpe_tpu.cli.video <ckpt_dir> --video_path in.mp4 \
        --det_weights weights/bpjdet_l6.npz --config settings/...yml
"""

from __future__ import annotations

import argparse
import sys
import time

import cv2

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.cli.infer_common import Detector, PoseModel, render_heads
from semiuhpe_tpu.cli.train import setup_compile_cache
from semiuhpe_tpu.render.renderer import Renderer


def main(argv=None):
    setup_compile_cache()
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--video_path", type=str, required=True)
    extra.add_argument("--out_path", type=str, default=None)
    extra.add_argument("--det_weights", type=str, default=None)
    extra.add_argument("--det_variant", type=str, default="l6")
    extra.add_argument("--imgsz", type=int, default=1536)
    extra.add_argument("--conf_thres_det", type=float, default=0.5)
    extra.add_argument("--iou_thres_det", type=float, default=0.75)
    extra.add_argument("--match_iou_thres", type=float, default=0.6)
    extra.add_argument("--alpha", type=float, default=1.0)
    extra.add_argument("--max_frames", type=int, default=0)
    extra.add_argument("--gif", action="store_true")
    args, rest = extra.parse_known_args(argv)

    config = get_config("test", rest)
    pose = PoseModel(config)
    renderer = Renderer()
    detector = Detector(args.det_weights, args.det_variant, args.imgsz,
                        args.conf_thres_det, args.iou_thres_det,
                        args.match_iou_thres)

    cap = cv2.VideoCapture(args.video_path)
    assert cap.isOpened(), f"cannot open {args.video_path}"
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out_path = args.out_path or args.video_path[:-4] + "_res_BPJDetSemiUHPE.mp4"
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    gif_frames = []

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t0 = time.time()
        _, points, _ = detector.detect_heads(frame)
        head_bboxes = [p[0][3:7] for p in points if p[0][2] != 0]
        out = render_heads(frame, pose, renderer, head_bboxes,
                           alpha=args.alpha, draw_boxes=False)
        dt = time.time() - t0
        cv2.putText(out, f"FPS {1.0 / max(dt, 1e-6):.1f}", (5, h - 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 255), 2)
        writer.write(out)
        if args.gif:
            gif_frames.append(cv2.cvtColor(
                cv2.resize(out, (w // 2, h // 2)), cv2.COLOR_BGR2RGB))
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    writer.release()

    if args.gif and gif_frames:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in gif_frames]
        gif_path = out_path[:-4] + ".gif"
        imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        print(f"gif -> {gif_path}")
    print(f"{n} frames -> {out_path}")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1:])
