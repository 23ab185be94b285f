"""Body-head association: match part detections to body offset predictions.

Behavioral parity with the reference's ``post_process_batch`` + inside-IoU
gate (/root/reference/image.py:56-116, association alg v4.0): each body
detection carries a predicted part-center offset point; every part
detection claims the body whose offset point is nearest, and the match is
accepted only if the part box lies inside the body box (inside-IoU >
``match_iou_thres``) with the highest part confidence winning.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from semiuhpe_tpu.detect.nms import scale_coords


def inside_iou(big_box, small_box) -> float:
    ax0, ay0, ax1, ay1 = big_box[:4]
    bx0, by0, bx1, by1 = small_box[:4]
    w = min(ax1, bx1) - max(ax0, bx0)
    h = min(ay1, by1) - max(ay0, by0)
    if w <= 0 or h <= 0:
        return 0.0
    area_small = (bx1 - bx0) * (by1 - by0)
    return (w * h) / max(area_small, 1e-12)


def associate_body_parts(
    letterbox_shape: Tuple[int, int],
    orig_shape: Tuple[int, int],
    body_dets: np.ndarray,
    part_dets: np.ndarray,
    num_offsets: int = 2,
    match_iou_thres: float = 0.6,
):
    """Returns (bboxes (n,4), points (n, k, 7), scores (n,)) in original
    image coordinates.  points[:, k] = [cx, cy, conf, x1, y1, x2, y2] of the
    matched part (conf 0 when unmatched — the raw offset point)."""
    nbody = body_dets.shape[0]
    if nbody == 0:
        return (np.zeros((0, 4)), np.zeros((0, num_offsets // 2, 7)),
                np.zeros((0,)))

    scores = body_dets[:, 4].copy()
    bboxes = scale_coords(letterbox_shape, body_dets[:, :4].copy(),
                          orig_shape).round()
    points = scale_coords(letterbox_shape, body_dets[:, -num_offsets:].copy(),
                          orig_shape)
    points = points.reshape((nbody, -1, 2))
    points = np.concatenate(
        [points, np.zeros((nbody, points.shape[1], 5))], axis=-1)

    if part_dets.shape[0]:
        pdet = part_dets.copy()
        pdet[:, :4] = scale_coords(letterbox_shape, pdet[:, :4], orig_shape)
        for x1, y1, x2, y2, conf, cls in pdet[:, :6]:
            p_xc, p_yc = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            part_pts = points[:, int(cls - 1)]
            dist = np.linalg.norm(part_pts[:, :2] - np.asarray([[p_xc, p_yc]]),
                                  axis=-1)
            match = int(np.argmin(dist))
            iou = inside_iou(bboxes[match], [x1, y1, x2, y2])
            if conf > part_pts[match][2] and iou > match_iou_thres:
                points[match, int(cls - 1)] = [p_xc, p_yc, conf, x1, y1, x2, y2]
    return bboxes, points, scores
