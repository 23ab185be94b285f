"""Host-side detection post-processing: letterbox, offset-aware NMS,
coordinate scaling.

Behavioral parity with /root/reference/utils/general.py (xywh2xyxy,
non_max_suppression with body-part offset columns, scale_coords incl. the
point variant) and utils/datasets.py letterbox.  Runs in numpy — detection
counts are tiny and dynamic, the wrong shape for the accelerator.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


def letterbox(img: np.ndarray, new_shape=1536, color=(114, 114, 114),
              stride=64) -> Tuple[np.ndarray, Tuple[float, float], Tuple[float, float]]:
    """Resize keeping aspect ratio and pad to a stride multiple."""
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    dw = dw % stride / 2
    dh = dh % stride / 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, (r, r), (dw, dh)


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    y = x.copy()
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, 4) x (m, 4) xyxy IoU matrix."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-12)


def _greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = box_iou(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_thres]
    return np.asarray(keep, np.int64)


def non_max_suppression(prediction: np.ndarray, conf_thres: float = 0.25,
                        iou_thres: float = 0.45,
                        classes: Optional[Sequence[int]] = None,
                        agnostic: bool = False, max_det: int = 300,
                        num_offsets: int = 2) -> List[np.ndarray]:
    """Per-image detections (n, 6+num_offsets): xyxy, conf, cls, offsets.
    Parity with the reference NMS (utils/general.py:587-687), best-class
    mode, class-offset trick for batched class-aware suppression."""
    nc = prediction.shape[2] - 5 - num_offsets
    max_wh = 4096
    max_nms = 30000
    output = []
    for x in prediction:
        x = x[x[:, 4] > conf_thres]
        if not x.shape[0]:
            output.append(np.zeros((0, 6 + num_offsets), np.float32))
            continue
        x = x.copy()
        x[:, 5:5 + nc] *= x[:, 4:5]  # conf = obj * cls
        box = xywh2xyxy(x[:, :4])
        conf = x[:, 5:5 + nc].max(1, keepdims=True)
        j = x[:, 5:5 + nc].argmax(1)[:, None].astype(np.float32)
        x = np.concatenate([box, conf, j, x[:, 5 + nc:]], 1)
        x = x[conf.ravel() > conf_thres]
        if classes is not None:
            x = x[np.isin(x[:, 5], np.asarray(classes))]
        n = x.shape[0]
        if not n:
            output.append(np.zeros((0, 6 + num_offsets), np.float32))
            continue
        if n > max_nms:
            x = x[x[:, 4].argsort()[::-1][:max_nms]]
        c = x[:, 5:6] * (0 if agnostic else max_wh)
        keep = _greedy_nms(x[:, :4] + c, x[:, 4], iou_thres)[:max_det]
        output.append(x[keep].astype(np.float32))
    return output


def scale_coords(img1_shape, coords: np.ndarray, img0_shape,
                 is_points: bool = False) -> np.ndarray:
    """Rescale coords from the letterboxed frame back to the original image.
    ``coords`` is (n, 4) boxes or (n, 2k) point pairs."""
    gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
    pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
           (img1_shape[0] - img0_shape[0] * gain) / 2)
    coords = coords.copy()
    coords[:, 0::2] -= pad[0]
    coords[:, 1::2] -= pad[1]
    coords /= gain
    coords[:, 0::2] = coords[:, 0::2].clip(0, img0_shape[1])
    coords[:, 1::2] = coords[:, 1::2].clip(0, img0_shape[0])
    return coords
