"""Shared pieces of the inference CLIs (predict / image / video).

Pose head loading, full-range vs front-range Euler extraction, head-crop
preprocessing, detector loading, and the detect -> associate -> crop ->
pose -> render pipeline step used by image.py/video.py equivalents.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from semiuhpe_tpu.data.augments_host import normalize
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.render.renderer import Renderer
from semiuhpe_tpu.render.vis_plot import (
    convert_euler_bbox_to_6dof, convert_rotmat_bbox_to_6dof)
from semiuhpe_tpu.training.checkpoints import load_checkpoint
from semiuhpe_tpu.training.state import create_train_state


class PoseModel:
    """Loaded pose network with a jitted batched forward -> rotation."""

    def __init__(self, config, use_ema: bool = False):
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.config = config
        self.size = config.input_size
        net = build_network(config.network, num_outputs=config.num_classes,
                            dtype=dtype)
        with jax.default_device(jax.devices()[0]):
            template = jax.jit(lambda k: create_train_state(
                net, k, (self.size, self.size, 3), config.lr, dtype)
            )(jax.random.key(0))
        state = load_checkpoint("", config.test_ckpt, template)
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats

        @jax.jit
        def forward(img):
            out = net.apply({"params": params, "batch_stats": stats}, img,
                            train=False)
            return so3.special_procrustes(out.reshape(-1, 3, 3))

        self._forward = forward

    def rotations(self, crops: np.ndarray) -> np.ndarray:
        """(n, s, s, 3) normalized crops -> (n, 3, 3) rotations."""
        return np.asarray(self._forward(jnp.asarray(crops)))

    def euler_from_rot(self, rot: np.ndarray) -> Tuple[float, float, float]:
        """(pitch, yaw, roll) degrees via the convention matching the
        training set (full-range DAD frame vs front-range 6DRepNet)."""
        if self.config.train_labeled == "DAD3DHeads":
            from scipy.spatial.transform import Rotation

            ax, ay, az = Rotation.from_matrix(np.transpose(rot)).as_euler(
                "xyz", degrees=True)
            return (so3.limit_angle(ax - 180.0), so3.limit_angle(ay),
                    so3.limit_angle(az))
        e = np.degrees(np.asarray(so3.matrix_to_euler(
            jnp.asarray(rot[None]), full_range=False)))[0]
        return float(e[0]), float(e[1]), float(e[2])

    def global_pose(self, rot: np.ndarray, bbox, intrinsics) -> list:
        if self.config.train_labeled == "DAD3DHeads":
            return convert_rotmat_bbox_to_6dof(rot, bbox, intrinsics)
        pitch, yaw, roll = self.euler_from_rot(rot)
        return convert_euler_bbox_to_6dof([pitch, yaw, roll], bbox, intrinsics)


def square_head_crop(img_bgr: np.ndarray, head_bbox, edges_scale: float = -0.05,
                     size: int = 224):
    """Square crop around a detected head box (image.py:198-209) ->
    (normalized crop, used bbox)."""
    img_h, img_w = img_bgr.shape[:2]
    px1, py1, px2, py2 = head_bbox
    pcx, pcy = (px1 + px2) / 2.0, (py1 + py2) / 2.0
    head_size = max(px2 - px1, py2 - py1)
    nx1 = max(0, int(pcx - (0.5 - edges_scale) * head_size))
    nx2 = min(img_w - 1, int(pcx + (0.5 - edges_scale) * head_size))
    ny1 = max(0, int(pcy - (0.5 - edges_scale) * head_size))
    ny2 = min(img_h - 1, int(pcy + (0.5 - edges_scale) * head_size))
    crop = img_bgr[ny1:ny2, nx1:nx2, ::-1]  # BGR -> RGB
    pil = Image.fromarray(crop).resize((size, size))
    return normalize(pil).astype(np.float32), [nx1, ny1, nx2, ny2]


class Detector:
    """BPJDet body-head detector wrapper (flax YOLOv5-P6)."""

    def __init__(self, weights_path: Optional[str], variant: str = "l6",
                 imgsz: int = 1536, conf_thres: float = 0.5,
                 iou_thres: float = 0.75, match_iou_thres: float = 0.6,
                 num_offsets: int = 2):
        from semiuhpe_tpu.detect import yolov5_bpjdet

        self.imgsz = imgsz
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.match_iou_thres = match_iou_thres
        self.num_offsets = num_offsets
        self.model = yolov5_bpjdet(variant, nc=2, num_offsets=num_offsets)
        if weights_path:
            from semiuhpe_tpu.detect.convert import load_bpjdet_weights

            self.variables = load_bpjdet_weights(self.model, weights_path)
        else:
            self.variables = self.model.init(
                {"params": jax.random.key(0)},
                jnp.zeros((1, 128, 128, 3)), train=False)
        self._forward = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))

    def detect_heads(self, img_bgr: np.ndarray):
        """Full image -> (body bboxes, head points (n, 1, 7), scores)."""
        from semiuhpe_tpu.detect.association import associate_body_parts
        from semiuhpe_tpu.detect.nms import letterbox, non_max_suppression

        boxed, _, _ = letterbox(img_bgr, self.imgsz, stride=64)
        rgb = boxed[:, :, ::-1].astype(np.float32) / 255.0
        pred = np.asarray(self._forward(self.variables, jnp.asarray(rgb[None])))
        body = non_max_suppression(pred, self.conf_thres, self.iou_thres,
                                   classes=[0], num_offsets=self.num_offsets)[0]
        part = non_max_suppression(pred, self.conf_thres, self.iou_thres,
                                   classes=list(range(1, 2)),
                                   num_offsets=self.num_offsets)[0]
        return associate_body_parts(
            boxed.shape[:2], img_bgr.shape[:2], body, part,
            num_offsets=self.num_offsets, match_iou_thres=self.match_iou_thres)


def render_heads(img_bgr: np.ndarray, pose_model: PoseModel,
                 renderer: Renderer, head_bboxes: List,
                 alpha: float = 1.0, draw_boxes: bool = True) -> np.ndarray:
    """Crop every head, run the pose net in one batch, render overlays."""
    img_h, img_w = img_bgr.shape[:2]
    intrinsics = np.array([[img_w + img_h, 0, img_w // 2],
                           [0, img_w + img_h, img_h // 2], [0, 0, 1]], np.float64)
    out = img_bgr.copy()
    if not head_bboxes:
        return out
    crops, used_bboxes = [], []
    for hb in head_bboxes:
        crop, used = square_head_crop(img_bgr, hb, size=pose_model.size)
        crops.append(crop)
        used_bboxes.append(used)
    rots = pose_model.rotations(np.stack(crops))
    for rot, bbox in zip(rots, used_bboxes):
        pose = pose_model.global_pose(rot, bbox, intrinsics)
        tv = renderer.transform_vertices(out, [pose])
        out = renderer.render(out, tv, alpha=alpha)
        if draw_boxes:
            cv2.rectangle(out, (bbox[0], bbox[1]), (bbox[2], bbox[3]),
                          (0, 255, 127), 2)
    cv2.putText(out, f"{len(head_bboxes):2d} Heads", (5, 25),
                cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), thickness=2)
    return out
