"""Pose visualization helpers: crop-pose -> full-image 6DoF, axis drawing.

Behavioral parity with /root/reference/src/vis_plot.py: the bbox-intrinsics
trick lifting a crop-local pose to global image coordinates
(pose_bbox_to_full_image), the Euler- and rotation-matrix-based 6DoF
converters (incl. the rot-180 DAD frame flip), and HopeNet-style
yaw/pitch/roll axis drawing.
"""

from __future__ import annotations

import cv2
import numpy as np
from scipy.spatial.transform import Rotation


def bbox_is_dict(bbox):
    if not isinstance(bbox, dict):
        bbox = {"left": bbox[0], "top": bbox[1],
                "right": bbox[2], "bottom": bbox[3]}
    return bbox


def get_bbox_intrinsics(image_intrinsics: np.ndarray, bbox: dict) -> np.ndarray:
    cx = bbox["left"] + ((bbox["right"] - bbox["left"]) // 2)
    cy = bbox["top"] + ((bbox["bottom"] - bbox["top"]) // 2)
    out = image_intrinsics.copy()
    out[0, 2] = cx
    out[1, 2] = cy
    return out


def pose_bbox_to_full_image(pose: np.ndarray, image_intrinsics: np.ndarray,
                            bbox) -> np.ndarray:
    """Lift a crop-local 6DoF pose (rotvec + tvec) into the full image frame
    using the bbox-centered intrinsics."""
    bbox = bbox_is_dict(bbox)
    rvec = pose[:3].copy()
    tvec = pose[3:].copy()

    bbox_intrinsics = get_bbox_intrinsics(image_intrinsics, bbox)
    focal_length = image_intrinsics[0, 0]
    bbox_size = (bbox["right"] - bbox["left"] + bbox["bottom"] - bbox["top"]) * 0.25
    tvec[2] *= focal_length / bbox_size

    projected = bbox_intrinsics @ tvec.T
    tvec = projected @ np.linalg.inv(image_intrinsics.T)

    rmat = Rotation.from_rotvec(rvec).as_matrix()
    projected = bbox_intrinsics @ rmat
    rmat = np.linalg.inv(image_intrinsics) @ projected
    rvec = Rotation.from_matrix(rmat).as_rotvec()
    return np.concatenate([rvec, tvec])


def convert_euler_bbox_to_6dof(euler_angle, bbox, global_intrinsics):
    """Front-range (300WLP/AFLW2000/BIWI) Euler + bbox -> global 6DoF."""
    pitch, yaw, roll = euler_angle
    rot_mat = Rotation.from_euler(
        "xyz", [pitch, -yaw, -roll], degrees=True).as_matrix().T
    rotvec = Rotation.from_matrix(rot_mat).as_rotvec()
    local_pose = np.array([rotvec[0], rotvec[1], rotvec[2], 0, 0, 1])
    return pose_bbox_to_full_image(local_pose, global_intrinsics,
                                   bbox_is_dict(bbox)).tolist()


def convert_rotmat_bbox_to_6dof(rot_mat, bbox, global_intrinsics):
    """Full-range DAD-frame rotation matrix + bbox -> global 6DoF
    (conjugates through rot_180 and negates the x rotvec component,
    vis_plot.py:90-103)."""
    rot_180 = np.diag([1.0, -1.0, -1.0])
    m = (rot_180 @ np.asarray(rot_mat)).T
    rotvec = Rotation.from_matrix(m).as_rotvec()
    local_pose = np.array([-rotvec[0], rotvec[1], rotvec[2], 0, 0, 1])
    return pose_bbox_to_full_image(local_pose, global_intrinsics,
                                   bbox_is_dict(bbox)).tolist()


def draw_axis_ypr(img, yaw, pitch, roll, tdx=None, tdy=None, size=100):
    """Draw the head axes (x red, y green, z blue), HopeNet convention."""
    pitch = np.radians(pitch)
    yaw = -np.radians(yaw)
    roll = np.radians(roll)

    if tdx is None or tdy is None:
        height, width = img.shape[:2]
        tdx, tdy = width / 2, height / 2

    x1 = size * (np.cos(yaw) * np.cos(roll)) + tdx
    y1 = size * (np.cos(pitch) * np.sin(roll)
                 + np.cos(roll) * np.sin(pitch) * np.sin(yaw)) + tdy
    x2 = size * (-np.cos(yaw) * np.sin(roll)) + tdx
    y2 = size * (np.cos(pitch) * np.cos(roll)
                 - np.sin(pitch) * np.sin(yaw) * np.sin(roll)) + tdy
    x3 = size * np.sin(yaw) + tdx
    y3 = size * (-np.cos(yaw) * np.sin(pitch)) + tdy

    cv2.line(img, (int(tdx), int(tdy)), (int(x1), int(y1)), (0, 0, 255), 2)
    cv2.line(img, (int(tdx), int(tdy)), (int(x2), int(y2)), (0, 255, 0), 2)
    cv2.line(img, (int(tdx), int(tdy)), (int(x3), int(y3)), (255, 0, 0), 2)
    return img
