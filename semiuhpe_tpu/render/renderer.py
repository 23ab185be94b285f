"""Head-mesh renderer: 6DoF pose -> projected vertices -> shaded overlay.

Behavioral parity with /root/reference/src/renderer.py: per-pose rigid
transform + pinhole projection with bbox-derived intrinsics, depth sign
flip, scale by (h+w)/tz with a depth offset, Phong-lit z-buffer composite,
OBJ export.  The mesh defaults to the procedural head (headmesh.py) but
accepts FLAME-style .npy asset paths.
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

from semiuhpe_tpu.render.headmesh import make_head_mesh
from semiuhpe_tpu.render.lighting import RenderPipeline


def transform_points(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    return points @ Rotation.from_rotvec(pose[:3]).as_matrix().T + pose[3:]


def project_points(verts: np.ndarray, pose: np.ndarray,
                   intrinsics: np.ndarray):
    cam = transform_points(verts, pose)
    proj = (intrinsics @ cam.T).T
    uv = proj[:, :2] / proj[:, 2:3]
    return uv, proj


def get_colors(img: np.ndarray, ver: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    ver = ver.copy()
    ver[0, :] = np.clip(ver[0, :], 0, w - 1)
    ver[1, :] = np.clip(ver[1, :], 0, h - 1)
    ind = np.round(ver).astype(np.int32)
    return (img[ind[1, :], ind[0, :], :] / 255.0).copy()


class Renderer:
    def __init__(self, vertices_path: Optional[str] = None,
                 triangles_path: Optional[str] = None):
        if vertices_path is not None and triangles_path is not None:
            self.vertices = np.load(vertices_path).astype(np.float32)
            self.triangles = np.ascontiguousarray(np.load(triangles_path).T,
                                                  np.int32)
        else:
            self.vertices, self.triangles = make_head_mesh()
            self.vertices = self.vertices.copy()
        self.vertices[:, 0] *= -1  # mirror x (reference convention)

        self.pipeline = RenderPipeline(
            intensity_ambient=0.3, color_ambient=(1, 1, 1),
            intensity_directional=0.6, color_directional=(1, 1, 1),
            intensity_specular=0.1, specular_exp=5,
            light_pos=(0, 0, 5), view_pos=(0, 0, 5))

    def transform_vertices(self, img: np.ndarray, poses: List[np.ndarray],
                           global_intrinsics: Optional[np.ndarray] = None):
        h, w = img.shape[:2]
        if global_intrinsics is None:
            global_intrinsics = np.array(
                [[w + h, 0, w // 2], [0, w + h, h // 2], [0, 0, 1]], np.float64)

        out = []
        for pose in poses:
            pose = np.asarray(pose, np.float64)
            projected = np.zeros_like(self.vertices)
            uv, cam = project_points(self.vertices, pose, global_intrinsics)
            projected[:, :2] = uv
            projected[:, 2] = -cam[:, 2]

            range_x = projected[:, 0].max() - projected[:, 0].min()
            range_y = projected[:, 1].max() - projected[:, 1].min()
            s = (h + w) / pose[5]
            projected[:, 2] *= s
            projected[:, 2] += (range_x + range_y) * 3
            out.append(projected.astype(np.float32))
        return out

    def render(self, img: np.ndarray, transformed_vertices, alpha: float = 0.9,
               save_path: Optional[str] = None) -> np.ndarray:
        img = np.asarray(img)
        overlap = img.copy()
        for vertices in transformed_vertices:
            overlap = self.pipeline(np.ascontiguousarray(vertices),
                                    self.triangles, overlap)
        res = cv2.addWeighted(img, 1 - alpha, overlap, alpha, 0)
        if save_path is not None:
            cv2.imwrite(save_path, res)
        return res

    def save_to_obj(self, img: np.ndarray, ver_lst, height: int,
                    save_path: str) -> None:
        if not ver_lst:
            return
        n_vertex = ver_lst[0].shape[0]
        with open(save_path, "w") as f:
            for ver_obj in ver_lst:
                ver = ver_obj.T
                colors = get_colors(img, ver)
                for j in range(n_vertex):
                    x, y, z = ver[:, j]
                    f.write(f"v {x:.2f} {height - y:.2f} {z:.2f} "
                            f"{colors[j, 2]:.2f} {colors[j, 1]:.2f} "
                            f"{colors[j, 0]:.2f}\n")
            for i in range(len(ver_lst)):
                offset = i * n_vertex
                for tri in self.triangles:
                    i1, i2, i3 = (int(v) for v in tri)
                    f.write(f"f {i3 + 1 + offset} {i2 + 1 + offset} "
                            f"{i1 + 1 + offset}\n")
