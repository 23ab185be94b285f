"""Phong per-vertex lighting feeding the native rasterizer.

Behavioral parity with /root/reference/Sim3DR/lighting.py RenderPipeline:
ambient + diffuse + specular components computed per vertex in numpy, the
shaded colors rasterized by the C++ kernel.
"""

from __future__ import annotations

import numpy as np

from semiuhpe_tpu.render.native import get_normal, rasterize


def _norm_rows(arr):
    return arr / np.sqrt(np.sum(arr**2, axis=1))[:, None]


def _norm_vertices(vertices):
    vertices = vertices - vertices.min(0)[None, :]
    vertices /= vertices.max()
    vertices *= 2
    vertices -= vertices.max(0)[None, :] / 2
    return vertices


def _as_row(v):
    if isinstance(v, (tuple, list)):
        return np.asarray(v, np.float32)[None, :]
    return v


class RenderPipeline:
    def __init__(self, intensity_ambient=0.3, color_ambient=(1, 1, 1),
                 intensity_directional=0.6, color_directional=(1, 1, 1),
                 intensity_specular=0.1, specular_exp=5,
                 light_pos=(0, 0, 5), view_pos=(0, 0, 5)):
        self.intensity_ambient = _as_row(intensity_ambient)
        self.color_ambient = _as_row(color_ambient)
        self.intensity_directional = _as_row(intensity_directional)
        self.color_directional = _as_row(color_directional)
        self.intensity_specular = _as_row(intensity_specular)
        self.specular_exp = specular_exp
        self.light_pos = _as_row(light_pos)
        self.view_pos = _as_row(view_pos)

    def __call__(self, vertices, triangles, bg, texture=None):
        normal = get_normal(vertices, triangles)

        light = np.zeros_like(vertices, dtype=np.float32)
        if np.any(self.intensity_ambient > 0):
            light += self.intensity_ambient * self.color_ambient

        vertices_n = _norm_vertices(vertices.astype(np.float32).copy())
        if np.any(self.intensity_directional > 0):
            direction = _norm_rows(self.light_pos - vertices_n)
            cos = np.sum(normal * direction, axis=1)[:, None]
            light += self.intensity_directional * (
                self.color_directional * np.clip(cos, 0, 1))
            if np.any(self.intensity_specular > 0):
                v2v = _norm_rows(self.view_pos - vertices_n)
                reflection = 2 * cos * normal - direction
                spe = np.sum((v2v * reflection) ** self.specular_exp,
                             axis=1)[:, None]
                spe = np.where(cos != 0, np.clip(spe, 0, 1),
                               np.zeros_like(spe))
                light += (self.intensity_specular * self.color_directional
                          * np.clip(spe, 0, 1))
        light = np.clip(light, 0, 1)

        colors = light if texture is None else np.clip(texture * light, 0, 1)
        return rasterize(vertices, triangles, colors, bg=bg)
