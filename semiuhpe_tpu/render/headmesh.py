"""Procedural canonical head mesh.

The reference visualizes poses with a FLAME-derived mesh shipped as binary
blobs (pose_references/vertices_trans.npy, triangles.npy).  We do not copy
those assets; instead a recognizable head is generated procedurally: an
ellipsoid with a nose protrusion, eye sockets, chin taper and a flattened
back, triangulated on a UV sphere grid.  The canonical frame matches the
renderer's expectation: x right, y up, z toward the camera (the face looks
along +z); the Renderer mirrors x exactly like the reference does
(src/renderer.py:43-45).

If real FLAME-derived assets are available, pass their paths to
``Renderer`` instead — the formats are interchangeable.
"""

from __future__ import annotations

import functools

import numpy as np


def _bump(theta_dist: float, width: float) -> float:
    return np.exp(-(theta_dist / width) ** 2)


@functools.lru_cache(maxsize=2)
def make_head_mesh(n_lat: int = 48, n_lon: int = 64):
    """Returns (vertices (N,3) float32, triangles (M,3) int32).

    Unit-ish scale: the head fits in [-1, 1]^3.
    """
    lat = np.linspace(1e-3, np.pi - 1e-3, n_lat)  # polar angle from +y pole
    lon = np.linspace(-np.pi, np.pi, n_lon, endpoint=False)
    tt, pp = np.meshgrid(lat, lon, indexing="ij")  # (n_lat, n_lon)

    # Base unit sphere with y up; phi=0 faces +z.
    x = np.sin(tt) * np.sin(pp)
    y = np.cos(tt)
    z = np.sin(tt) * np.cos(pp)

    # Radius field: start from 1, sculpt features in (theta, phi) space.
    r = np.ones_like(tt)

    # Nose: bump around (theta ~ 95deg, phi ~ 0).
    d_nose = np.sqrt(((tt - np.radians(97)) / 0.16) ** 2 + (pp / 0.22) ** 2)
    r += 0.22 * np.exp(-d_nose**2)

    # Eye sockets: slight dents left/right above the nose.
    for sgn in (-1.0, 1.0):
        d_eye = np.sqrt(((tt - np.radians(80)) / 0.14) ** 2
                        + ((pp - sgn * 0.38) / 0.16) ** 2)
        r -= 0.06 * np.exp(-d_eye**2)

    # Chin/jaw: narrow the lower front.
    jaw = np.clip((tt - np.radians(115)) / np.radians(60), 0, 1)
    r -= 0.18 * jaw**2 * np.clip(np.cos(pp), 0, 1)

    # Flatten the back of the skull slightly.
    r -= 0.05 * np.clip(-np.cos(pp), 0, 1) * np.sin(tt) ** 2

    x, y, z = r * x, r * y, r * z
    # Canonical frame measured off the reference FLAME asset
    # (pose_references/vertices_trans.npy): x right (ears at +-0.89), y UP
    # (crown at +1.0), face toward -z (nose tip at (0, -0.07, -0.75)),
    # centered at the origin.  Ellipsoid proportions: narrower than tall,
    # deeper than wide.
    x *= 0.78
    z *= -0.92

    # Overall scale matches the FLAME asset's ~[-0.9, 1.0] span so both
    # meshes project to the same bbox-sized overlay under the renderer's
    # weak-perspective conventions (tests/test_reference_assets.py).
    scale = 0.9
    vertices = (scale * np.stack([x.ravel(), y.ravel(), z.ravel()], -1)
                ).astype(np.float32)

    # Triangulate the grid (wrap in longitude).
    tris = []
    def vid(i, j):
        return i * n_lon + (j % n_lon)

    for i in range(n_lat - 1):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            tris.append([a, c, b])
            tris.append([b, c, d])
    triangles = np.asarray(tris, np.int32)
    return vertices, triangles
