"""On-device batched mesh rasterizer (pure JAX, jit/vmap-able).

The C++ kernel (render/csrc) serves host-side single-image visualization
like the reference's Sim3DR; this module adds what the reference never
had: a vectorized z-buffer rasterizer that renders a whole batch of posed
heads on the TPU in one jit program — useful for training-time
visualization summaries and for synthetic-data generation on device.

Algorithm: triangles are processed in chunks under ``lax.scan``; for each
chunk the barycentric inside-test + depth interpolation is evaluated for
every pixel (VPU-friendly broadcasted iotas), the chunk's nearest triangle
per pixel is reduced, then merged into the running (depth, color) buffers.
Static shapes throughout; memory bounded by chunk * H * W.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _edge(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize_batch(vertices: jnp.ndarray, triangles: jnp.ndarray,
                    colors: jnp.ndarray, background: jnp.ndarray,
                    height: int = 224, width: int = 224,
                    chunk: int = 32) -> jnp.ndarray:
    """vertices (B, V, 3) in pixel coords (x, y, depth: larger = closer);
    triangles (T, 3) int32; colors (B, V, 3) in [0, 1];
    background (B, H, W, 3) float in [0, 1] -> rendered (B, H, W, 3)."""

    t = triangles.shape[0]
    pad = (-t) % chunk
    tris = jnp.concatenate(
        [triangles, jnp.zeros((pad, 3), triangles.dtype)], 0) if pad else triangles
    valid = jnp.concatenate(
        [jnp.ones((t,), bool), jnp.zeros((pad,), bool)]) if pad else jnp.ones((t,), bool)
    tris = tris.reshape(-1, chunk, 3)
    valid = valid.reshape(-1, chunk)

    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)

    def render_one(verts, cols, bg):
        def body(carry, inp):
            zbuf, img = carry
            tri, ok = inp  # (chunk, 3), (chunk,)
            v0 = verts[tri[:, 0]]  # (chunk, 3)
            v1 = verts[tri[:, 1]]
            v2 = verts[tri[:, 2]]
            c0 = cols[tri[:, 0]]
            c1 = cols[tri[:, 1]]
            c2 = cols[tri[:, 2]]

            area = _edge(v0[:, 0], v0[:, 1], v1[:, 0], v1[:, 1],
                         v2[:, 0], v2[:, 1])  # (chunk,)
            inv = jnp.where(jnp.abs(area) < 1e-12, 0.0, 1.0 / area)

            px = xs[None]  # (1, H, W)
            py = ys[None]
            w0 = _edge(v1[:, 0, None, None], v1[:, 1, None, None],
                       v2[:, 0, None, None], v2[:, 1, None, None], px, py)
            w1 = _edge(v2[:, 0, None, None], v2[:, 1, None, None],
                       v0[:, 0, None, None], v0[:, 1, None, None], px, py)
            w2 = _edge(v0[:, 0, None, None], v0[:, 1, None, None],
                       v1[:, 0, None, None], v1[:, 1, None, None], px, py)
            w0 = w0 * inv[:, None, None]
            w1 = w1 * inv[:, None, None]
            w2 = w2 * inv[:, None, None]
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (inv != 0)[:, None, None]
            inside = inside & ok[:, None, None]

            depth = (w0 * v0[:, 2, None, None] + w1 * v1[:, 2, None, None]
                     + w2 * v2[:, 2, None, None])
            depth = jnp.where(inside, depth, -jnp.inf)  # (chunk, H, W)

            best = jnp.argmax(depth, axis=0)  # (H, W)
            best_depth = jnp.max(depth, axis=0)

            def gather(w):
                return jnp.take_along_axis(w, best[None], axis=0)[0]

            bw0, bw1, bw2 = gather(w0), gather(w1), gather(w2)
            bc = (bw0[..., None] * c0[best] + bw1[..., None] * c1[best]
                  + bw2[..., None] * c2[best])  # (H, W, 3)

            win = best_depth > zbuf
            zbuf = jnp.where(win, best_depth, zbuf)
            img = jnp.where(win[..., None], bc, img)
            return (zbuf, img), None

        init = (jnp.full((height, width), -jnp.inf), bg)
        (zbuf, img), _ = jax.lax.scan(body, init, (tris, valid))
        return img

    return jax.vmap(render_one)(vertices, colors, background)


def phong_vertex_colors(vertices: jnp.ndarray, normals: jnp.ndarray,
                        intensity_ambient: float = 0.3,
                        intensity_directional: float = 0.6,
                        light_dir: Tuple[float, float, float] = (0.0, 0.0, 1.0)
                        ) -> jnp.ndarray:
    """Simple on-device per-vertex shading (ambient + diffuse)."""
    light = jnp.asarray(light_dir)
    light = light / jnp.linalg.norm(light)
    cos = jnp.clip(jnp.einsum("...vk,k->...v", normals, light), 0.0, 1.0)
    shade = intensity_ambient + intensity_directional * cos
    return jnp.clip(shade, 0.0, 1.0)[..., None].repeat(3, -1)


def vertex_normals(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """(..., V, 3) area-weighted vertex normals (jax, batched)."""
    v0 = vertices[..., triangles[:, 0], :]
    v1 = vertices[..., triangles[:, 1], :]
    v2 = vertices[..., triangles[:, 2], :]
    fn = jnp.cross(v1 - v0, v2 - v0)  # (..., T, 3)
    v = vertices.shape[-2]
    out = jnp.zeros(vertices.shape)
    for k in range(3):
        out = out.at[..., triangles[:, k], :].add(fn)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-12)
