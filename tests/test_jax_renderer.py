"""On-device batch rasterizer tests: agreement with the C++ kernel."""

import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.render import native
from semiuhpe_tpu.render.jax_renderer import (
    phong_vertex_colors, rasterize_batch, vertex_normals)


def _tri_scene():
    verts = np.asarray([[8, 8, 1], [56, 8, 1], [8, 56, 1]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.int32)
    colors = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    return verts, tris, colors


class TestRasterizeBatch:
    def test_matches_native_coverage(self):
        verts, tris, colors = _tri_scene()
        bg = np.zeros((64, 64, 3), np.float32)
        out = np.asarray(rasterize_batch(
            jnp.asarray(verts[None]), jnp.asarray(tris),
            jnp.asarray(colors[None]), jnp.asarray(bg[None]),
            height=64, width=64))[0]
        native_out = native.rasterize(verts, tris, colors,
                                      np.zeros((64, 64, 3), np.uint8))
        jax_fg = out.sum(-1) > 0.05
        native_fg = native_out.sum(-1) > 10
        inter = (jax_fg & native_fg).sum()
        union = (jax_fg | native_fg).sum()
        assert inter / union > 0.95

    def test_depth_order(self):
        verts = np.asarray(
            [[8, 8, 1], [56, 8, 1], [8, 56, 1],
             [8, 8, 5], [56, 8, 5], [8, 56, 5]], np.float32)
        tris = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.concatenate([np.tile([[1, 0, 0]], (3, 1)),
                                 np.tile([[0, 1, 0]], (3, 1))]).astype(np.float32)
        out = np.asarray(rasterize_batch(
            jnp.asarray(verts[None]), jnp.asarray(tris),
            jnp.asarray(colors[None]),
            jnp.zeros((1, 64, 64, 3)), height=64, width=64))[0]
        np.testing.assert_allclose(out[20, 20], [0, 1, 0], atol=1e-5)

    def test_batched_head_render(self):
        from semiuhpe_tpu.render.headmesh import make_head_mesh

        v, t = make_head_mesh(24, 32)
        # Project two posed heads to pixel coords.  The mesh spans ~[-0.9,
        # 0.9] (FLAME canonical frame), so scale 24 px/unit fits a head of
        # ~43 px diameter inside the 64 px frame.
        scale, center = 24.0, 32.0
        rots = np.stack([np.eye(3), np.diag([-1.0, 1.0, -1.0])]).astype(np.float32)
        pv = np.einsum("bij,vj->bvi", rots, v)
        pix = np.stack([pv[..., 0] * scale + center,
                        pv[..., 1] * scale + center,
                        -pv[..., 2] * scale], -1).astype(np.float32)
        normals = np.asarray(vertex_normals(jnp.asarray(pix), jnp.asarray(t)))
        colors = np.asarray(phong_vertex_colors(jnp.asarray(pix),
                                                jnp.asarray(normals)))
        out = np.asarray(rasterize_batch(
            jnp.asarray(pix), jnp.asarray(t), jnp.asarray(colors),
            jnp.zeros((2, 64, 64, 3)), height=64, width=64))
        # Both heads rendered, covering a plausible area.
        for b in range(2):
            frac = (out[b].sum(-1) > 0.05).mean()
            assert 0.1 < frac < 0.9, frac
