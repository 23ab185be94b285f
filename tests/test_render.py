"""Native rasterizer + render pipeline tests (the counterpart of the
reference's Sim3DR/tests/test.cpp, plus pipeline-level checks)."""

import numpy as np
import pytest

from semiuhpe_tpu.render import native


class TestKernel:
    def test_normals_flat_triangle(self):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.asarray([[0, 1, 2]], np.int32)
        n = native.get_normal(verts, tris)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
        np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-6)

    def test_rasterize_fills_triangle(self):
        verts = np.asarray([[2, 2, 1], [60, 2, 1], [2, 60, 1]], np.float32)
        tris = np.asarray([[0, 1, 2]], np.int32)
        colors = np.ones((3, 3), np.float32)
        bg = np.zeros((64, 64, 3), np.uint8)
        out = native.rasterize(verts, tris, colors, bg)
        assert out[5, 5].tolist() == [255, 255, 255]   # inside
        assert out[60, 60].tolist() == [0, 0, 0]       # outside
        # Roughly half the bbox area covered.
        frac = (out[..., 0] > 0).mean()
        assert 0.3 < frac < 0.6

    def test_depth_test_front_wins(self):
        # Two overlapping triangles: z=5 in front of z=1.
        verts = np.asarray(
            [[2, 2, 1], [60, 2, 1], [2, 60, 1],
             [2, 2, 5], [60, 2, 5], [2, 60, 5]], np.float32)
        tris = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.concatenate([
            np.tile([[1, 0, 0]], (3, 1)), np.tile([[0, 1, 0]], (3, 1))
        ]).astype(np.float32)
        bg = np.zeros((64, 64, 3), np.uint8)
        out = native.rasterize(verts, tris, colors, bg)
        assert out[5, 5].tolist() == [0, 255, 0]  # front (green) wins
        # Order independence: draw front first, back second.
        out2 = native.rasterize(verts[[3, 4, 5, 0, 1, 2]],
                                np.asarray([[0, 1, 2], [3, 4, 5]], np.int32),
                                colors[[3, 4, 5, 0, 1, 2]], bg)
        assert out2[5, 5].tolist() == [0, 255, 0]

    def test_depth_buffer_values(self):
        verts = np.asarray([[0, 0, 2], [63, 0, 2], [0, 63, 2]], np.float32)
        tris = np.asarray([[0, 1, 2]], np.int32)
        d = native.rasterize_depth(verts, tris, 64, 64)
        assert np.isclose(d[1, 1], 2.0, atol=1e-5)
        assert d[63, 63] == -1e8


class TestHeadMesh:
    def test_mesh_valid(self):
        from semiuhpe_tpu.render.headmesh import make_head_mesh

        v, t = make_head_mesh()
        assert v.dtype == np.float32 and t.dtype == np.int32
        assert t.min() >= 0 and t.max() < len(v)
        # FLAME-matched canonical scale: spans ~[-0.9, 1.1] (see
        # tests/test_reference_assets.py for the cross-mesh overlay check).
        assert np.abs(v).max() <= 1.5
        # The nose protrudes toward -z (the face direction).
        assert v[:, 2].min() < -0.95 * 0.9

    def test_normals_match_reference_convention(self):
        from semiuhpe_tpu.render.headmesh import make_head_mesh

        v, t = make_head_mesh()
        n = native.get_normal(v, t)
        # Radially aligned, and signed INWARD — the same winding convention
        # the reference FLAME asset uses (its mean signed cos is -0.77), so
        # the Phong pipeline lights both meshes identically.
        radial = v / np.linalg.norm(v, axis=1, keepdims=True)
        cos = np.sum(n * radial, axis=1)
        assert (np.abs(cos) > 0.3).mean() > 0.9
        assert cos.mean() < -0.5


class TestRenderer:
    def test_render_overlay(self):
        from semiuhpe_tpu.render.renderer import Renderer

        r = Renderer()
        img = np.full((128, 128, 3), 40, np.uint8)
        poses = [np.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])]
        tv = r.transform_vertices(img, poses)
        out = r.render(img, tv)
        assert out.shape == img.shape
        # Something was drawn near the center, brighter than the bg.
        center = out[44:84, 44:84]
        assert center.mean() > 50

    def test_obj_export(self, tmp_path):
        from semiuhpe_tpu.render.renderer import Renderer

        r = Renderer()
        img = np.full((128, 128, 3), 40, np.uint8)
        tv = r.transform_vertices(img, [np.array([0, 0, 0, 0, 0, 1.0])])
        path = str(tmp_path / "head.obj")
        r.save_to_obj(img, tv, 128, path)
        lines = open(path).read().splitlines()
        n_v = sum(1 for ln in lines if ln.startswith("v "))
        n_f = sum(1 for ln in lines if ln.startswith("f "))
        assert n_v == len(r.vertices)
        assert n_f == len(r.triangles)


class TestVisPlot:
    def test_bbox_lift_identity_center(self):
        from semiuhpe_tpu.render.vis_plot import pose_bbox_to_full_image

        # A bbox centered at the principal point with size matching the
        # focal scaling leaves the pose rotation unchanged.
        k = np.array([[200.0, 0, 100], [0, 200.0, 100], [0, 0, 1]])
        bbox = {"left": 0, "top": 0, "right": 200, "bottom": 200}
        pose = np.array([0.1, -0.2, 0.05, 0.0, 0.0, 1.0])
        out = pose_bbox_to_full_image(pose, k, bbox)
        np.testing.assert_allclose(out[:3], pose[:3], atol=1e-6)

    def test_axis_drawing(self):
        from semiuhpe_tpu.render.vis_plot import draw_axis_ypr

        img = np.zeros((100, 100, 3), np.uint8)
        out = draw_axis_ypr(img, 20.0, -10.0, 5.0, size=40)
        assert (out > 0).any()

    def test_rotmat_6dof_roundtrip_sanity(self):
        from semiuhpe_tpu.render.vis_plot import convert_rotmat_bbox_to_6dof

        k = np.array([[400.0, 0, 200], [0, 400.0, 200], [0, 0, 1]])
        rot = np.eye(3)
        out = convert_rotmat_bbox_to_6dof(rot, [150, 150, 250, 250], k)
        assert len(out) == 6
        assert np.isfinite(out).all()
