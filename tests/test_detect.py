"""Detector tests: YOLOv5-P6 shapes/decode, NMS semantics, association."""

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.detect import yolov5_bpjdet
from semiuhpe_tpu.detect.association import associate_body_parts, inside_iou
from semiuhpe_tpu.detect.nms import (
    box_iou, letterbox, non_max_suppression, scale_coords, xywh2xyxy)


class TestModel:
    def test_forward_decode_shape(self):
        model = yolov5_bpjdet("s6")
        x = jnp.zeros((1, 128, 128, 3))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        # N = sum over levels of na*ny*nx: (16^2+8^2+4^2+2^2)*3 = 1020.
        assert out.shape == (1, 1020, 5 + 2 + 2)

    def test_decode_boxes_in_pixel_range(self):
        model = yolov5_bpjdet("s6")
        x = jnp.zeros((1, 128, 128, 3))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = np.asarray(model.apply(v, x, train=False))[0]
        xy = out[:, :2]
        # Decoded centers live within ~the image extent.
        assert xy.min() > -64 and xy.max() < 192
        wh = out[:, 2:4]
        assert (wh > 0).all()

    def test_param_count_l6(self):
        model = yolov5_bpjdet("l6")
        v = jax.eval_shape(
            lambda: model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 64, 64, 3)), train=False))
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v["params"]))
        # YOLOv5l6 ~76M params.
        assert 6e7 < n < 9e7


class TestNMS:
    def test_xywh2xyxy(self):
        out = xywh2xyxy(np.asarray([[10.0, 10, 4, 6]]))
        np.testing.assert_allclose(out[0], [8, 7, 12, 13])

    def test_iou(self):
        a = np.asarray([[0, 0, 10, 10.0]])
        b = np.asarray([[5, 5, 15, 15.0], [20, 20, 30, 30.0]])
        iou = box_iou(a, b)
        np.testing.assert_allclose(iou[0, 0], 25 / 175, atol=1e-6)
        assert iou[0, 1] == 0

    def test_nms_suppresses_overlaps_keeps_classes(self):
        # Two overlapping body boxes (cls 0) + one head box (cls 1) at the
        # same location: class-aware NMS keeps the head.
        def row(cx, cy, w, h, obj, cls0, cls1, ox, oy):
            return [cx, cy, w, h, obj, cls0, cls1, ox, oy]

        pred = np.asarray([[
            row(50, 50, 40, 40, 0.9, 0.9, 0.1, 52, 30),
            row(52, 52, 40, 40, 0.8, 0.9, 0.1, 52, 30),   # suppressed vs above
            row(50, 50, 20, 20, 0.85, 0.1, 0.9, 0, 0),    # head, kept
            row(200, 200, 10, 10, 0.01, 0.9, 0.1, 0, 0),  # below conf
        ]], np.float32)
        out = non_max_suppression(pred, conf_thres=0.5, iou_thres=0.5,
                                  num_offsets=2)
        dets = out[0]
        assert dets.shape[0] == 2
        assert set(dets[:, 5].astype(int).tolist()) == {0, 1}
        # Offsets carried through.
        body = dets[dets[:, 5] == 0][0]
        np.testing.assert_allclose(body[6:8], [52, 30], atol=1e-5)

    def test_letterbox_and_scale_roundtrip(self):
        img = np.zeros((300, 400, 3), np.uint8)
        boxed, ratio, pad = letterbox(img, 256, stride=64)
        assert boxed.shape[0] % 64 == 0 and boxed.shape[1] % 64 == 0
        # A box in letterbox coords maps back into the original frame.
        coords = np.asarray([[pad[0] + 10 * ratio[0], pad[1] + 20 * ratio[1],
                              pad[0] + 110 * ratio[0], pad[1] + 120 * ratio[1]]])
        back = scale_coords(boxed.shape[:2], coords, (300, 400))
        np.testing.assert_allclose(back[0], [10, 20, 110, 120], atol=1.0)


class TestAssociation:
    def test_inside_iou(self):
        assert inside_iou([0, 0, 100, 100], [10, 10, 20, 20]) == 1.0
        assert inside_iou([0, 0, 100, 100], [90, 90, 110, 110]) == 0.25
        assert inside_iou([0, 0, 10, 10], [50, 50, 60, 60]) == 0.0

    def test_body_head_match(self):
        shape = (128, 128)
        # Body at (10..60), offset point predicting head center (30, 20).
        body = np.asarray([[10, 10, 60, 60, 0.9, 0.0, 30.0, 20.0]], np.float32)
        # Head box centered exactly there, inside the body.
        head = np.asarray([[25, 15, 35, 25, 0.8, 1.0, 0, 0]], np.float32)
        bboxes, points, scores = associate_body_parts(
            shape, shape, body, head, num_offsets=2, match_iou_thres=0.6)
        assert bboxes.shape == (1, 4)
        np.testing.assert_allclose(points[0, 0, :3], [30, 20, 0.8], atol=1e-5)
        np.testing.assert_allclose(points[0, 0, 3:], [25, 15, 35, 25], atol=1e-5)

    def test_outside_head_rejected(self):
        shape = (128, 128)
        body = np.asarray([[10, 10, 60, 60, 0.9, 0.0, 30.0, 20.0]], np.float32)
        head = np.asarray([[100, 100, 120, 120, 0.8, 1.0, 0, 0]], np.float32)
        _, points, _ = associate_body_parts(shape, shape, body, head)
        assert points[0, 0, 2] == 0.0  # unmatched


class TestHeadCrop:
    def test_square_head_crop_geometry(self):
        from semiuhpe_tpu.cli.infer_common import square_head_crop

        img = np.zeros((200, 200, 3), np.uint8)
        img[40:80, 60:100] = 255  # white head region
        crop, used = square_head_crop(img, [60, 40, 100, 80],
                                      edges_scale=-0.05, size=64)
        assert crop.shape == (64, 64, 3)
        # edges_scale -0.05 -> crop slightly larger than the head box.
        x1, y1, x2, y2 = used
        assert x1 < 60 and y1 < 40 and x2 > 100 and y2 > 80
        # The (normalized) crop center should be bright (head content).
        assert crop[32, 32].mean() > crop[2, 2].mean()

    def test_crop_clipped_at_borders(self):
        from semiuhpe_tpu.cli.infer_common import square_head_crop

        img = np.zeros((100, 100, 3), np.uint8)
        crop, used = square_head_crop(img, [0, 0, 30, 30], size=64)
        assert crop.shape == (64, 64, 3)
        assert used[0] >= 0 and used[1] >= 0
