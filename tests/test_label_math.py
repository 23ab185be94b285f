"""Label-transform correctness: the rotation-aug label math.

The reference verifies this visually (debug mains render GT poses onto
rotated crops, dataset_300WLP.py:316-411); here it is a numeric test:
rotating the *image* by theta and adjusting the *label* by aug_rot_mat
must produce the same picture as rendering the adjusted label directly.
"""

import numpy as np

from semiuhpe_tpu.data.augments_host import aug_rot_mat_z, rotate_expand_recrop
from semiuhpe_tpu.data.datasets.base import euler_to_rot_np, render_pose_image


def _foreground(img):
    arr = np.asarray(img).astype(np.int32)
    # Background is flat (96,96,96); rotation fill is black — exclude both.
    return (np.abs(arr - 96).sum(-1) > 40) & (arr.sum(-1) > 90)


def _iou(a, b):
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / max(union, 1)


class TestRotationAugLabelMath:
    def test_rotated_image_matches_adjusted_label(self):
        for pitch, yaw, roll in [(0.0, 0.0, 0.0), (10.0, 30.0, -5.0),
                                 (-20.0, -50.0, 15.0)]:
            for angle in (15.0, -25.0):
                rot = euler_to_rot_np(pitch, yaw, roll)
                base = render_pose_image(rot, 224)

                # Path A: rotate the rendered image (the strong aug).
                rotated_img = rotate_expand_recrop(base, angle, 224)
                # Path B: render directly from the adjusted label.
                adjusted = aug_rot_mat_z(angle) @ rot
                direct = render_pose_image(adjusted, 224)

                iou = _iou(_foreground(rotated_img), _foreground(direct))
                assert iou > 0.75, (
                    f"label math mismatch: pose ({pitch},{yaw},{roll}) "
                    f"angle {angle}: IoU {iou:.3f}")

    def test_zero_angle_is_identity(self):
        np.testing.assert_allclose(aug_rot_mat_z(0.0), np.eye(3), atol=1e-7)

    def test_aug_mat_is_rotation(self):
        m = aug_rot_mat_z(33.0)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-6)

    def test_composition(self):
        """Two successive in-plane rotations compose additively."""
        np.testing.assert_allclose(
            aug_rot_mat_z(10.0) @ aug_rot_mat_z(20.0), aug_rot_mat_z(30.0),
            atol=1e-6)


class TestFlipLabelMath:
    def test_flip_negates_yaw_roll_consistently(self):
        """Mirroring the image = negating yaw/roll: the flipped render of
        the flipped labels matches the original render mirrored."""
        from PIL import Image

        pitch, yaw, roll = 10.0, 30.0, -5.0
        base = render_pose_image(euler_to_rot_np(pitch, yaw, roll), 224)
        flipped_label = render_pose_image(
            euler_to_rot_np(pitch, -yaw, -roll), 224)
        mirrored = base.transpose(Image.FLIP_LEFT_RIGHT)
        iou = _iou(_foreground(mirrored), _foreground(flipped_label))
        assert iou > 0.75, f"flip label math mismatch: IoU {iou:.3f}"
