"""Byte-parity fixtures: our host crop/label pipeline vs the reference's
OWN dataset code, run on synthetic fixture images in this image.

The reference replicates one crop idiom across every dataset module; these
tests import those modules (/root/reference/src/datasets/*) and assert our
``data/crops.py`` + dataset loaders reproduce them EXACTLY where the
computation is deterministic:

* 300W-LP landmark crop (incl. the _Flip mirrored-landmark path and the
  keep-mask quirk)            vs dataset_300WLP.process_ori_mat_anno:22-100
* AFLW2000 fixed ad=0.2 test crop + the test-time tensor transform
                              vs dataset_AFLW2000.process_ori_mat_anno:20-95
* DAD3DHeads center-bbox crop (train random ad, val fixed ad=0.15)
                              vs dataset_DAD3DHeads.process_ori_img_anno:27-85
* COCOHead head-box crop      vs dataset_COCOHead.process_ori_mat_anno:22-75
* WiderFace face crop with the 2x top headroom
                              vs dataset_WiderFace.process_ori_mat_anno:22-75
* Euler label algebra: wrap-to-±180 + ±89.99 clip, Rz·Ry·Rx construction,
  full-range Euler extraction, limit_angle
                              vs src/utils.py:204-300 and the
                                 dataset_300WLP.__getitem__ label path.

The stochastic PIL view augs (RandomResizedCrop etc.) use torch's RNG in
the reference and cannot match draw-for-draw; their *label algebra* is
covered here and their statistics in tests/test_augments_host.py.

Shims: ``torchvision`` is not installed; the reference modules only touch
it inside functions we don't call, so an empty module stub satisfies the
import.  The random ``ad`` draws are replicated by re-seeding np.random
and drawing with the reference's own expression.
"""

import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
sio = pytest.importorskip("scipy.io")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "datasets")),
    reason="reference checkout not mounted")

# Empty torchvision stub: `import torchvision.transforms as tfs` must
# succeed; no attribute is touched by the functions under test.
if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv_t = types.ModuleType("torchvision.transforms")
    _tv.transforms = _tv_t
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tv_t

if REF not in sys.path:
    sys.path.insert(0, REF)

from src.datasets import dataset_300WLP as ref_300wlp  # noqa: E402
from src.datasets import dataset_AFLW2000 as ref_aflw  # noqa: E402
from src.datasets import dataset_COCOHead as ref_coco  # noqa: E402
from src.datasets import dataset_DAD3DHeads as ref_dad  # noqa: E402
from src.datasets import dataset_WiderFace as ref_wider  # noqa: E402
from src import utils as ref_utils  # noqa: E402

from semiuhpe_tpu.data.crops import (head_crop_from_bbox,  # noqa: E402
                                     head_crop_from_landmarks)
from semiuhpe_tpu.data.datasets import d300wlp as our_300wlp  # noqa: E402
from semiuhpe_tpu.data.datasets.base import (euler_to_rot_np,  # noqa: E402
                                             wrap_clip_89)
from semiuhpe_tpu.ops import so3  # noqa: E402


# ---------------------------------------------------------------------------
# fixture tree
# ---------------------------------------------------------------------------

def _noise_img(rng, w, h):
    return Image.fromarray(rng.integers(0, 255, size=(h, w, 3),
                                        dtype=np.uint8), "RGB")


# Landmark layouts chosen to exercise every geometry branch: centered,
# top-edge clip (asymmetric pad), right-edge clip, and negative coords
# (the keep-mask quirk: x-mask unless it keeps MORE points than y-mask).
LANDMARK_CASES = {
    "centered": (160.0, 140.0, 120.0, 150.0, 0),
    "top_edge": (150.0, 8.0, 140.0, 100.0, 0),
    "right_edge": (330.0, 120.0, 115.0, 130.0, 0),
    "neg_coords": (170.0, 150.0, 130.0, 140.0, 7),
}


def _make_landmarks(rng, x0, y0, w, h, n_negative):
    xs = rng.uniform(x0, x0 + w, size=68)
    ys = rng.uniform(y0, y0 + h, size=68)
    if n_negative:
        xs[:n_negative] = -rng.uniform(1.0, 20.0, size=n_negative)
    return np.stack([xs, ys], axis=1)  # (68, 2) = the mat's pts_2d layout


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """A miniature 300W_LP tree (AFW + AFW_Flip + landmarks) plus an
    AFLW2000 mat and free-standing images for the bbox-crop families."""
    rng = np.random.default_rng(42)
    root = tmp_path_factory.mktemp("fixtures")
    lp = root / "300W_LP"
    (lp / "AFW").mkdir(parents=True)
    (lp / "AFW_Flip").mkdir()
    (lp / "landmarks" / "AFW").mkdir(parents=True)

    cases = {}
    for name, (x0, y0, w, h, nneg) in LANDMARK_CASES.items():
        img = _noise_img(rng, 450, 380)
        img.save(lp / "AFW" / f"{name}.jpg")
        img.transpose(Image.FLIP_LEFT_RIGHT).save(lp / "AFW_Flip" / f"{name}.jpg")
        pose = np.zeros((1, 7))
        pose[0, :3] = rng.uniform(-1.2, 1.2, size=3)
        sio.savemat(lp / "AFW" / f"{name}.mat", {"Pose_Para": pose})
        sio.savemat(lp / "AFW_Flip" / f"{name}.mat", {"Pose_Para": pose})
        pts = _make_landmarks(rng, x0, y0, w, h, nneg)
        sio.savemat(lp / "landmarks" / "AFW" / f"{name}_pts.mat",
                    {"pts_2d": pts})
        cases[name] = pts

    # AFLW2000-style mat: pt2d stored directly (2, 68) + pose.
    aflw_img = _noise_img(rng, 400, 400)
    aflw_img.save(root / "image00001.jpg")
    pt2d = _make_landmarks(rng, 120.0, 110.0, 150.0, 160.0, 0).T  # (2, 68)
    pose = np.zeros((1, 7))
    pose[0, :3] = [0.3, -0.8, 3.4]  # roll > pi: exercises the wrap
    sio.savemat(root / "image00001.mat", {"Pose_Para": pose, "pt2d": pt2d})

    wild = _noise_img(rng, 640, 360)
    wild.save(root / "scene.jpg")
    return {"root": root, "lp": lp, "cases": cases}


# ---------------------------------------------------------------------------
# 300W-LP landmark crop
# ---------------------------------------------------------------------------

class Test300WLPCrop:
    @pytest.mark.parametrize("case", sorted(LANDMARK_CASES))
    @pytest.mark.parametrize("seed", (0, 1, 2))
    def test_crop_bytes_match(self, tree, case, seed):
        img_path = str(tree["lp"] / "AFW" / f"{case}.jpg")
        mat_path = str(tree["lp"] / "AFW" / f"{case}.mat")

        np.random.seed(seed)
        ref_img, ref_labels = ref_300wlp.process_ori_mat_anno(img_path, mat_path)

        np.random.seed(seed)
        ad = np.random.random_sample() * 0.2 + 0.2  # the reference's draw
        img = Image.open(img_path).convert("RGB")
        pt2d = our_300wlp.load_landmarks(mat_path, img.size[0])
        ours = head_crop_from_landmarks(img, pt2d, ad, 224)

        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))
        np.testing.assert_allclose(
            our_300wlp.load_mat_pose(mat_path), ref_labels, rtol=1e-12)

    @pytest.mark.parametrize("seed", (0, 3))
    def test_flip_copy_crop_bytes_match(self, tree, seed):
        """_Flip copies share the original landmark file with x mirrored
        (dataset_300WLP.py:33-40)."""
        img_path = str(tree["lp"] / "AFW_Flip" / "centered.jpg")
        mat_path = str(tree["lp"] / "AFW_Flip" / "centered.mat")

        np.random.seed(seed)
        ref_img, _ = ref_300wlp.process_ori_mat_anno(img_path, mat_path)

        np.random.seed(seed)
        ad = np.random.random_sample() * 0.2 + 0.2
        img = Image.open(img_path).convert("RGB")
        pt2d = our_300wlp.load_landmarks(mat_path, img.size[0])
        ours = head_crop_from_landmarks(img, pt2d, ad, 224)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))


# ---------------------------------------------------------------------------
# AFLW2000 fixed-ad test crop + test-time transform
# ---------------------------------------------------------------------------

class TestAFLW2000Crop:
    def test_crop_bytes_and_wrapped_labels(self, tree):
        img_path = str(tree["root"] / "image00001.jpg")
        mat_path = str(tree["root"] / "image00001.mat")
        ref_img, ref_labels = ref_aflw.process_ori_mat_anno(img_path, mat_path)

        mat = sio.loadmat(mat_path)
        img = Image.open(img_path).convert("RGB")
        ours = head_crop_from_landmarks(img, mat["pt2d"], ad=0.2, out_size=224)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))

        # label wrap (the mat's roll = 3.4 rad = 194.8 deg -> -165.2 deg)
        pose_deg = np.degrees(mat["Pose_Para"][0][:3])
        ours_wrapped = [so3.limit_angle(v) for v in pose_deg]
        np.testing.assert_allclose(ours_wrapped, ref_labels, atol=1e-9)
        assert ref_labels[2] < 0  # the wrap actually fired

    def test_test_time_tensor_transform_bit_parity(self, tree):
        """Eval-path parity: our on-device normalize of the raw uint8 crop
        equals the reference's ToTensor+Normalize (modulo layout)."""
        from semiuhpe_tpu.ops.views import normalize_u8

        img_path = str(tree["root"] / "image00001.jpg")
        mat_path = str(tree["root"] / "image00001.mat")
        ref_img, _ = ref_aflw.process_ori_mat_anno(img_path, mat_path)

        # torchvision.ToTensor + Normalize, computed with plain torch ops
        # (that IS the definition for uint8 RGB input).
        t = torch.from_numpy(np.array(ref_img)).permute(2, 0, 1).float() / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
        ref_tensor = ((t - mean) / std).numpy()

        ours = np.asarray(normalize_u8(np.asarray(ref_img)))  # HWC
        np.testing.assert_allclose(ours.transpose(2, 0, 1), ref_tensor,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# bbox-crop families (DAD3DHeads / COCOHead / WiderFace)
# ---------------------------------------------------------------------------

BBOXES = [
    (210.0, 90.0, 120.0, 150.0),   # interior
    (10.0, 5.0, 90.0, 110.0),      # top-left clip
    (540.0, 240.0, 110.0, 100.0),  # bottom-right clip
]


class TestBBoxCrops:
    @pytest.mark.parametrize("bbox", BBOXES)
    def test_dad3dheads_val_fixed_ad(self, tree, bbox):
        img_path = str(tree["root"] / "scene.jpg")
        anno = [list(bbox), np.eye(3).tolist(), [10.0, -20.0, 5.0]]
        ref_img, _, _ = ref_dad.process_ori_img_anno(
            img_path, anno, phase="val", ad_base=0.1)
        img = Image.open(img_path).convert("RGB")
        ours = head_crop_from_bbox(img, bbox, ad=0.15, out_size=224,
                                   top_scale=1.0)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))

    @pytest.mark.parametrize("seed", (0, 1))
    def test_dad3dheads_train_random_ad(self, tree, seed):
        img_path = str(tree["root"] / "scene.jpg")
        bbox = BBOXES[0]
        anno = [list(bbox), np.eye(3).tolist(), [0.0, 0.0, 0.0]]
        np.random.seed(seed)
        ref_img, _, _ = ref_dad.process_ori_img_anno(
            img_path, anno, phase="train", ad_base=0.1)
        np.random.seed(seed)
        ad = np.random.random_sample() * 0.1 + 0.1
        img = Image.open(img_path).convert("RGB")
        ours = head_crop_from_bbox(img, bbox, ad=ad, out_size=224,
                                   top_scale=1.0)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))

    @pytest.mark.parametrize("bbox", BBOXES)
    def test_cocohead_crop(self, tree, bbox, seed=0):
        img_path = str(tree["root"] / "scene.jpg")
        x, y, w, h = bbox
        img = Image.open(img_path).convert("RGB")
        anno_list = [[x, y, x + w, y + h, 1], None, 0, img.size[1],
                     img.size[0], 0, h, w, 1]
        np.random.seed(seed)
        ref_img = ref_coco.process_ori_mat_anno(img_path, anno_list,
                                                ad_base=0.1)
        np.random.seed(seed)
        ad = np.random.random_sample() * 0.1 + 0.1
        ours = head_crop_from_bbox(img, bbox, ad=ad, out_size=224,
                                   top_scale=1.0)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))

    @pytest.mark.parametrize("bbox", BBOXES)
    def test_widerface_crop_double_top_headroom(self, tree, bbox, seed=1):
        img_path = str(tree["root"] / "scene.jpg")
        np.random.seed(seed)
        ref_img = ref_wider.process_ori_mat_anno(img_path, list(bbox),
                                                 ad_base=0.1)
        np.random.seed(seed)
        ad = np.random.random_sample() * 0.1 + 0.1
        img = Image.open(img_path).convert("RGB")
        ours = head_crop_from_bbox(img, bbox, ad=ad, out_size=224,
                                   top_scale=2.0)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_img))


# ---------------------------------------------------------------------------
# label algebra
# ---------------------------------------------------------------------------

class TestLabelAlgebra:
    def test_euler_to_rot_matches_get_6drepnet_rot(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            p, y, r = rng.uniform(-179.0, 179.0, size=3)
            ref_rot = np.asarray(ref_utils.get_6DRepNet_Rot(
                np.radians(p), np.radians(y), np.radians(r)))
            ours = euler_to_rot_np(p, y, r)
            np.testing.assert_allclose(ours, ref_rot, atol=1e-12)

    def test_flip_negation_equals_conjugation(self):
        """The reference flips labels by negating yaw/roll before building
        R (dataset_300WLP.py:110-113); our device-views path conjugates the
        built R instead (F R F, ops.so3.flip_rotation) — identical."""
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        for _ in range(10):
            p, y, r = rng.uniform(-89.0, 89.0, size=3)
            ref_rot = np.asarray(ref_utils.get_6DRepNet_Rot(
                np.radians(p), np.radians(-y), np.radians(-r)))
            ours = np.asarray(so3.flip_rotation(
                jnp.asarray(euler_to_rot_np(p, y, r))))
            np.testing.assert_allclose(ours, ref_rot, atol=1e-6)

    def test_wrap_clip_matches_reference_loop(self):
        """dataset_300WLP.__getitem__:181-187 wraps to ±180 with a while
        loop then clips to ±89.99."""
        for v in (0.0, 45.0, 90.5, 179.9, 180.1, 350.0, 359.9, 360.1,
                  -90.5, -200.0, -359.9, 713.0, 89.99, -89.99):
            ref = v
            while abs(ref) > 180:
                ref = ref - ref / abs(ref) * 360
            ref = np.clip(ref, -89.99, 89.99)
            assert abs(wrap_clip_89(v) - ref) < 1e-9, v

    def test_limit_angle_matches(self):
        for v in (0.0, 179.0, 181.0, 360.0, 541.0, -181.0, -360.0, -541.0):
            assert abs(so3.limit_angle(v) - ref_utils.limit_angle(v)) < 1e-9

    def test_full_range_euler_extraction_matches(self):
        """compute_euler_angles_from_rotation_matrices with the full-range
        yaw extension (src/utils.py:232-260) vs ops.so3.matrix_to_euler."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        qs = rng.normal(size=(24, 4))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        w, x, y, z = qs.T
        rots = np.stack([
            np.stack([1 - 2 * (y**2 + z**2), 2 * (x*y - w*z), 2 * (x*z + w*y)], -1),
            np.stack([2 * (x*y + w*z), 1 - 2 * (x**2 + z**2), 2 * (y*z - w*x)], -1),
            np.stack([2 * (x*z - w*y), 2 * (y*z + w*x), 1 - 2 * (x**2 + y**2)], -1),
        ], axis=1).astype(np.float32)
        ref = ref_utils.compute_euler_angles_from_rotation_matrices(
            torch.from_numpy(rots), full_range=True,
            use_gpu=False).detach().numpy()
        ours = np.asarray(so3.matrix_to_euler(jnp.asarray(rots),
                                              full_range=True))
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_aug_rot_mat_and_composition(self):
        """aug_rot_mat (Z-axis, dataset_300WLP.py:195-198) and the
        Rot = aug_rot_mat @ Rot composition (:201)."""
        from semiuhpe_tpu.data.augments_host import aug_rot_mat_z

        for rot_angle in (-30.0, -7.3, 0.0, 12.25, 29.999):
            ra = rot_angle * np.pi / 180.0
            ref = np.array([[np.cos(ra), np.sin(ra), 0],
                            [-np.sin(ra), np.cos(ra), 0],
                            [0, 0, 1]])
            np.testing.assert_allclose(aug_rot_mat_z(rot_angle), ref,
                                       atol=1e-12)
