"""Dataset format-parsing tests against synthesized on-disk fixtures
(mat/json/npz/txt files in the reference's formats)."""

import json
import os

import numpy as np
import pytest
import scipy.io as sio
from PIL import Image

from semiuhpe_tpu.data.datasets.base import euler_to_rot_np


class Cfg:
    def __init__(self, **kw):
        self.rotate_aug = True
        self.input_size = 64
        self.ss_ratio = 0.5
        self.is_full_range = True
        self.ulb_batch_ratio = 2
        for k, v in kw.items():
            setattr(self, k, v)


def _img(path, w=160, h=160):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(arr).save(path)


class TestD300WLP:
    @pytest.fixture
    def root(self, tmp_path):
        root = tmp_path / "300W_LP"
        for sub in ("AFW", "HELEN", "IBUG", "LFPW"):
            for i in range(4):
                name = f"{sub}_{i:04d}"
                _img(str(root / sub / f"{name}.jpg"))
                _img(str(root / (sub + "_Flip") / f"{name}.jpg"))
                sio.savemat(str(root / sub / f"{name}.mat"),
                            {"Pose_Para": np.asarray(
                                [[0.2, -0.3, 0.1, 0, 0, 0, 0]], np.float64)})
                sio.savemat(str(root / (sub + "_Flip") / f"{name}.mat"),
                            {"Pose_Para": np.asarray(
                                [[0.2, 0.3, -0.1, 0, 0, 0, 0]], np.float64)})
                lm_dir = root / "landmarks" / sub
                os.makedirs(lm_dir, exist_ok=True)
                pts = np.random.default_rng(i).uniform(40, 120, (68, 2))
                sio.savemat(str(lm_dir / f"{name}_pts.mat"), {"pts_2d": pts})
        return str(root)

    def test_split_and_sample(self, root):
        from semiuhpe_tpu.data.datasets.d300wlp import make_300wlp, split_indices

        cfg = Cfg(data_dir_300WLP=root)
        train = make_300wlp("train", cfg)
        ulb = make_300wlp("ulb_train", cfg)
        allset = make_300wlp("train_all", cfg)
        # 4 subsets x 4 images x (orig + flip); split 50/50.
        assert len(allset) == 32
        assert len(train) == 16 and len(ulb) == 16
        # Deterministic split, disjoint.
        lab, unlab = split_indices(4, 0.5)
        assert set(lab).isdisjoint(unlab) and len(lab) == 2
        assert split_indices(4, 0.5) == (lab, unlab)

        s = train[0]
        assert s["img"].shape == (64, 64, 3)
        assert s["rot_mat"].shape == (3, 3)
        np.testing.assert_allclose(
            s["rot_mat"] @ s["rot_mat"].T, np.eye(3), atol=1e-5)
        s2 = ulb[0]
        assert s2["img_strong"].shape == (64, 64, 3)
        assert s2["aug_rot_mat"].shape == (3, 3)

    def test_raw_views_mode(self, root):
        """device_views: labeled 300WLP ships the raw uint8 base crop with
        the UNflipped/unaugmented label (flip runs on device)."""
        from semiuhpe_tpu.data.datasets.base import euler_to_rot_np
        from semiuhpe_tpu.data.datasets.d300wlp import make_300wlp

        cfg = Cfg(data_dir_300WLP=root, device_views=True)
        s = make_300wlp("train", cfg)[0]
        assert s["img_raw"].dtype == np.uint8
        assert s["img_raw"].shape == (64, 64, 3)
        assert "img" not in s
        p, y, r = s["euler_angles"]
        np.testing.assert_allclose(s["rot_mat"], euler_to_rot_np(p, y, r),
                                   atol=1e-5)

    def test_flip_landmarks_mirrored(self, root):
        from semiuhpe_tpu.data.datasets.d300wlp import load_landmarks

        orig = load_landmarks(os.path.join(root, "AFW", "AFW_0000.mat"), 160)
        flip = load_landmarks(
            os.path.join(root, "AFW_Flip", "AFW_0000.mat"), 160)
        np.testing.assert_allclose(flip[0], 160 - orig[0], atol=1e-9)
        np.testing.assert_allclose(flip[1], orig[1], atol=1e-9)


class TestAFLW2000:
    def test_filter_and_labels(self, tmp_path):
        from semiuhpe_tpu.data.datasets.aflw2000 import make_aflw2000

        root = str(tmp_path)
        poses = [(0.3, -0.4, 0.2), (1.8, 0.0, 0.0), (0.1, 0.2, -0.3)]  # [1] >90deg
        for i, p in enumerate(poses):
            _img(os.path.join(root, f"image{i:05d}.jpg"))
            sio.savemat(os.path.join(root, f"image{i:05d}.mat"), {
                "Pose_Para": np.asarray([list(p) + [0, 0, 0, 0]], np.float64),
                "pt2d": np.random.default_rng(i).uniform(30, 130, (2, 21)),
            })
        ds = make_aflw2000("test", Cfg(data_dir_AFLW2000=root))
        assert len(ds) == 2  # pitch 1.8 rad ~ 103deg filtered out
        s = ds[0]
        np.testing.assert_allclose(
            s["rot_mat"],
            euler_to_rot_np(*s["euler_angles"]), atol=1e-5)


class TestCOCOHead:
    def test_parse(self, tmp_path):
        from semiuhpe_tpu.data.datasets.cocohead import make_cocohead

        root = tmp_path / "coco"
        _img(str(root / "images/val2017/000001.jpg"))
        anno = {
            "images": [{"id": 1, "file_name": "000001.jpg",
                        "height": 160, "width": 160}],
            "annotations": [
                {"image_id": 1, "id": 10, "bbox": [10, 10, 80, 120],
                 "hier": [40, 40, 90, 100, 1] + [0] * 25},   # head 50x60 ok
                {"image_id": 1, "id": 11, "bbox": [0, 0, 30, 30],
                 "hier": [5, 5, 20, 20, 1] + [0] * 25},      # head 15px, dropped
                {"image_id": 1, "id": 12, "bbox": [0, 0, 30, 30],
                 "hier": [0, 0, 0, 0, 0] + [0] * 25},        # no head
            ],
        }
        os.makedirs(root / "annotations_HumanParts", exist_ok=True)
        for split in ("val", "train"):
            path = root / f"annotations_HumanParts/person_humanparts_{split}2017.json"
            with open(path, "w") as f:
                json.dump(anno if split == "val" else
                          {"images": [], "annotations": []}, f)
        ds = make_cocohead("ulb_train", Cfg(data_dir_COCOHead=str(root)))
        assert len(ds) == 1
        s = ds[0]
        assert s["img"].shape == (64, 64, 3) and s["img_strong"].shape == (64, 64, 3)


class TestWildHead:
    def test_filename_bbox(self, tmp_path):
        from semiuhpe_tpu.data.datasets.wildhead import make_wildhead, scan_wildhead

        root = tmp_path / "wild"
        _img(str(root / "head_images_wild_30_hp" / "COCOHead_000001_10,20,60,70.jpg"))
        _img(str(root / "head_images_wild_30_ch" / "CrowdHuman_x_5,6,40,50.jpg"))
        files, bboxes = scan_wildhead(str(root))
        assert len(files) == 2
        assert [5, 6, 40, 50] in bboxes and [10, 20, 60, 70] in bboxes
        ds = make_wildhead("ulb_train", Cfg(data_dir_WildHead=str(root)))
        assert ds[1]["img"].shape == (64, 64, 3)


class TestWiderFace:
    def test_bbx_gt_parse(self, tmp_path):
        from semiuhpe_tpu.data.datasets.widerface import parse_bbx_gt

        txt = tmp_path / "gt.txt"
        txt.write_text(
            "0--Parade/big.jpg\n2\n"
            "10 10 60 60 0 0 0 0 0 0\n"
            "5 5 10 10 0 0 0 0 0 0\n"       # too small
            "1--X/none.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n"
            "2--Y/inv.jpg\n1\n10 10 60 60 0 0 0 1 0 0\n"  # invalid
        )
        files, bboxes = parse_bbx_gt(str(txt), "/imgs")
        assert len(files) == 1
        assert bboxes[0] == [10, 10, 60, 60]


class TestBIWI:
    def test_npz(self, tmp_path):
        from semiuhpe_tpu.data.datasets.biwi import make_biwi

        rng = np.random.default_rng(0)
        path = str(tmp_path / "biwi.npz")
        np.savez(path, image=rng.integers(0, 255, (6, 64, 64, 3), np.uint8),
                 pose=rng.uniform(-60, 60, (6, 3)), img_size=64)
        test = make_biwi("biwitest", "test", Cfg(data_dir_BIWItest=path))
        s = test[0]
        assert s["img"].shape == (64, 64, 3)
        assert "euler_angles" in s
        train = make_biwi("biwitrain", "ulb_train", Cfg(data_dir_BIWItrain=path))
        s2 = train[0]
        assert s2["img_strong"].shape == (64, 64, 3)
        assert "aug_rot_mat" in s2


class TestDAD3DHeads:
    def test_scan_filter_cache(self, tmp_path):
        from semiuhpe_tpu.data.datasets.dad3dheads import make_dad3dheads

        from scipy.spatial.transform import Rotation

        def dad_rot_from_euler(pitch, yaw, roll):
            """Inverse of the extraction in pose_label_from_annotation:
            R.T has scipy-xyz angles (pitch+180, yaw, roll)."""
            rt = Rotation.from_euler(
                "xyz", [pitch + 180.0, yaw, roll], degrees=True).as_matrix()
            return rt.T.astype(np.float32)

        root = tmp_path / "dad"
        items, rots = [], []
        for i, yaw_deg in enumerate((20.0, 150.0)):  # front vs full-range
            item_id = f"it{i}"
            _img(str(root / "train/images" / f"{item_id}.png"))
            rot = dad_rot_from_euler(10.0, yaw_deg, 5.0)
            rots.append(rot)
            # Build a model_view_matrix whose rot_180-frame equals `rot`.
            mv = np.eye(4)
            mv[:3, :3] = np.diag([1.0, -1.0, -1.0]) @ rot
            os.makedirs(root / "train/annotations", exist_ok=True)
            with open(root / "train/annotations" / f"{item_id}.json", "w") as f:
                json.dump({"model_view_matrix": mv.tolist(),
                           "vertices": [], "projection_matrix": np.eye(4).tolist()}, f)
            items.append({"item_id": item_id, "bbox": [30, 30, 80, 90]})
        with open(root / "train/train.json", "w") as f:
            json.dump(items, f)

        # Reference semantics (raw_pose_labels_filter): full-range keeps
        # every face; the front-face skip only applies when NOT full-range.
        cfg = Cfg(data_dir_DAD3DHeads=str(root), is_full_range=False)
        ds = make_dad3dheads("train", cfg)
        assert len(ds) == 1  # 20-deg-yaw front face dropped
        s = ds[0]
        assert "euler_angles" not in s
        np.testing.assert_allclose(s["rot_mat"], rots[1], atol=2e-4)
        # Cache file written and reused.
        assert os.path.exists(root / "train/train_HeadPoseEstimation.json")
        ds2 = make_dad3dheads("train", cfg)
        assert len(ds2) == 1
        # Full-range (the supported mode) keeps all faces; use a fresh cache.
        os.remove(root / "train/train_HeadPoseEstimation.json")
        ds3 = make_dad3dheads("train", Cfg(data_dir_DAD3DHeads=str(root),
                                           is_full_range=True))
        assert len(ds3) == 2

        # Raw-views mode: uint8 crop + unchanged rot_mat (DAD labeled side
        # takes no view augs; the device step only normalizes).
        ds4 = make_dad3dheads("train", Cfg(data_dir_DAD3DHeads=str(root),
                                           is_full_range=True,
                                           device_views=True))
        s4 = ds4[1]
        assert s4["img_raw"].dtype == np.uint8 and "img" not in s4
        np.testing.assert_allclose(s4["rot_mat"], rots[1], atol=2e-4)


class TestEvalConversions:
    def test_dad_euler_extraction_roundtrip(self):
        """cli.evaluate's full-range Euler extraction inverts the DAD label
        convention used by the dataset builder."""
        from scipy.spatial.transform import Rotation

        from semiuhpe_tpu.cli.evaluate import euler_from_matrix_dad_convention

        def dad_rot_from_euler(pitch, yaw, roll):
            rt = Rotation.from_euler(
                "xyz", [pitch + 180.0, yaw, roll], degrees=True).as_matrix()
            return rt.T.astype(np.float32)

        cases = [(10.0, 20.0, 5.0), (-30.0, 150.0, -10.0), (5.0, -120.0, 40.0)]
        rots = np.stack([dad_rot_from_euler(*c) for c in cases])
        out = euler_from_matrix_dad_convention(rots)
        for (p, y, r), got in zip(cases, out):
            # Euler triples are equivalent up to the (p+-180, 180-y, r+-180)
            # aliasing; compare rotation matrices instead.
            back = dad_rot_from_euler(*got)
            np.testing.assert_allclose(back, dad_rot_from_euler(p, y, r),
                                       atol=1e-4)


class TestSyntheticDispatch:
    """get_dataset('synthetic') split semantics (datasets/__init__.py)."""

    @staticmethod
    def _cfg(**kw):
        from types import SimpleNamespace
        base = dict(synthetic_size=64, ss_ratio=0.25, synthetic_test_size=0,
                    rotate_aug=False, is_full_range=False, input_size=32,
                    device_views=False)
        base.update(kw)
        return SimpleNamespace(**base)

    def test_splits_are_disjoint_and_cover_pool(self):
        from semiuhpe_tpu.data.datasets import get_dataset
        cfg = self._cfg()
        lab = get_dataset("synthetic", "train", cfg)
        ulb = get_dataset("synthetic", "ulb_train", cfg)
        assert len(lab) == 16 and len(ulb) == 48
        # disjoint pose-index spaces: no labeled euler appears in unlabeled
        lab_set = {tuple(e) for e in np.round(lab.eulers, 4)}
        ulb_set = {tuple(e) for e in np.round(ulb.eulers, 4)}
        assert not (lab_set & ulb_set)

    def test_test_transform_deterministic_across_device_views(self):
        """The test phase applies the same deterministic transform in
        both modes: host path = normalize(raw render); device path ships
        img_raw which the eval step normalizes identically.  (Before this
        the host path applied the stochastic weak view — blur + RRC — so
        eval metrics shifted with --device_views.)"""
        from semiuhpe_tpu.data.datasets import get_dataset
        from semiuhpe_tpu.ops.views import batch_images
        host = get_dataset("synthetic", "test", self._cfg())
        dev = get_dataset("synthetic", "test",
                          self._cfg(device_views=True))
        for i in (0, 7):
            a, b = host[i], dev[i]
            assert "img" in a and "img_raw" in b and "img" not in b
            np.testing.assert_allclose(
                a["img"], np.asarray(batch_images(b)), atol=1e-5)
            np.testing.assert_array_equal(a["rot_mat"], b["rot_mat"])
        # repeated reads are bit-identical (no stochastic views)
        np.testing.assert_array_equal(host[3]["img"], host[3]["img"])

    def test_test_size_decoupled_from_pool(self):
        """--synthetic_test_size keeps eval cost flat when the unlabeled
        pool grows (0 = legacy behavior: test n == synthetic_size)."""
        from semiuhpe_tpu.data.datasets import get_dataset
        assert len(get_dataset("synthetic", "test", self._cfg())) == 64
        small = get_dataset("synthetic", "test",
                            self._cfg(synthetic_test_size=16))
        assert len(small) == 16
        # Same held-out seed-1 distribution.  (Only the first euler column
        # is prefix-stable across sizes — columns are drawn in blocks of n —
        # so the guarantee is distributional, plus: the test set depends
        # only on synthetic_test_size, never on the pool size.)
        big = get_dataset("synthetic", "test", self._cfg())
        np.testing.assert_array_equal(small.eulers[:, 0], big.eulers[:16, 0])
        pool_invariant = get_dataset(
            "synthetic", "test",
            self._cfg(synthetic_size=4096, synthetic_test_size=16))
        np.testing.assert_array_equal(small.eulers, pool_invariant.eulers)
