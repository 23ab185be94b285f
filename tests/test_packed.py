"""Packed decode-once datasets + device-view flip label math."""

import numpy as np
import jax
import jax.numpy as jnp

from semiuhpe_tpu.data.datasets.base import SyntheticHeadPose, euler_to_rot_np
from semiuhpe_tpu.data.loader import Loader
from semiuhpe_tpu.data.packed import PackedHeadPose, is_packed, pack_dataset
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.ops.views import make_views
from semiuhpe_tpu.training.steps import labeled_device_views


def test_flip_rotation_equals_euler_negation(rng):
    """R' = F R F must equal the reference's yaw/roll negation
    (dataset_300WLP.py:110-113)."""
    for _ in range(20):
        p, y, r = rng.uniform(-80, 80, 3)
        flipped = so3.flip_rotation(jnp.asarray(euler_to_rot_np(p, y, r)))
        expect = euler_to_rot_np(p, -y, -r)
        np.testing.assert_allclose(np.asarray(flipped), expect, atol=1e-6)


def test_make_views_flip_consistency():
    """Flip hits the base crop: weak and strong of a flipped sample must
    both show flipped content.  With blur off, RRC identity forced via
    scale clamp is not available, so check statistically: flipped weak ==
    weak of manually flipped input for the same key."""
    rng = jax.random.key(3)
    img = np.zeros((4, 32, 32, 3), np.uint8)
    img[:, :, :16] = 255  # left half bright
    v = make_views(rng, jnp.asarray(img), 32, blur_prob=0.0, flip_prob=1.0)
    v_manual = make_views(rng, jnp.asarray(img[:, :, ::-1]), 32,
                          blur_prob=0.0, flip_prob=0.0)
    np.testing.assert_allclose(np.asarray(v["img"]),
                               np.asarray(v_manual["img"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v["img_strong"]),
                               np.asarray(v_manual["img_strong"]), atol=1e-5)
    assert bool(np.all(np.asarray(v["flip"])))


def test_labeled_device_views_label_math():
    ds = SyntheticHeadPose(n=8, raw_views=True)
    batch = {k: np.stack([ds[i][k] for i in range(8)])
             for k in ("img_raw", "rot_mat", "euler_angles")}
    out = labeled_device_views(jax.random.key(0), batch)
    # Recover the flip mask from the rotation change.
    same = np.allclose(np.asarray(out["rot_mat"]), batch["rot_mat"], atol=1e-5)
    assert not same  # with 8 samples at p=.5 some flip w.h.p. for this key
    for i in range(8):
        r_out = np.asarray(out["rot_mat"][i])
        e_out = np.asarray(out["euler_angles"][i])
        if np.allclose(r_out, batch["rot_mat"][i], atol=1e-5):
            np.testing.assert_allclose(e_out, batch["euler_angles"][i])
        else:
            p, y, r = batch["euler_angles"][i]
            np.testing.assert_allclose(r_out, euler_to_rot_np(p, -y, -r),
                                       atol=1e-5)
            np.testing.assert_allclose(e_out, [p, -y, -r], atol=1e-6)
    assert "img" in out and "img_raw" not in out


def test_pack_roundtrip_and_batch_loader(tmp_path):
    ds = SyntheticHeadPose(n=10, raw_views=True, size=32)
    d = str(tmp_path / "packed")
    pack_dataset(ds, d, log_every=0)
    assert is_packed(d)
    packed = PackedHeadPose(d)
    assert len(packed) == 10

    b = packed.get_batch([3, 1, 7])
    np.testing.assert_array_equal(b["img_raw"][0], ds[3]["img_raw"])
    np.testing.assert_allclose(b["rot_mat"][1], ds[1]["rot_mat"])
    np.testing.assert_array_equal(b["idx"], [3, 1, 7])

    # Loader must take the vectorized fast path (no pool) and batch right.
    loader = Loader(packed, 4, shuffle=False, drop_last=True, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["img_raw"].shape == (4, 32, 32, 3)
    assert loader._pool is None  # fast path never built a pool


def test_pack_fingerprint_detects_stale_cache(tmp_path):
    """A pack carries its source dataset's fingerprint, so a changed
    split/seed under the same cache path is detectable (the train CLI
    repacks on mismatch)."""
    d = str(tmp_path / "packed")
    ds = SyntheticHeadPose(n=6, raw_views=True, size=32, seed=0)
    pack_dataset(ds, d, log_every=0)
    packed = PackedHeadPose(d)
    assert packed.fingerprint == ds.fingerprint
    # same n, different seed -> different pool, fingerprints must differ
    other = SyntheticHeadPose(n=6, raw_views=True, size=32, seed=1)
    assert other.fingerprint != packed.fingerprint
    # offset (the ss_ratio split position) is part of the identity too
    shifted = SyntheticHeadPose(n=6, offset=2, raw_views=True, size=32)
    assert shifted.fingerprint != packed.fingerprint
    # repack over the same dir publishes the new identity atomically
    pack_dataset(other, d, log_every=0)
    assert PackedHeadPose(d).fingerprint == other.fingerprint
    np.testing.assert_array_equal(
        PackedHeadPose(d).get_batch([0])["img_raw"][0], other[0]["img_raw"])


def test_packed_loader_throughput_sanity(tmp_path):
    """The point of packing: per-batch cost is a memmap gather.  Just
    assert it is far faster than per-sample rendering (>20x here)."""
    import time

    ds = SyntheticHeadPose(n=64, raw_views=True, size=64)
    d = str(tmp_path / "packed")
    pack_dataset(ds, d, log_every=0)
    packed = PackedHeadPose(d)

    t0 = time.perf_counter()
    for _ in range(5):
        for i in range(0, 64, 16):
            packed.get_batch(range(i, i + 16))
    packed_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(16):
        ds[i]
    render_dt = (time.perf_counter() - t0) * 20  # scale to same sample count
    assert packed_dt < render_dt / 20
