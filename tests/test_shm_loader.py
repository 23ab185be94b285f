"""Shared-memory multiprocess loader: correctness + zero-pickle design."""

import numpy as np
import pytest

from semiuhpe_tpu.data.shm_loader import ShmLoader


class ArithmeticDataset:
    """Deterministic picklable dataset: sample i is fully determined by i,
    so any worker producing any slot can be checked exactly."""

    def __init__(self, n, shape=(8, 8, 3)):
        self.n = n
        self.shape = shape

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full(self.shape, i % 251, np.uint8)
        return {"idx": np.int32(i),
                "img_raw": img,
                "rot_mat": np.eye(3, dtype=np.float32) * (i + 1)}


@pytest.mark.e2e
def test_shm_loader_exact_batches():
    ds = ArithmeticDataset(37)
    loader = ShmLoader(ds, 8, shuffle=False, drop_last=False, num_workers=2)
    try:
        seen = []
        for batch in loader:
            assert set(batch) == {"idx", "img_raw", "rot_mat"}
            for j, i in enumerate(batch["idx"]):
                assert batch["img_raw"][j, 0, 0, 0] == i % 251
                np.testing.assert_allclose(batch["rot_mat"][j],
                                           np.eye(3) * (i + 1))
            seen.extend(batch["idx"].tolist())
        assert seen == list(range(37))  # order preserved, last batch short
    finally:
        loader.close()


@pytest.mark.e2e
def test_shm_loader_concurrent_iterators_do_not_corrupt():
    """The SSL trainer iterates the unlabeled loader twice at once: the
    training `cycle()` iterator holds in-flight ring slots while the
    dynamic-threshold sweep does a full pass.  The second iterator must
    not share the ring (it falls back to inline batches)."""
    ds = ArithmeticDataset(64)
    loader = ShmLoader(ds, 8, shuffle=False, drop_last=True, num_workers=2)
    try:
        outer = iter(loader)
        first = next(outer)  # ring now owned by `outer`, slots in flight
        first_idx = first["idx"].copy()
        sweep = [(b["idx"].copy(), b["img_raw"][:, 0, 0, 0].copy())
                 for b in loader]  # full concurrent pass
        assert np.concatenate([i for i, _ in sweep]).tolist() == list(range(64))
        for idxs, pix in sweep:
            np.testing.assert_array_equal(pix, idxs % 251)
        # outer iterator unharmed: continues in order with valid contents;
        # yielded batches are self-owned copies, safe to hold across nexts
        np.testing.assert_array_equal(first_idx, np.arange(8))
        rest = [next(outer) for _ in range(7)]
        got = np.concatenate([b["idx"] for b in rest])
        np.testing.assert_array_equal(got, np.arange(8, 64))
        for b in rest:
            np.testing.assert_array_equal(b["img_raw"][:, 0, 0, 0],
                                          b["idx"] % 251)
    finally:
        loader.close()


@pytest.mark.e2e
def test_shm_loader_abandoned_epoch_then_fresh_epoch():
    """Breaking out mid-epoch leaves tasks in flight; the next epoch must
    drain them before reusing slots (stale completions/writes otherwise
    corrupt the new epoch's batches)."""
    ds = ArithmeticDataset(64)
    loader = ShmLoader(ds, 8, shuffle=False, drop_last=True, num_workers=2,
                       slots_per_worker=2)
    try:
        it1 = iter(loader)
        next(it1)          # slots filled, several tasks in flight
        it1.close()        # abandon mid-epoch (the trainer's `break`)
        for batch in loader:  # fresh epoch must see exact data
            np.testing.assert_array_equal(batch["img_raw"][:, 0, 0, 0],
                                          batch["idx"] % 251)
            for j, i in enumerate(batch["idx"]):
                np.testing.assert_allclose(batch["rot_mat"][j],
                                           np.eye(3) * (i + 1))
    finally:
        loader.close()


@pytest.mark.e2e
def test_shm_loader_shuffle_epochs_and_drop_last():
    ds = ArithmeticDataset(20)
    loader = ShmLoader(ds, 8, shuffle=True, drop_last=True, num_workers=2,
                       seed=0)
    try:
        e1 = [b["idx"].copy() for b in loader]
        e2 = [b["idx"].copy() for b in loader]
        assert len(e1) == len(e2) == 2  # 20 // 8
        a1 = np.concatenate(e1)
        a2 = np.concatenate(e2)
        assert len(set(a1.tolist())) == 16  # no duplicates within an epoch
        assert not np.array_equal(a1, a2)  # reshuffled across epochs
    finally:
        loader.close()
