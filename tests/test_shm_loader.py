"""Shared-memory multiprocess loader: correctness + zero-pickle design."""

import numpy as np
import pytest

from semiuhpe_tpu.data.shm_loader import ShmLoader, ShmWorkerError


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


class PoisonDataset(ArithmeticDataset):
    """Raises on one specific index (decode failure mid-epoch)."""

    def __getitem__(self, i):
        if i == 11:
            raise ValueError("synthetic decode failure")
        return super().__getitem__(i)


@pytest.mark.e2e
def test_shm_loader_close_after_abandoned_epoch_then_reiterate():
    """close() with tasks still in flight must reset the in-flight count:
    a fresh _start() builds new (empty) queues, so a stale count would make
    the next epoch's _drain() block forever."""
    ds = ArithmeticDataset(64)
    loader = ShmLoader(ds, 8, shuffle=False, drop_last=True, num_workers=2)
    try:
        it1 = iter(loader)
        next(it1)      # several tasks in flight
        it1.close()    # abandon
        loader.close()  # workers join; completions are gone with the queues
        for batch in loader:  # previously: hang in _drain()
            np.testing.assert_array_equal(batch["img_raw"][:, 0, 0, 0],
                                          batch["idx"] % 251)
    finally:
        loader.close()


@pytest.mark.e2e
def test_shm_loader_dataset_exception_raises_not_hangs():
    ds = PoisonDataset(32)
    loader = ShmLoader(ds, 8, shuffle=False, drop_last=True, num_workers=2)
    try:
        with pytest.raises(ShmWorkerError, match="synthetic decode failure"):
            for _ in loader:
                pass
    finally:
        loader.close()


@pytest.mark.e2e
def test_shm_loader_inline_sweep_does_not_shift_epoch_order():
    """A mid-epoch concurrent (inline) pass uses its own RNG stream, so the
    main iterator's epoch-to-epoch shuffle sequence matches a sweep-free
    run exactly (reproducibility under dynamic-threshold sweeps)."""
    def epoch_orders(with_sweep):
        ds = ArithmeticDataset(32)
        loader = ShmLoader(ds, 8, shuffle=True, drop_last=True,
                           num_workers=1, seed=7)
        try:
            orders = []
            for _ in range(3):
                it = iter(loader)
                first = next(it)
                got = [first["idx"].copy()]
                if with_sweep:
                    sweep = [b["idx"].copy() for b in loader]
                    assert sorted(np.concatenate(sweep).tolist()) == \
                        list(range(32))
                got += [b["idx"].copy() for b in it]
                orders.append(np.concatenate(got))
            return orders
        finally:
            loader.close()

    plain = epoch_orders(with_sweep=False)
    swept = epoch_orders(with_sweep=True)
    for a, b in zip(plain, swept):
        np.testing.assert_array_equal(a, b)


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
