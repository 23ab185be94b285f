"""Device-resident data pools (data/device_pool.py): gather equivalence
with host batches, sampling semantics, and a full trainer e2e run with
--device_data on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semiuhpe_tpu.data.device_pool import (DevicePool, epoch_indices, gather,
                                           infinite_indices, jit_pool_step,
                                           with_pools)
from semiuhpe_tpu.parallel import make_mesh


class _FakePacked:
    """get_batch-protocol dataset with deterministic contents."""

    def __init__(self, n=32, size=8):
        rng = np.random.RandomState(0)
        self.imgs = rng.randint(0, 255, (n, size, size, 3), np.uint8)
        self.rots = rng.randn(n, 3, 3).astype(np.float32)
        self.n = n

    def __len__(self):
        return self.n

    def get_batch(self, idxs):
        idxs = np.asarray(idxs, np.int64)
        return {"idx": idxs.astype(np.int32),
                "img_raw": self.imgs[idxs],
                "rot_mat": self.rots[idxs]}


def test_gather_matches_host_batch():
    ds = _FakePacked()
    pool = DevicePool(ds)
    idx = jnp.asarray([3, 17, 0, 31], jnp.int32)
    got = jax.jit(gather)(pool.arrays, idx)
    want = ds.get_batch(np.asarray(idx))
    for k in ("img_raw", "rot_mat", "idx"):
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])


def test_with_pools_equals_direct_step():
    ds = _FakePacked()
    pool = DevicePool(ds)

    def step(state, batch, scale):
        m = jnp.sum(batch["img_raw"].astype(jnp.float32)) * scale
        return state + 1, {"m": m, "idx0": batch["idx"][0]}

    idx = jnp.asarray([5, 6, 7, 8], jnp.int32)
    s1, m1 = with_pools(step, 1)(jnp.float32(0), pool.arrays, idx,
                                 jnp.float32(2.0))
    s2, m2 = step(jnp.float32(0), gather(pool.arrays, idx), jnp.float32(2.0))
    assert float(m1["m"]) == float(m2["m"])
    assert int(m1["idx0"]) == 5


def test_jit_pool_step_sharded_matches_single():
    """Pooled + mesh-sharded index path == plain host-batch math."""
    mesh = make_mesh()
    ds = _FakePacked(n=64)
    pool = DevicePool(ds, mesh)

    def step(state, batch, scale):
        x = batch["img_raw"].astype(jnp.float32) / 255.0
        return state + jnp.mean(x) * scale, {"s": jnp.sum(x)}

    stepped = jit_pool_step(step, mesh, n_batches=1, n_scalar_args=1,
                            donate_state=False)
    idx = np.arange(16, 32, dtype=np.int32)
    from semiuhpe_tpu.parallel.mesh import batch_sharding
    out, m = stepped(jnp.float32(0.0), pool.arrays,
                     jax.device_put(idx, batch_sharding(mesh)),
                     jnp.float32(3.0))
    want = ds.imgs[16:32].astype(np.float32) / 255.0
    np.testing.assert_allclose(float(m["s"]), want.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(out), want.mean() * 3.0, rtol=1e-5)


def test_epoch_indices_semantics():
    batches = list(epoch_indices(37, 8, seed=1, epoch=0))
    assert len(batches) == 4                      # drop_last
    flat = np.concatenate(batches)
    assert len(np.unique(flat)) == 32             # no repeats in an epoch
    again = np.concatenate(list(epoch_indices(37, 8, seed=1, epoch=0)))
    np.testing.assert_array_equal(flat, again)    # reproducible
    other = np.concatenate(list(epoch_indices(37, 8, seed=1, epoch=1)))
    assert not np.array_equal(flat, other)        # reshuffled per epoch

    it = infinite_indices(16, 8, seed=0)
    a, b, c = next(it), next(it), next(it)
    assert len(a) == len(b) == len(c) == 8


def test_device_data_train_e2e(tmp_path):
    """Full trainer loop with --device_data on the CPU mesh: pools staged,
    in-program gathers, pooled eval + dynamic sweep."""
    from semiuhpe_tpu.cli import train as train_cli
    from tests.test_e2e import ARGS

    best_err = train_cli.main(
        ARGS + ["--exp_dir", str(tmp_path), "--device_views", "true",
                "--packed_cache", str(tmp_path / "pack"),
                "--device_data", "true", "--exp_name", "ddp"])
    assert np.isfinite(best_err) and best_err < 360


def test_jit_pool_scan_matches_sequential_steps():
    """One K-step jit_pool_scan chunk == K sequential jit_pool_step
    dispatches: same per-step keys and index rows, state carried through
    identically (the trainer's --scan_chunk correctness contract)."""
    from semiuhpe_tpu.data.device_pool import jit_pool_scan
    from semiuhpe_tpu.parallel.mesh import batch_sharding, replicated

    mesh = make_mesh()
    ds = _FakePacked(n=64)
    pool = DevicePool(ds, mesh)

    def step(state, batch, key, scale):
        x = batch["img_raw"].astype(jnp.float32) / 255.0
        noise = jax.random.normal(key, ())
        new = state * 0.9 + jnp.mean(x) * scale + 0.01 * noise
        return new, {"s": jnp.sum(x), "state": new}

    k, b = 3, 16
    rows = np.stack([np.arange(i * b, (i + 1) * b, dtype=np.int32)
                     for i in range(k)])
    keys = jnp.stack([jax.random.key(100 + i) for i in range(k)])

    single = jit_pool_step(step, mesh, n_batches=1, n_scalar_args=2,
                           donate_state=False)
    st = jnp.float32(1.0)
    for i in range(k):
        st, m_last = single(st, pool.arrays,
                            jax.device_put(rows[i], batch_sharding(mesh)),
                            keys[i], jnp.float32(3.0))

    from jax.sharding import NamedSharding, PartitionSpec as P
    scan = jit_pool_scan(step, mesh, n_batches=1, n_scalar_args=1,
                         donate_state=False)
    st_c, m_c = scan(jnp.float32(1.0), pool.arrays,
                     jax.device_put(rows, NamedSharding(mesh, P(None, "data"))),
                     keys, jnp.float32(3.0))
    np.testing.assert_allclose(float(st_c), float(st), rtol=1e-6)
    np.testing.assert_allclose(float(m_c["s"]), float(m_last["s"]), rtol=1e-6)


def test_scan_chunk_train_e2e(tmp_path):
    """Full trainer with --scan_chunk 2: exercises full chunks, the
    single-step fallback at every log/val/stage boundary, and an
    epoch-tail shorter than the chunk.  The trajectory tracks the
    single-step run closely (bitwise parity is not guaranteed across
    program boundaries — XLA may reassociate reductions differently in
    the scan body — so compare with a loose tolerance)."""
    from semiuhpe_tpu.cli import train as train_cli
    from tests.test_e2e import ARGS

    common = ARGS + ["--device_views", "true",
                     "--packed_cache", str(tmp_path / "pack"),
                     "--device_data", "true"]
    err_single = train_cli.main(
        common + ["--exp_dir", str(tmp_path / "a"), "--exp_name", "one"])
    err_chunked = train_cli.main(
        common + ["--exp_dir", str(tmp_path / "b"), "--exp_name", "two",
                  "--scan_chunk", "2"])
    assert np.isfinite(err_chunked)
    np.testing.assert_allclose(err_chunked, err_single, rtol=0.05)
