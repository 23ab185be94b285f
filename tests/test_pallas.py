"""Pallas kernel tests (interpret mode on CPU): the fused cut-occlusion
kernel must agree exactly with the reference-semantics XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiuhpe_tpu.ops import augment
from semiuhpe_tpu.ops.pallas_augment import fused_cut_occlusion


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # On the CPU test mesh, Pallas TPU kernels run via the interpreter.
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _unfused(images, cut, mix, donor_idx):
    """Reference sequencing: cutout the whole batch, then cutmix with donors
    drawn from the *post-cutout* batch (agent.py:125-126)."""
    after_cut = augment.apply_cutout(images, cut)
    return augment.apply_cutmix(after_cut, mix, donor_idx)


def test_fused_matches_unfused():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
    key = jax.random.key(1)
    k_cut, k_mix, k_perm = jax.random.split(key, 3)
    cut = augment.sample_holes(k_cut, 8, 64, 64, 3)
    mix = augment.sample_holes(k_mix, 8, 64, 64, 3)
    donor_idx = jax.random.permutation(k_perm, 8)

    expected = np.asarray(_unfused(images, cut, mix, donor_idx))
    got = np.asarray(fused_cut_occlusion(images, cut, mix, donor_idx))
    np.testing.assert_array_equal(got, expected)


def test_fused_identity_when_no_holes():
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    zeros = jnp.zeros((4, 3), jnp.int32)
    empty = augment.HoleParams(x0=zeros, x1=zeros, y0=zeros, y1=zeros)
    out = fused_cut_occlusion(images, empty, empty, jnp.arange(4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


def test_cutout_zeroes_holes_only():
    images = jnp.ones((2, 32, 32, 3), jnp.float32)
    cut = augment.HoleParams(
        x0=jnp.asarray([[4, 0, 0], [0, 0, 0]], jnp.int32),
        x1=jnp.asarray([[8, 0, 0], [0, 0, 0]], jnp.int32),
        y0=jnp.asarray([[10, 0, 0], [0, 0, 0]], jnp.int32),
        y1=jnp.asarray([[12, 0, 0], [0, 0, 0]], jnp.int32),
    )
    zeros = jnp.zeros((2, 3), jnp.int32)
    empty = augment.HoleParams(zeros, zeros, zeros, zeros)
    out = np.asarray(fused_cut_occlusion(images, cut, empty, jnp.arange(2)))
    assert (out[0, 10:12, 4:8] == 0).all()
    assert out[0].sum() == 32 * 32 * 3 - 2 * 4 * 3
    assert (out[1] == 1).all()


def test_hole_sizes_scale_with_resolution():
    """Half-extents are U[10,20) at 224px (reference parity) and shrink
    proportionally for smaller crops, keeping relative occlusion fixed."""
    import jax
    from semiuhpe_tpu.ops.augment import sample_holes

    h224 = sample_holes(jax.random.key(0), 64, 224, 224)
    w224 = np.asarray(h224.x1 - h224.x0)
    assert w224.max() <= 2 * 19 and w224.max() >= 2 * 15  # U[10,20) spans
    h96 = sample_holes(jax.random.key(0), 64, 96, 96)
    w96 = np.asarray(h96.x1 - h96.x0)
    assert w96.max() <= 2 * 8  # ~U[4,9)
