"""WildHead-scale dynamic-sweep equivalence (VERDICT r3 next #8).

Real ``--device_data`` runs compute the dynamic threshold with
``pooled_entropy_threshold`` (chunked in-program pool gathers, only index
vectors crossing the tunnel); the reference semantics are the host-gather
``dynamic_entropy_threshold`` (compute_dynamic_entropy_threshold,
/root/reference/src/agent.py:357-417).  The two paths were previously only
equivalence-tested at toy sizes, but WildHead — the dataset real SSL runs
sweep — is ~403k crops.  This module asserts identical thresholds at
>=400k entropies through both code paths:

* a 400,001-entropy sweep through the REAL pooled chunking/padding/quantile
  code with an identity entropy head — exact equality with the host path,
  including the padded tail chunk and both left_ratio regimes;
* a 401,408-crop sweep with a real conv net + on-device weak views (the
  exact ``_entropy_pooled`` construction cli/train.py uses), pooled vs
  host-gather, same per-chunk view keys — thresholds agree to float32
  round-off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semiuhpe_tpu.parallel import make_mesh
from semiuhpe_tpu.parallel.mesh import batch_sharding, jit_with_mesh, replicated
from semiuhpe_tpu.training import steps as steps_mod


def _keys(seed, n):
    for i in range(n):
        yield jax.random.key(seed * 100003 + i)


def test_pooled_threshold_equals_host_gather_at_wildhead_scale():
    """400,001 entropies (> WildHead's ~403k crop order, with a ragged tail
    chunk) through the real pooled sweep vs the host-gather path: EXACT
    threshold equality at both the reference left_ratio (0.95) and the
    ladder one (0.35)."""
    mesh = make_mesh()
    n, chunk = 400_001, 4096
    rng = np.random.default_rng(0)
    vals = rng.normal(-4.0, 1.0, size=n).astype(np.float32)
    pools = {"ent": jax.device_put(jnp.asarray(vals), replicated(mesh))}
    idx_sh = batch_sharding(mesh)

    def _pooled(state, pools, idx, key):
        del state, key
        return jnp.take(pools["ent"], idx, axis=0)

    entropy_pool = jit_with_mesh(
        _pooled, mesh,
        in_shardings=(replicated(mesh), replicated(mesh), idx_sh,
                      replicated(mesh)))

    def host_batches():
        for start in range(0, n, chunk):
            yield {"img": vals[start:min(start + chunk, n)]}

    for left_ratio in (0.95, 0.35):
        got = steps_mod.pooled_entropy_threshold(
            entropy_pool, None, pools, n, chunk, _keys(1, 1 + n // chunk),
            left_ratio, put_idx=lambda a: jax.device_put(a, idx_sh))
        want = steps_mod.dynamic_entropy_threshold(
            lambda st, img: img, None, host_batches(), left_ratio)
        assert got == want, (left_ratio, got, want)
        # and both are the plain order statistic of the raw values
        s = np.sort(vals)
        assert got == float(s[int(n * left_ratio)])


@pytest.mark.slow
def test_real_net_pooled_sweep_matches_host_at_scale():
    """The trainer's actual pooled-entropy construction (weak views sampled
    in-program from raw uint8 crops + teacher entropy — cli/train.py
    ``_entropy_pooled``) over 401,408 pooled 8x8 crops vs the host-gather
    path scoring the same weak views with the same per-chunk keys."""
    from semiuhpe_tpu.models import build_network
    from semiuhpe_tpu.ops.views import weak_view_images
    from semiuhpe_tpu.training.state import create_train_state

    mesh = make_mesh()
    chunk = 4096
    n = 98 * chunk  # 401,408 >= WildHead scale; divisible so view batches align
    size = 8
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
    pools = {"img_raw": jax.device_put(jnp.asarray(imgs), replicated(mesh))}
    idx_sh = batch_sharding(mesh)

    net = build_network("tiny", num_outputs=9)
    state = jax.jit(lambda k: create_train_state(
        net, k, (size, size, 3), 1e-3))(jax.random.key(0))

    _ent_inner = steps_mod.make_entropy_fn(net, use_ema=True)

    def _entropy_pooled(state, pools, idx, key):
        img = weak_view_images(key, jnp.take(pools["img_raw"], idx, axis=0))
        return _ent_inner(state, img)

    repl = replicated(mesh)
    entropy_pool = jit_with_mesh(_entropy_pooled, mesh,
                                 in_shardings=(repl, repl, idx_sh, repl))

    got = steps_mod.pooled_entropy_threshold(
        entropy_pool, state, pools, n, chunk, _keys(2, n // chunk), 0.95,
        put_idx=lambda a: jax.device_put(a, idx_sh))

    view_jit = jax.jit(weak_view_images)

    def host_batches():
        for i, k in zip(range(0, n, chunk), _keys(2, n // chunk)):
            yield {"img": view_jit(k, jnp.asarray(imgs[i:i + chunk]))}

    ent_jit = jit_with_mesh(_ent_inner, mesh)
    want = steps_mod.dynamic_entropy_threshold(
        lambda st, img: ent_jit(st, jax.device_put(img)), state,
        host_batches(), 0.95)
    # Same views, same net: the only divergence is sharded-vs-replicated
    # reduction order, so the order statistic matches to float32 round-off.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
