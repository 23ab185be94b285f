"""Training-step tests: supervised + SSL semantics, EMA rule, sharding
equivalence on the 8-device virtual mesh, dynamic threshold."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiuhpe_tpu.models.layers import ConvBN, RegressionHead
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.parallel import make_mesh, jit_step, shard_batch, replicate
from semiuhpe_tpu.training import steps as steps_mod
from semiuhpe_tpu.training.state import (
    TrainState, create_train_state, set_learning_rate)
from tests.conftest import random_rotations


class TinyNet(nn.Module):
    """Small conv net with BN + dropout to exercise the full state machinery."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(8, 3, 2)(x, train)
        x = ConvBN(16, 3, 2)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return RegressionHead((16,), 9, dropout=0.1)(x, train)


def _make_batch(rng, n, size=16):
    rot = random_rotations(rng, n)
    euler = np.degrees(np.asarray(so3.matrix_to_euler(jnp.asarray(rot))))
    # Make images weakly informative of the rotation so the loss can drop.
    img = np.tile(rot.reshape(n, 1, 9, 1), (1, size, 1, 3)).astype(np.float32)
    img = np.pad(img, ((0, 0), (0, 0), (0, size - 9), (0, 0)))
    return {
        "img": jnp.asarray(img),
        "rot_mat": jnp.asarray(rot),
        "euler_angles": jnp.asarray(euler, jnp.float32),
    }


def _make_ulb_batch(rng, n, size=16):
    b = _make_batch(rng, n, size)
    aug = np.stack([np.asarray(so3.euler_to_matrix(0.0, 0.0, a))
                    for a in rng.uniform(-0.5, 0.5, n).astype(np.float32)])
    return {
        "img": b["img"],
        "img_strong": b["img"] + 0.01,
        "rot_mat": b["rot_mat"],
        "aug_rot_mat": jnp.asarray(aug, jnp.float32),
    }


@pytest.fixture
def net():
    return TinyNet()


@pytest.fixture
def state(net):
    return create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)


class TestSupervised:
    def test_loss_decreases(self, net, state, rng):
        step = jax.jit(steps_mod.make_supervised_step(net, lr=1e-3))
        batch = _make_batch(rng, 16)
        losses = []
        for i in range(30):
            state, m = step(state, batch, jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 30
        assert np.isfinite(losses).all()

    def test_metrics_shapes(self, net, state, rng):
        step = jax.jit(steps_mod.make_supervised_step(net, lr=1e-3))
        _, m = step(state, _make_batch(rng, 8), jax.random.key(0))
        for k in ("loss", "err_deg", "lr"):
            assert np.asarray(m[k]).shape == ()

    def test_set_learning_rate_no_retrace(self, net, state, rng):
        traces = []

        def counting_step(*args):
            traces.append(1)
            return steps_mod.make_supervised_step(net, lr=1e-3)(*args)

        step = jax.jit(counting_step)
        batch = _make_batch(rng, 8)
        state, m1 = step(state, batch, jax.random.key(0))
        state = set_learning_rate(state, 1e-4)
        state, m2 = step(state, batch, jax.random.key(1))
        assert len(traces) == 1
        np.testing.assert_allclose(float(m2["lr"]), 1e-4, rtol=1e-6)


class TestSSL:
    def _step(self, net, **kw):
        defaults = dict(lr=1e-3, rotate_aug=True, cutout_aug=True,
                        cutmix_aug=True, stage1_iteration=0)
        defaults.update(kw)
        return jax.jit(steps_mod.make_ssl_step(net, **defaults))

    def test_runs_and_metrics_sane(self, net, state, rng):
        step = self._step(net)
        batch = _make_batch(rng, 8)
        ulb = _make_ulb_batch(rng, 16)
        state, m = step(state, batch, ulb, jax.random.key(0),
                        jnp.float32(0.0), jnp.float32(1.0))
        assert 0.0 <= float(m["mask_ratio"]) <= 1.0
        for k in ("loss", "unsuper_loss", "loss_all", "entropy_mean",
                  "err_weakAll_gt", "err_strongSuper_pseudo"):
            assert np.isfinite(float(m[k])), k

    def test_first_ssl_step_copies_student_to_teacher(self, net, state, rng):
        """stage2_iter = 0 -> alpha = 0 -> teacher := student (warmup rule)."""
        step = self._step(net)
        prev_params = state.params
        state, _ = step(state, _make_batch(rng, 8), _make_ulb_batch(rng, 8),
                        jax.random.key(0), jnp.float32(10.0), jnp.float32(1.0))
        for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(prev_params)):
            np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-7)

    def test_ema_moves_slowly_later(self, net, state, rng):
        step = self._step(net, stage1_iteration=0, ema_decay=0.999)
        state = state.replace(step=jnp.asarray(5000, jnp.int32))
        prev_ema = jax.tree_util.tree_map(np.asarray, state.ema_params)
        state, _ = step(state, _make_batch(rng, 8), _make_ulb_batch(rng, 8),
                        jax.random.key(0), jnp.float32(10.0), jnp.float32(1.0))
        # alpha = 0.999: teacher should barely move.
        for e0, e1 in zip(jax.tree_util.tree_leaves(prev_ema),
                          jax.tree_util.tree_leaves(state.ema_params)):
            diff = np.abs(np.asarray(e1) - e0).max()
            assert diff < 0.2

    def test_mask_all_out_gives_zero_unsuper(self, net, state, rng):
        step = self._step(net)
        _, m = step(state, _make_batch(rng, 8), _make_ulb_batch(rng, 8),
                    jax.random.key(0), jnp.float32(-1e9), jnp.float32(1.0))
        assert float(m["mask_ratio"]) == 0.0
        assert float(m["unsuper_loss"]) == 0.0

    def test_rotation_adjustment_conventions(self, rng):
        a = jnp.asarray(random_rotations(rng, 4)) * 3.0
        aug = jnp.asarray(np.stack([np.asarray(so3.euler_to_matrix(0.0, 0.0, 0.3))] * 4))
        out_dad = steps_mod.adjust_teacher_prediction(a.reshape(4, 9), aug, "DAD3DHeads")
        np.testing.assert_allclose(
            np.asarray(out_dad.reshape(4, 3, 3)), np.asarray(aug @ a), atol=1e-5)
        out_wlp = steps_mod.adjust_teacher_prediction(a.reshape(4, 9), aug, "300WLP")
        r180 = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        expect = np.asarray(a) @ (r180 @ np.swapaxes(np.asarray(aug), -1, -2) @ r180)
        np.testing.assert_allclose(np.asarray(out_wlp.reshape(4, 3, 3)), expect, atol=1e-5)


class TestSharded:
    def test_supervised_matches_single_device(self, net, rng):
        mesh = make_mesh()
        assert len(mesh.devices.ravel()) == 8
        state1 = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        state2 = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        batch = _make_batch(rng, 16)

        plain = jax.jit(steps_mod.make_supervised_step(net, lr=1e-3))
        sharded = jit_step(steps_mod.make_supervised_step(net, lr=1e-3), mesh,
                           n_batch_args=1, n_scalar_args=1, donate_state=False)

        state2 = replicate(mesh, state2)
        sbatch = shard_batch(mesh, batch)
        # Losses must agree step-for-step (Adam params drift elementwise from
        # fp reassociation sign flips, so we compare the observable: loss).
        for i in range(3):
            state1, m1 = plain(state1, batch, jax.random.key(i))
            state2, m2 = sharded(state2, sbatch, jax.random.key(i))
            np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                       rtol=5e-4)

    def test_gradients_match_across_sharding(self, net, rng):
        """The fundamental SPMD check: global-view gradients on the 8-device
        mesh equal single-device gradients."""
        from semiuhpe_tpu.training.steps import _supervised_loss

        mesh = make_mesh()
        state = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        batch = _make_batch(rng, 16)

        def grad_fn(params, batch_stats, batch):
            return jax.grad(
                lambda p: _supervised_loss(net, p, batch_stats, batch,
                                           jax.random.key(9), "matrixFisher",
                                           None)[0])(params)

        g1 = jax.jit(grad_fn)(state.params, state.batch_stats, batch)
        from semiuhpe_tpu.parallel.mesh import batch_sharding, replicated
        g2 = jax.jit(grad_fn, in_shardings=(replicated(mesh), replicated(mesh),
                                            batch_sharding(mesh)))(
            replicate(mesh, state.params), replicate(mesh, state.batch_stats),
            shard_batch(mesh, batch))
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-3)

    def test_ssl_step_sharded_runs(self, net, rng):
        mesh = make_mesh()
        state = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        state = replicate(mesh, state)
        step = jit_step(
            steps_mod.make_ssl_step(net, lr=1e-3, cutout_aug=True,
                                    rotate_aug=True, stage1_iteration=0),
            mesh, n_batch_args=2, n_scalar_args=3, donate_state=False)
        batch = shard_batch(mesh, _make_batch(rng, 16))
        ulb = shard_batch(mesh, _make_ulb_batch(rng, 32))
        state, m = step(state, batch, ulb, jax.random.key(0),
                        jnp.float32(0.0), jnp.float32(1.0))
        assert np.isfinite(float(m["loss_all"]))


class TestDynamicThreshold:
    def test_quantile_semantics(self, rng):
        """Threshold sits at the left_ratio quantile of all entropies."""
        values = iter([rng.normal(size=8).astype(np.float32) for _ in range(4)])

        def fake_entropy_fn(state, img):
            return jnp.asarray(next(values))

        batches = [{"img": None}] * 4
        # Recreate the same stream for the reference computation.
        rng2 = np.random.default_rng(0)
        all_e = np.sort(np.concatenate(
            [rng2.normal(size=8).astype(np.float32) for _ in range(4)]))
        thr = steps_mod.dynamic_entropy_threshold(fake_entropy_fn, None, batches, 0.75)
        assert thr == all_e[int(32 * 0.75)]
        assert (all_e < thr).mean() <= 0.75 + 1 / 32

    def test_entropy_fn_runs(self, net, state, rng):
        entropy_fn = jax.jit(steps_mod.make_entropy_fn(net))
        e = entropy_fn(state, _make_ulb_batch(rng, 8)["img"])
        assert e.shape == (8,)
        assert np.isfinite(np.asarray(e)).all()

    def test_raw_crop_sweep_scores_weak_view(self, rng):
        """Reference parity (agent.py:386-391): the dynamic-threshold sweep
        scores WEAK VIEWS, not raw crops.  In raw-crop (--device_views)
        modes ulb_entropy_images must therefore sample a weak view on
        device — identical to the train step's view generator — rather
        than just normalizing img_raw (the round-2 deviation)."""
        from semiuhpe_tpu.cli.train import ulb_entropy_images
        from semiuhpe_tpu.ops.views import normalize_u8, weak_view_images

        raw = (rng.uniform(0, 255, size=(4, 16, 16, 3))).astype(np.uint8)
        key = jax.random.key(3)
        got = np.asarray(ulb_entropy_images({"img_raw": raw}, key))
        want = np.asarray(weak_view_images(key, jnp.asarray(raw)))
        np.testing.assert_allclose(got, want, atol=1e-5)
        plain = np.asarray(normalize_u8(jnp.asarray(raw)))
        assert np.abs(got - plain).max() > 1e-3  # not the raw crop
        # Host-view batches pass through untouched.
        b = {"img": plain, "img_raw": raw}
        np.testing.assert_array_equal(
            np.asarray(ulb_entropy_images(b, key)), plain)


class TestSSLSharded:
    def test_ssl_losses_match_single_device(self, net, rng):
        """SSL step (teacher BN stats, masked CE, on-device augs with the
        same rng) must produce identical losses sharded vs unsharded."""
        mesh = make_mesh()
        mk = lambda: steps_mod.make_ssl_step(
            net, lr=1e-3, rotate_aug=True, cutout_aug=True, cutmix_aug=True,
            stage1_iteration=0)
        s1 = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        s2 = create_train_state(net, jax.random.key(0), (16, 16, 3), lr=1e-3)
        batch = _make_batch(rng, 16)
        ulb = _make_ulb_batch(rng, 32)

        plain = jax.jit(mk())
        sharded = jit_step(mk(), mesh, n_batch_args=2, n_scalar_args=3,
                           donate_state=False)
        s2 = replicate(mesh, s2)
        for i in range(2):
            key = jax.random.key(i)
            thr, lam = jnp.float32(0.0), jnp.float32(1.0)
            s1, m1 = plain(s1, batch, ulb, key, thr, lam)
            s2, m2 = sharded(s2, shard_batch(mesh, batch),
                             shard_batch(mesh, ulb), key, thr, lam)
            for k in ("loss", "unsuper_loss", "mask_ratio", "entropy_mean"):
                np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                           rtol=5e-4, atol=1e-6)


class TestDeviceViews:
    def test_ssl_step_with_raw_ulb(self, net, state, rng):
        """SSL step consuming raw uint8 unlabeled crops (device_views)."""
        step = jax.jit(steps_mod.make_ssl_step(
            net, lr=1e-3, rotate_aug=True, cutout_aug=True, cutmix_aug=True,
            stage1_iteration=0, device_views=True))
        batch = _make_batch(rng, 8)
        raw = (np.clip(rng.normal(size=(16, 16, 16, 3)) * 40 + 128, 0, 255)
               ).astype(np.uint8)
        ulb = {"img_raw": jnp.asarray(raw),
               "rot_mat": jnp.asarray(random_rotations(rng, 16))}
        state, m = step(state, batch, ulb, jax.random.key(0),
                        jnp.float32(0.0), jnp.float32(1.0))
        for k in ("loss", "unsuper_loss", "loss_all", "entropy_mean",
                  "err_weakAll_gt"):
            assert np.isfinite(float(m[k])), k
        assert 0.0 <= float(m["mask_ratio"]) <= 1.0


class TestFusedToggleParity:
    def test_fused_and_unfused_steps_match(self, net, state, rng, monkeypatch):
        """The SEMIUHPE_NO_FUSED=1 escape hatch and the default fused path
        must produce identical step results (same rng, same batch)."""
        batch = _make_batch(rng, 4)
        ulb = _make_ulb_batch(rng, 8)
        key = jax.random.key(7)

        def run(no_fused):
            if no_fused:
                monkeypatch.setenv("SEMIUHPE_NO_FUSED", "1")
            else:
                monkeypatch.delenv("SEMIUHPE_NO_FUSED", raising=False)
            step = steps_mod.make_ssl_step(
                net, lr=1e-3, rotate_aug=True, cutout_aug=True,
                cutmix_aug=True, stage1_iteration=0, with_diagnostics=True)
            new_state, metrics = step(state, batch, ulb, key,
                                      jnp.float32(0.0), jnp.float32(1.0))
            return new_state, {k: float(v) for k, v in metrics.items()}

        s_fused, m_fused = run(False)
        s_plain, m_plain = run(True)
        for k in m_plain:
            np.testing.assert_allclose(m_fused[k], m_plain[k], rtol=2e-4,
                                       atol=2e-4, err_msg=k)
        # NOTE: post-Adam params are NOT compared — gradient components that
        # are ~0 flip sign under fp32 reassociation and Adam amplifies any
        # sign flip to +/-lr.  Gradient-level equivalence of the fused loss
        # is covered by TestFusedSSLPaths in test_fisher.py.
        del s_fused, s_plain


class TestFlatOptimizer:
    def test_flat_adam_matches_tree_adam(self, net, rng):
        """optax.flatten-wrapped Adam (multi-tensor-apply style single-vector
        update) must produce identical updates and honor the runtime LR."""
        import optax
        from semiuhpe_tpu.training.state import make_optimizer

        state = jax.jit(lambda k: create_train_state(
            net, k, (16, 16, 3), 1e-3))(jax.random.key(0))
        g = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1,
                                   state.params)
        tx_tree = make_optimizer(1e-3, flat=False)
        tx_flat = make_optimizer(1e-3, flat=True)
        up_t, _ = tx_tree.update(g, tx_tree.init(state.params), state.params)
        s_flat = tx_flat.init(state.params)
        up_f, s_flat2 = tx_flat.update(g, s_flat, state.params)
        for a, b in zip(jax.tree_util.tree_leaves(up_t),
                        jax.tree_util.tree_leaves(up_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # Runtime LR adjustment still works through inject_hyperparams.
        s_flat2.hyperparams["learning_rate"] = jnp.float32(1e-4)
        up_f2, _ = tx_flat.update(g, s_flat2, state.params)
        leaf = jnp.abs(jax.tree_util.tree_leaves(up_f2)[0]).max()
        assert float(leaf) < 1.2e-4

    def test_fused_adam_matches_optax(self, net, rng, monkeypatch):
        """SEMIUHPE_FUSED_ADAM single-pass Adam (apply_optimizer) must match
        the optax chain bit-for-bit-ish over multiple steps, including a
        runtime LR change, and keep the opt_state layout identical."""
        from semiuhpe_tpu.training.state import apply_optimizer, make_optimizer

        state = jax.jit(lambda k: create_train_state(
            net, k, (16, 16, 3), 1e-3))(jax.random.key(0))
        tx = make_optimizer(1e-3)
        p_a = p_b = state.params
        s_a = s_b = tx.init(state.params)
        for i in range(3):
            if i == 2:  # stage-boundary x0.1 LR drop, train.py:104-109
                s_a.hyperparams["learning_rate"] = jnp.float32(1e-4)
                s_b.hyperparams["learning_rate"] = jnp.float32(1e-4)
            g = jax.tree_util.tree_map(
                lambda p: (0.1 + 0.01 * i) * jnp.sign(p) + 0.03, p_a)
            monkeypatch.delenv("SEMIUHPE_FUSED_ADAM", raising=False)
            p_a, s_a = apply_optimizer(tx, g, s_a, p_a)
            monkeypatch.setenv("SEMIUHPE_FUSED_ADAM", "1")
            p_b, s_b = apply_optimizer(tx, g, s_b, p_b)
            assert (jax.tree_util.tree_structure(s_a)
                    == jax.tree_util.tree_structure(s_b))
            for a, b in zip(jax.tree_util.tree_leaves((p_a, s_a)),
                            jax.tree_util.tree_leaves((p_b, s_b))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-6, atol=1e-7)
