"""Space-to-depth execution (ops/s2d.py): exactness vs the plain path.

The s2d rewrite is a pure execution-layout change — same parameters, same
multiply-accumulate sets — so every test here demands numerical equality
(up to float32 summation-order noise) against the standard NHWC path.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiuhpe_tpu.models.layers import BatchNormS2D, ConvBN
from semiuhpe_tpu.ops.s2d import (
    depth_to_space,
    s2d_batch_stats,
    s2d_conv,
    space_to_depth,
)


def _conv_ref(x, w, stride):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestS2DTransform:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)),
                        jnp.float32)
        np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)

    def test_phase_major_packing(self):
        # channel index = (a*2+b)*C + c for pixel phase (a, b)
        x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
        y = space_to_depth(x)
        assert y.shape == (1, 2, 2, 8)
        np.testing.assert_array_equal(y[0, 0, 0, 0:2], x[0, 0, 0, :])   # (0,0)
        np.testing.assert_array_equal(y[0, 0, 0, 2:4], x[0, 0, 1, :])   # (0,1)
        np.testing.assert_array_equal(y[0, 0, 0, 4:6], x[0, 1, 0, :])   # (1,0)
        np.testing.assert_array_equal(y[0, 0, 0, 6:8], x[0, 1, 1, :])   # (1,1)


class TestS2DConv:
    @pytest.mark.parametrize("k,stride,cin,cout,four_phase", [
        (3, 1, 5, 7, False),
        (3, 1, 5, 7, True),
        (3, 2, 5, 7, False),
        (3, 2, 5, 7, True),
        (1, 1, 6, 4, None),
    ])
    def test_matches_plain_conv(self, k, stride, cin, cout, four_phase):
        rng = np.random.default_rng(k * 100 + stride * 10 + cin)
        x = jnp.asarray(rng.normal(size=(2, 12, 16, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.float32)
        ref = _conv_ref(x, w, stride)
        out = s2d_conv(space_to_depth(x), w, stride, four_phase=four_phase)
        np.testing.assert_allclose(depth_to_space(out), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_auto_selects_four_phase_for_wide_outputs(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 128)), jnp.float32)
        out = s2d_conv(space_to_depth(x), w, 1)  # four_phase auto=True
        np.testing.assert_allclose(depth_to_space(out), _conv_ref(x, w, 1),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 5, 9)), jnp.float32)

        def loss_plain(w_):
            return jnp.sum(jnp.tanh(_conv_ref(x, w_, 1)))

        def loss_s2d(w_):
            return jnp.sum(jnp.tanh(depth_to_space(
                s2d_conv(space_to_depth(x), w_, 1, four_phase=True))))

        g1 = jax.grad(loss_plain)(w)
        g2 = jax.grad(loss_s2d)(w)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


class TestS2DBatchNorm:
    def test_stats_match_plain(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 6)) * 3 + 1, jnp.float32)
        m, s = s2d_batch_stats(space_to_depth(x))
        np.testing.assert_allclose(m, jnp.mean(x, axis=(0, 1, 2)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(s - m ** 2, jnp.var(x, axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("train", [True, False])
    def test_module_matches_flax_bn(self, train):
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 6)) * 2 - 1, jnp.float32)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-3)
        v = bn.init(jax.random.key(0), x)
        # non-trivial scale/bias/running stats
        v = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                np.abs(np.random.default_rng(5).normal(size=a.shape)) * 0.3,
                a.dtype), v)
        s2d_bn = BatchNormS2D(momentum=0.9, epsilon=1e-3)
        if train:
            ref, mut = bn.apply(v, x, mutable=["batch_stats"])
            out, mut2 = s2d_bn.apply(v, space_to_depth(x), False,
                                     mutable=["batch_stats"])
            for key in ("mean", "var"):
                np.testing.assert_allclose(
                    mut["batch_stats"][key], mut2["batch_stats"][key],
                    rtol=1e-4, atol=1e-5)
        else:
            ref = bn.apply(v, x)
            out = s2d_bn.apply(v, space_to_depth(x), True)
        np.testing.assert_allclose(depth_to_space(out), ref,
                                   rtol=1e-4, atol=1e-4)


class TestConvBNS2D:
    @pytest.mark.parametrize("train", [True, False])
    def test_convbn_matches(self, train):
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
        plain = ConvBN(12, 3, 2, activation=nn.silu, bn_eps=1e-3)
        lifted = ConvBN(12, 3, 2, activation=nn.silu, bn_eps=1e-3, s2d=True)
        v = plain.init(jax.random.key(1), x, train=False)
        v2 = lifted.init(jax.random.key(1), space_to_depth(x), train=False)
        # identical parameter trees (names, shapes) -> checkpoint compatible
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        for a, b in zip(jax.tree_util.tree_leaves(v),
                        jax.tree_util.tree_leaves(v2)):
            assert a.shape == b.shape
        kwargs = dict(mutable=["batch_stats"]) if train else {}
        ref = plain.apply(v, x, train=train, **kwargs)
        out = lifted.apply(v, space_to_depth(x), train=train, **kwargs)
        if train:
            ref, out = ref[0], out[0]
        np.testing.assert_allclose(depth_to_space(out), ref,
                                   rtol=1e-4, atol=1e-4)


class TestEffNetV2S2D:
    def _build(self, s2d_stages):
        from semiuhpe_tpu.models.efficientnetv2 import EfficientNetV2

        return EfficientNetV2(variant="s", s2d_stages=s2d_stages,
                              drop_path_rate=0.0)

    def test_model_equivalence(self):
        """Same params, s2d execution on/off: same outputs + batch stats."""
        rng = np.random.default_rng(23)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        base, s2d = self._build(0), self._build(3)
        v = jax.jit(lambda: base.init({"params": jax.random.key(0)}, x,
                                      train=False))()
        v2 = jax.jit(lambda: s2d.init({"params": jax.random.key(0)}, x,
                                      train=False))()
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

        out_b = base.apply(v, x, train=False)
        out_s = s2d.apply(v, x, train=False)
        np.testing.assert_allclose(out_s, out_b, rtol=1e-3, atol=1e-3)

        (out_b, mut_b) = base.apply(v, x, train=True,
                                    rngs={"dropout": jax.random.key(1)},
                                    mutable=["batch_stats"])
        (out_s, mut_s) = s2d.apply(v, x, train=True,
                                   rngs={"dropout": jax.random.key(1)},
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(out_s, out_b, rtol=1e-3, atol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(mut_b["batch_stats"]),
                        jax.tree_util.tree_leaves(mut_s["batch_stats"])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_gradient_equivalence(self):
        rng = np.random.default_rng(29)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        base, s2d = self._build(0), self._build(3)
        v = jax.jit(lambda: base.init({"params": jax.random.key(0)}, x,
                                      train=False))()

        def loss(params, model):
            out = model.apply({"params": params,
                               "batch_stats": v["batch_stats"]},
                              x, train=False)
            return jnp.mean(out ** 2)

        g_b = jax.grad(loss)(v["params"], base)
        g_s = jax.grad(loss)(v["params"], s2d)
        flat_b = jax.tree_util.tree_leaves_with_path(g_b)
        flat_s = jax.tree_util.tree_leaves(g_s)
        for (path, a), b in zip(flat_b, flat_s):
            scale = max(1e-3, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=5e-3 * scale,
                err_msg=jax.tree_util.keystr(path))

    def test_odd_size_falls_back(self):
        # 40 % 16 != 0 -> s2d disabled internally, still runs
        x = jnp.zeros((1, 40, 40, 3), jnp.float32)
        m = self._build(3)
        v = jax.jit(lambda: m.init({"params": jax.random.key(0)}, x,
                                   train=False))()
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 9)
