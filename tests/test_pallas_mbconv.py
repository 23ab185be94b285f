"""Fused MBConv-middle Pallas kernels (ops/pallas_mbconv.py) vs the
unfused jnp chain: forward and every gradient, train and eval mode,
f32 and bf16.  Runs in interpret mode on the CPU test mesh.

Reference behavior accelerated: the BN+silu+dw3x3+BN+silu+SE middle of
torchvision-style MBConv blocks (models/layers.py MBConv, mirroring
/root/reference/src/networks.py:301-319 via efficientnet_v2_s).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from semiuhpe_tpu.ops import pallas_mbconv as pm

EPS = 1e-3
MOM = 0.9


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _make_inputs(B=8, H=7, W=7, C=32, CSE=8, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    h_raw = jnp.asarray(rng.randn(B, H, W, C), dtype)
    dw_w = jnp.asarray(0.3 * rng.randn(3, 3, 1, C), dtype)
    bn1 = {k: jnp.asarray(v, jnp.float32) for k, v in dict(
        scale=1 + 0.1 * rng.randn(C), bias=0.1 * rng.randn(C),
        mean=0.05 * rng.randn(C), var=1 + 0.1 * rng.rand(C)).items()}
    bn2 = {k: jnp.asarray(v, jnp.float32) for k, v in dict(
        scale=1 + 0.1 * rng.randn(C), bias=0.1 * rng.randn(C),
        mean=0.05 * rng.randn(C), var=1 + 0.1 * rng.rand(C)).items()}
    se = (jnp.asarray(0.3 * rng.randn(C, CSE), dtype),
          jnp.asarray(0.1 * rng.randn(CSE), jnp.float32),
          jnp.asarray(0.3 * rng.randn(CSE, C), dtype),
          jnp.asarray(0.1 * rng.randn(C), jnp.float32))
    return h_raw, dw_w, bn1, bn2, se


def _unfused(h_raw, dw_w, bn1, bn2, se, train):
    """Pure-jnp twin of the fused middle (same fast-variance stats)."""
    w1, c1, w2, c2 = se
    c = h_raw.shape[-1]
    hf = h_raw.astype(jnp.float32)
    if train:
        m1 = jnp.mean(hf, axis=(0, 1, 2))
        v1 = jnp.mean(jnp.square(hf), axis=(0, 1, 2)) - jnp.square(m1)
    else:
        m1, v1 = bn1["mean"], bn1["var"]
    a1, b1 = pm.bn_coeffs(bn1["scale"], bn1["bias"], m1, v1, EPS)
    dt = h_raw.dtype
    t = jax.nn.silu(h_raw * a1.astype(dt) + b1.astype(dt))
    d_raw = jax.lax.conv_general_dilated(
        t.astype(jnp.float32), dw_w.astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c).astype(dt)
    df = d_raw.astype(jnp.float32)
    if train:
        m2 = jnp.mean(df, axis=(0, 1, 2))
        v2 = jnp.mean(jnp.square(df), axis=(0, 1, 2)) - jnp.square(m2)
    else:
        m2, v2 = bn2["mean"], bn2["var"]
    a2, b2 = pm.bn_coeffs(bn2["scale"], bn2["bias"], m2, v2, EPS)
    d = jax.nn.silu(d_raw * a2.astype(dt) + b2.astype(dt))
    p = jnp.mean(d.astype(jnp.float32), axis=(1, 2))
    q1 = jnp.dot(p.astype(dt), w1).astype(jnp.float32) + c1
    q2 = jnp.dot(jax.nn.silu(q1).astype(dt), w2).astype(jnp.float32) + c2
    v = jax.nn.sigmoid(q2)
    return d * v[:, None, None, :].astype(dt)


def _fused(h_raw, dw_w, bn1, bn2, se, train):
    s, _, _ = pm.mbconv_middle(h_raw, dw_w, bn1, bn2, se, train=train,
                               eps=EPS, momentum=MOM)
    return s


@pytest.mark.parametrize("train", [True, False])
def test_forward_matches_unfused(train):
    h_raw, dw_w, bn1, bn2, se = _make_inputs()
    a = _unfused(h_raw, dw_w, bn1, bn2, se, train)
    b = _fused(h_raw, dw_w, bn1, bn2, se, train)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("train", [True, False])
def test_gradients_match_unfused(train):
    h_raw, dw_w, bn1, bn2, se = _make_inputs()
    w1, c1, w2, c2 = se

    def pack(args):
        h, w, b1s, b1b, b2s, b2b, w1_, c1_, w2_, c2_ = args
        return (h, w, dict(bn1, scale=b1s, bias=b1b),
                dict(bn2, scale=b2s, bias=b2b), (w1_, c1_, w2_, c2_))

    def loss_u(args):
        out = _unfused(*pack(args), train)
        return jnp.sum(jnp.sin(out))

    def loss_f(args):
        out = _fused(*pack(args), train)
        return jnp.sum(jnp.sin(out))

    args = (h_raw, dw_w, bn1["scale"], bn1["bias"], bn2["scale"],
            bn2["bias"], w1, c1, w2, c2)
    gu = jax.grad(loss_u)(args)
    gf = jax.grad(loss_f)(args)
    names = ["h", "dw_w", "bn1.scale", "bn1.bias", "bn2.scale", "bn2.bias",
             "se.w1", "se.c1", "se.w2", "se.c2"]
    for n, a, b in zip(names, gu, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 5e-4, f"{n}: rel err {err}"


def test_running_stat_update():
    h_raw, dw_w, bn1, bn2, se = _make_inputs()
    _, (m1, v1), (m2, v2) = pm.mbconv_middle(
        h_raw, dw_w, bn1, bn2, se, train=True, eps=EPS, momentum=MOM)
    hf = h_raw.astype(jnp.float32)
    bm1 = jnp.mean(hf, axis=(0, 1, 2))
    bv1 = jnp.mean(jnp.square(hf), axis=(0, 1, 2)) - jnp.square(bm1)
    np.testing.assert_allclose(np.asarray(m1),
                               np.asarray(MOM * bn1["mean"]
                                          + (1 - MOM) * bm1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v1),
                               np.asarray(MOM * bn1["var"]
                                          + (1 - MOM) * bv1), rtol=1e-5)
    # eval mode: runnings pass through unchanged
    _, (em1, ev1), _ = pm.mbconv_middle(
        h_raw, dw_w, bn1, bn2, se, train=False, eps=EPS, momentum=MOM)
    np.testing.assert_array_equal(np.asarray(em1), np.asarray(bn1["mean"]))


def test_bfloat16_forward():
    h_raw, dw_w, bn1, bn2, se = _make_inputs(dtype=jnp.bfloat16)
    a = _unfused(h_raw, dw_w, bn1, bn2, se, True).astype(jnp.float32)
    b = _fused(h_raw, dw_w, bn1, bn2, se, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-2, rtol=5e-2)


class TestMBConvIntegration:
    """models/layers.py MBConv: the pallas=True path must be
    variable-tree-identical to pallas=False and agree numerically."""

    def _build(self, pallas, dtype=jnp.float32):
        from semiuhpe_tpu.models.layers import MBConv
        return MBConv(features=16, expand_ratio=4, kernel_size=3,
                      strides=1, se_ratio=0.25, drop_rate=0.0,
                      dtype=dtype, bn_eps=EPS, pallas=pallas)

    def _init(self, mod):
        x = jnp.zeros((8, 8, 8, 16), jnp.float32)
        return mod.init({"params": jax.random.key(0)}, x, train=True)

    def test_variable_trees_identical(self):
        va = self._init(self._build(False))
        vb = self._init(self._build(True))
        ta = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), va)
        tb = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vb)
        assert jax.tree_util.tree_structure(ta) == \
            jax.tree_util.tree_structure(tb)
        assert ta == tb
        # same init values too (same names -> same fold-in RNG streams)
        for pa, pb in zip(jax.tree_util.tree_leaves(va),
                          jax.tree_util.tree_leaves(vb)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    @pytest.mark.parametrize("train", [True, False])
    def test_outputs_and_stats_match(self, train):
        variables = self._init(self._build(False))
        x = jnp.asarray(np.random.RandomState(1).randn(8, 8, 8, 16),
                        jnp.float32)
        outs = {}
        for pallas in (False, True):
            mod = self._build(pallas)
            y, mut = mod.apply(variables, x, train=train,
                               mutable=["batch_stats"])
            outs[pallas] = (y, mut["batch_stats"])
        np.testing.assert_allclose(np.asarray(outs[False][0]),
                                   np.asarray(outs[True][0]),
                                   atol=2e-5, rtol=2e-5)
        sa = jax.tree_util.tree_leaves(outs[False][1])
        sb = jax.tree_util.tree_leaves(outs[True][1])
        for a, b in zip(sa, sb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_param_gradients_match(self):
        variables = self._init(self._build(False))
        x = jnp.asarray(np.random.RandomState(2).randn(8, 8, 8, 16),
                        jnp.float32)

        def loss(params, pallas):
            mod = self._build(pallas)
            y, _ = mod.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        ga = jax.grad(loss)(variables["params"], False)
        gb = jax.grad(loss)(variables["params"], True)
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
        for path, a in flat_a:
            b = flat_b[path]
            scale = float(jnp.max(jnp.abs(a))) + 1e-8
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-3, f"{jax.tree_util.keystr(path)}: {err}"

    def test_stride2_falls_back(self):
        """Unsupported configs must silently use the unfused path."""
        from semiuhpe_tpu.models.layers import MBConv
        mod = MBConv(features=16, expand_ratio=4, strides=2,
                     se_ratio=0.25, dtype=jnp.float32, pallas=True)
        x = jnp.zeros((8, 8, 8, 16), jnp.float32)
        v = mod.init({"params": jax.random.key(0)}, x, train=True)
        y = mod.apply(v, x, train=False)
        assert y.shape == (8, 4, 4, 16)


def test_supported_predicate():
    assert pm.fused_middle_supported((8, 14, 14, 960), 1, True, 3)
    assert not pm.fused_middle_supported((8, 14, 14, 960), 2, True, 3)
    assert not pm.fused_middle_supported((8, 14, 14, 960), 1, False, 3)
    assert not pm.fused_middle_supported((8, 14, 14, 960), 1, True, 5)
    assert not pm.fused_middle_supported((7, 14, 14, 961), 1, True, 3)
