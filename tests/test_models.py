"""Backbone zoo tests: shapes, parameter counts vs published sizes,
train/eval modes, RepVGG reparameterization equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiuhpe_tpu.models import build_network


def _init_and_forward(name, batch=2, size=64, train=True):
    net = build_network(name)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = net.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                         x, train=False)
    out, mutated = net.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(2)} if train else {},
        mutable=["batch_stats"] if train else [],
    ) if train else (net.apply(variables, x, train=False), None)
    return net, variables, out


def _n_params(variables):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))


@pytest.mark.parametrize("name", ["mobilenet", "resnet18", "resnet50", "effinetv2"])
def test_forward_shapes(name):
    _, variables, out = _init_and_forward(name, batch=2, size=64, train=True)
    assert out.shape == (2, 9)
    assert out.dtype == jnp.float32


def test_eval_mode_deterministic():
    net = build_network("resnet18")
    x = jnp.ones((2, 64, 64, 3))
    v = net.init({"params": jax.random.key(0)}, x, train=False)
    o1 = net.apply(v, x, train=False)
    o2 = net.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_param_counts_close_to_published():
    """Backbone sizes should land near the published model sizes
    (SURVEY.md §6: EffNetV2-S 21.5M, ResNet50 25.6M) plus the small head."""
    cases = {"resnet50": (23.5e6, 28.5e6), "effinetv2": (19.5e6, 23.5e6)}
    for name, (lo, hi) in cases.items():
        net = build_network(name)
        v = net.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
        n = _n_params(v)
        assert lo < n < hi, f"{name}: {n/1e6:.1f}M params out of range"


def test_tinyvit_forward_and_size():
    net = build_network("tinyvit")
    x = jnp.zeros((1, 224, 224, 3))
    v = net.init({"params": jax.random.key(0)}, x, train=False)
    out = net.apply(v, x, train=False)
    assert out.shape == (1, 9)
    n = _n_params(v)
    assert 19e6 < n < 23e6, f"tinyvit: {n/1e6:.1f}M"


def test_gelu_mode(monkeypatch):
    """TinyViT GELU policy: exact erf for fp32 (torch-parity paths), tanh
    approximation for bfloat16 compute (perf; scripts/s1_decompose.py),
    SEMIUHPE_GELU=erf|tanh overriding either way — and the approximation
    error must stay below the documented 5e-4 bound, i.e. under the ~2e-3
    rounding noise bf16 itself adds to unit-scale activations."""
    import flax.linen as nn

    from semiuhpe_tpu.models.tinyvit import _gelu

    x32 = jnp.linspace(-8.0, 8.0, 4097, dtype=jnp.float32)
    erf = nn.gelu(x32, approximate=False)
    tanh = nn.gelu(x32, approximate=True)
    assert float(jnp.max(jnp.abs(erf - tanh))) < 5e-4

    monkeypatch.delenv("SEMIUHPE_GELU", raising=False)
    np.testing.assert_array_equal(np.asarray(_gelu(x32)), np.asarray(erf))
    x16 = x32.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(_gelu(x16), np.float32),
        np.asarray(nn.gelu(x16, approximate=True), np.float32))

    monkeypatch.setenv("SEMIUHPE_GELU", "erf")
    np.testing.assert_array_equal(
        np.asarray(_gelu(x16), np.float32),
        np.asarray(nn.gelu(x16, approximate=False), np.float32))
    monkeypatch.setenv("SEMIUHPE_GELU", "tanh")
    np.testing.assert_array_equal(np.asarray(_gelu(x32)), np.asarray(tanh))


def test_repvgg_forward_and_size():
    net = build_network("repvgg")
    x = jnp.zeros((1, 64, 64, 3))
    v = net.init({"params": jax.random.key(0)}, x, train=False)
    out = net.apply(v, x, train=False)
    assert out.shape == (1, 9)
    n = _n_params(v)
    # RepVGG-B1g2 train-time: ~45M (41.4M deploy + extra branches) + head.
    assert 38e6 < n < 52e6, f"repvgg: {n/1e6:.1f}M"


def test_repvgg_reparameterization_equivalence(rng):
    """Deploy-mode fused conv must reproduce train-branch eval outputs."""
    from semiuhpe_tpu.models.repvgg import RepVGG, reparameterize_params

    net = RepVGG(widths=(16, 16, 32), depths=(1, 2, 2), head_hidden=(16,))
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = net.init({"params": jax.random.key(0)}, x, train=False)
    # Give batch stats / params non-trivial values.
    v = jax.tree_util.tree_map(
        lambda p: p + 0.05 * np.random.default_rng(3).normal(size=p.shape).astype(p.dtype), v
    )
    ref = net.apply(v, x, train=False)

    deploy_net = RepVGG(widths=(16, 16, 32), depths=(1, 2, 2), head_hidden=(16,),
                        deploy=True)
    deploy_params = reparameterize_params(v["params"], v["batch_stats"])
    deploy_stats = {k: s for k, s in v["batch_stats"].items()
                    if not k.startswith("RepVGGBlock")}
    out = deploy_net.apply({"params": deploy_params, "batch_stats": deploy_stats},
                           x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
