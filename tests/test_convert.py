"""Weight-conversion tests: torch module -> flax module output equivalence."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semiuhpe_tpu.models.convert import convert_state_dict  # noqa: E402


class FlaxBlock(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(4)(x)
        return x


def make_torch_block():
    return torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, 2, 1, bias=False),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 16, 3, 2, 1, bias=False),
        torch.nn.BatchNorm2d(16),
        torch.nn.ReLU(),
        torch.nn.AdaptiveAvgPool2d(1),
        torch.nn.Flatten(),
        torch.nn.Linear(16, 4),
    )


def test_converted_weights_reproduce_torch_outputs():
    tnet = make_torch_block()
    tnet.eval()
    # Randomize BN stats so the eval path actually uses them.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    fnet = FlaxBlock()
    template = fnet.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 16, 16, 3)), train=False)
    variables = convert_state_dict(template, tnet.state_dict())

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    f_out = np.asarray(fnet.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_shape_mismatch_raises():
    tnet = make_torch_block()
    fnet = FlaxBlock()
    template = fnet.init({"params": jax.random.key(0)},
                         jnp.zeros((1, 16, 16, 3)), train=False)
    sd = tnet.state_dict()
    bad = {k: (torch.zeros(5, 5) if i == 0 else v)
           for i, (k, v) in enumerate(sd.items())}
    with pytest.raises(ValueError):
        convert_state_dict(template, bad)


def test_npz_variables_roundtrip(tmp_path):
    """Detector variables can be stored/loaded as npz (pre-converted form)."""
    import jax
    from semiuhpe_tpu.detect import yolov5_bpjdet
    from semiuhpe_tpu.detect.convert import load_bpjdet_weights, save_variables_npz

    model = yolov5_bpjdet("s6")
    v = model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 128, 128, 3)), train=False)
    path = str(tmp_path / "det.npz")
    save_variables_npz(v, path)
    v2 = load_bpjdet_weights(model, path)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
