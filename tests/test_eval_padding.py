"""evaluate() must be exact on test sets not divisible by the batch size
(VERDICT round-1 weak item 5: loss/mask_ratio were averaged over padded
rows, biasing the numbers that pick the best checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.cli.train import evaluate
from semiuhpe_tpu.data.datasets.base import SyntheticHeadPose
from semiuhpe_tpu.data.loader import Loader
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.parallel import make_mesh, replicate
from semiuhpe_tpu.training import steps as steps_mod
from semiuhpe_tpu.training.state import create_train_state


def _metrics(batch_size, n=10, size=32):
    mesh = make_mesh(jax.devices()[:1])
    net = build_network("tiny", dtype=jnp.float32)
    state = jax.jit(lambda k: create_train_state(net, k, (size, size, 3),
                                                 1e-4))(jax.random.key(0))
    state = replicate(mesh, state)
    eval_step = jax.jit(steps_mod.make_eval_step(net))
    ds = SyntheticHeadPose(n=n, size=size, seed=1)
    loader = Loader(ds, batch_size, shuffle=False, drop_last=False,
                    num_workers=1)
    return evaluate(eval_step, state, loader, mesh, conf_thres=0.0,
                    batch_size=batch_size)


def test_evaluate_padding_exact():
    """10 samples at batch 8 (2 rows padded) must equal batch 10 (no
    padding) on every aggregate, not just err."""
    a = _metrics(8)
    b = _metrics(10)
    np.testing.assert_allclose(a[0], b[0], rtol=2e-5)  # loss
    np.testing.assert_allclose(a[1], b[1], rtol=2e-5)  # err_mean
    np.testing.assert_allclose(a[2], b[2], rtol=2e-5)  # mask_ratio
    np.testing.assert_allclose(a[3], b[3], rtol=2e-5)  # err_pseudo_gt
