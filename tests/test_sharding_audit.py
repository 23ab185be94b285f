"""Sharding-leak audit of the compiled multi-chip SSL step.

The step is a global-view pjit program (no axis_name; XLA inserts the
collectives — CLAUDE.md design invariant).  On the 8-device mesh its
cross-device traffic must therefore be exactly:

* all-reduces of parameter-gradient / BN-batch-stat / scalar-metric
  size (each bounded by the largest parameter tensor),
* with CutMix on: data movement for the reference-faithful global
  ``randperm`` donor shuffle (/root/reference/src/augments.py:67-94
  semantics), bounded by the unlabeled image batch itself, and
* NOTHING ELSE — a bigger gathered intermediate is the classic
  sharding leak where the SPMD partitioner silently replicates an
  activation, turning data parallelism into all-to-all traffic.

Reference context: the reference is single-GPU (SURVEY §2.10,
/root/reference/src/agent.py:63); this audit is the TPU-native
guarantee that the DP design actually stays data-parallel after XLA's
SPMD partitioner runs.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.parallel import jit_step, make_mesh, replicate, shard_batch
from semiuhpe_tpu.training import steps as steps_mod
from semiuhpe_tpu.training.state import create_train_state
from tests.test_training import TinyNet, _make_batch, _make_ulb_batch

N_LB, N_ULB, SIZE = 16, 32, 16

# HLO collective ops with their (first) result shape, e.g.
#   %all-gather.3 = f32[32,16,16,24]{...} all-gather(...)
_COLLECTIVE_RE = re.compile(
    r"= \(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
    r"(all-gather|all-to-all|reduce-scatter|collective-permute)\(")
_ALLREDUCE_RE = re.compile(r"= \(?([a-z0-9]+)\[([0-9,]*)\][^=]*?all-reduce\(")


def _elements(dims: str) -> int:
    if not dims:
        return 1
    return int(np.prod([int(d) for d in dims.split(",")]))


def _compiled_ssl_step(cutmix: bool):
    mesh = make_mesh()
    net = TinyNet()
    state = create_train_state(net, jax.random.key(0), (SIZE, SIZE, 3),
                               lr=1e-3)
    state = replicate(mesh, state)
    step = jit_step(
        steps_mod.make_ssl_step(net, lr=1e-3, rotate_aug=True,
                                cutout_aug=True, cutmix_aug=cutmix,
                                stage1_iteration=0),
        mesh, n_batch_args=2, n_scalar_args=3, donate_state=False)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, _make_batch(rng, N_LB, SIZE))
    ulb = shard_batch(mesh, _make_ulb_batch(rng, N_ULB, SIZE))
    args = (state, batch, ulb, jax.random.key(0),
            jnp.float32(0.0), jnp.float32(1.0))
    compiled = step.lower(*args).compile()
    _, metrics = step(*args)
    assert np.isfinite(float(metrics["loss_all"]))
    return compiled.as_text(), state


def _param_bounds(state):
    leaves = jax.tree_util.tree_leaves(state.params)
    return (max(int(np.prod(p.shape)) for p in leaves),
            sum(int(np.prod(p.shape)) for p in leaves))


def test_no_activation_gathers_without_cutmix():
    """CutOut-only step: zero activation-scale gather traffic allowed."""
    hlo, state = _compiled_ssl_step(cutmix=False)
    max_param, _ = _param_bounds(state)
    offenders = [
        (m.group(3), m.group(1), m.group(2), _elements(m.group(2)))
        for m in _COLLECTIVE_RE.finditer(hlo)
        if _elements(m.group(2)) > max_param]
    assert not offenders, (
        f"activation-scale collectives leaked into the DP step "
        f"(max param tensor = {max_param} elements): {offenders}")


def test_cutmix_gather_is_bounded_by_ulb_batch():
    """Full step: the only activation-scale movement allowed is the
    CutMix donor shuffle, bounded by the unlabeled image batch."""
    hlo, state = _compiled_ssl_step(cutmix=True)
    max_param, _ = _param_bounds(state)
    ulb_img = N_ULB * SIZE * SIZE * 3
    offenders = []
    shuffles = 0
    for m in _COLLECTIVE_RE.finditer(hlo):
        n = _elements(m.group(2))
        if n <= max_param:
            continue
        if n <= ulb_img:
            shuffles += 1
        else:
            offenders.append((m.group(3), m.group(1), m.group(2), n))
    assert not offenders, (
        f"collectives larger than the CutMix donor batch ({ulb_img} "
        f"elements) leaked into the DP step: {offenders}")


def test_allreduce_traffic_is_gradient_sized():
    hlo, state = _compiled_ssl_step(cutmix=False)
    max_param, n_params = _param_bounds(state)
    n_stats = sum(int(np.prod(p.shape)) for p in
                  jax.tree_util.tree_leaves(state.batch_stats))
    sizes = [_elements(m.group(2)) for m in _ALLREDUCE_RE.finditer(hlo)]
    # grads (<= n_params) + student/teacher BN stats + metric scalars;
    # 4x covers partitioner bookkeeping.  Zero would mean the
    # partitioner replicated the whole computation (not data-parallel).
    assert sizes, "no all-reduce at all: step is not data-parallel"
    assert sum(sizes) <= 4 * (n_params + 4 * n_stats) + 4096, (
        f"all-reduce traffic {sum(sizes)} exceeds gradient-sized budget "
        f"(params={n_params}, stats={n_stats})")
    assert max(sizes) <= max_param, (
        f"largest all-reduce ({max(sizes)}) exceeds the largest "
        f"parameter tensor ({max_param}) — an activation is being summed")
