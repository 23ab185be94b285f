"""Training state: one pytree carrying student, EMA teacher and optimizer.

The reference holds two stateful nn.Modules plus a torch optimizer
(/root/reference/src/agent.py:28-37); here the whole training state is a
single immutable pytree so every step is a pure jit-compiled function and
checkpointing is trivial (orbax serializes the dataclass as-is).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32, global iteration (reference clock.iteration)
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any


def make_optimizer(lr: float, grad_clip: float = 0.0,
                   flat: bool | None = None) -> optax.GradientTransformation:
    """Adam with runtime-adjustable learning rate (the stage-2 x0.1 drop,
    /root/reference/train.py:104-109, happens without retracing); optional
    global-norm gradient clipping (off by default — the reference does not
    clip — but useful insurance against rare near-degenerate-SVD gradient
    spikes on the Fisher-CE path).

    ``flat=True`` wraps Adam in ``optax.flatten`` so its moment updates run
    on one contiguous vector instead of ~200 per-tensor ops (a
    multi-tensor-apply: tiny BN/bias tensors stop wasting VPU lanes and the
    whole update is a handful of 21M-element fused kernels).  Numerically
    identical for Adam (elementwise).  Changes the opt_state pytree layout,
    so checkpoints are only compatible with the same setting.  Default off;
    env ``SEMIUHPE_FLAT_OPT=1`` turns it on process-wide (bench A/Bs)."""
    if flat is None:
        import os
        flat = os.environ.get("SEMIUHPE_FLAT_OPT") == "1"

    def wrap(tx):
        return optax.flatten(tx) if flat else tx

    if grad_clip and grad_clip > 0:
        def factory(learning_rate):
            return wrap(optax.chain(optax.clip_by_global_norm(grad_clip),
                                    optax.adam(learning_rate)))
        return optax.inject_hyperparams(factory)(learning_rate=lr)

    def factory_adam(learning_rate):
        return wrap(optax.adam(learning_rate))

    return optax.inject_hyperparams(factory_adam)(learning_rate=lr)


def apply_optimizer(tx, grads, opt_state, params):
    """(new_params, new_opt_state) — one optimizer step.

    Default path: ``tx.update`` + ``optax.apply_updates`` (the reference's
    ``optimizer.step()``, /root/reference/src/agent.py:208-210).

    ``SEMIUHPE_FUSED_ADAM=1`` switches to a single-pass Adam: optax's
    chain (scale_by_adam's mu/nu tree_maps, two bias corrections, the -lr
    scale, apply_updates) walks the ~200-leaf tree ~7 times = ~1,400 HLO
    fusions whose per-op overhead is the measured +3.9 ms EMA+Adam tail
    (BENCH_NOTES component budget).  Here each leaf gets ONE fused
    elementwise kernel computing (mu', nu', p') together — 3 passes of
    HBM traffic instead of 7, one fusion per leaf instead of seven.
    Numerically identical to optax.adam (b1=.9, b2=.999, eps=1e-8,
    eps_root=0, bias correction by count+1); state layout unchanged, so
    checkpoints are compatible both ways.  NB the teacher-EMA update
    cannot join this kernel: the reference updates EMA *before* the
    forward (agent.py:199-200) and the teacher forward consumes it, so
    EMA' -> grads -> Adam is a dependency chain, not a fusion candidate.

    Only the plain-Adam layout (no grad_clip, no optax.flatten) is
    rewritten; any other opt_state structure falls back to ``tx.update``.
    """
    import os

    if os.environ.get("SEMIUHPE_FUSED_ADAM") == "1":
        try:
            adam_state, _scale = opt_state.inner_state
            count, mu, nu = (adam_state.count, adam_state.mu, adam_state.nu)
            lr = opt_state.hyperparams["learning_rate"]
            b1, b2, eps = 0.9, 0.999, 1e-8
            count1 = optax.safe_int32_increment(count)
            c1 = 1.0 - b1 ** count1.astype(jnp.float32)
            c2 = 1.0 - b2 ** count1.astype(jnp.float32)

            def leaf(p, g, m, v):
                m1 = b1 * m + (1.0 - b1) * g
                v1 = b2 * v + (1.0 - b2) * jnp.square(g)
                p1 = p - lr * (m1 / c1) / (jnp.sqrt(v1 / c2) + eps)
                return p1, m1, v1

            out = jax.tree_util.tree_map(leaf, params, grads, mu, nu)
            is_triple = lambda x: isinstance(x, tuple)
            p1, m1, v1 = (jax.tree_util.tree_map(
                lambda t, i=i: t[i], out, is_leaf=is_triple)
                for i in range(3))
            new_adam = adam_state._replace(count=count1, mu=m1, nu=v1)
            kw = {}
            if hasattr(opt_state, "count"):  # inject_hyperparams' own count
                kw["count"] = optax.safe_int32_increment(opt_state.count)
            new_opt_state = opt_state._replace(
                inner_state=(new_adam, _scale), **kw)
            return p1, new_opt_state
        except (AttributeError, TypeError, ValueError, KeyError):
            pass  # unexpected layout (clip/flatten) -> optax path
    updates, new_opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def create_train_state(net, rng, input_shape, lr: float, dtype=jnp.float32) -> TrainState:
    """Initialize student + teacher (independent inits, like two get_network
    calls in the reference) and the optimizer."""

    def init_one(key):
        return net.init({"params": key},
                        jnp.zeros((1,) + tuple(input_shape), dtype), train=False)

    k1, k2 = jax.random.split(rng)
    v_student = init_one(k1)
    v_teacher = init_one(k2)
    tx = make_optimizer(lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=v_student["params"],
        batch_stats=v_student.get("batch_stats", {}),
        ema_params=v_teacher["params"],
        ema_batch_stats=v_teacher.get("batch_stats", {}),
        opt_state=tx.init(v_student["params"]),
    )
