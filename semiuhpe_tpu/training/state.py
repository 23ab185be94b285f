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
