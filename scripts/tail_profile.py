#!/usr/bin/env python
"""Decompose the SSL step's non-conv tail by timing ablated step variants.

Each variant is timed exactly like bench.py (device-side lax.scan over
chained steps, value-fetch sync — the only real sync through the axon
relay).  Differences between variants attribute the ms budget:

  convfloor   teacher fwd + student fwd/bwd on an L2 loss, SGD, no augs,
              no EMA — the pure conv/matmul floor of the step
  +fisher     swap L2 -> full fused Fisher NLL + CE loss math
  +emaadam    add EMA teacher update + Adam (optax inject_hyperparams)
  full        make_ssl_step as the trainer runs it (bench.py parity)

Run on a QUIET TPU (relay has ~2x spread under load).  Usage:
  python scripts/tail_profile.py [convfloor|fisher|emaadam|full|all]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 32))
ULB_RATIO = int(os.environ.get("BENCH_ULB_RATIO", 4))
SIZE = int(os.environ.get("BENCH_SIZE", 224))
NET = os.environ.get("BENCH_NET", "effinetv2")
STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from semiuhpe_tpu.models import build_network
    from semiuhpe_tpu.ops import fisher
    from semiuhpe_tpu.parallel import make_mesh, replicate, shard_batch
    from semiuhpe_tpu.training import steps as steps_mod
    from semiuhpe_tpu.training.state import create_train_state

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    mesh = make_mesh()
    n_chips = len(jax.devices())
    batch = -(-BATCH // n_chips) * n_chips
    ulb_batch = -(-(BATCH * ULB_RATIO) // n_chips) * n_chips

    net = build_network(NET, dtype=jnp.bfloat16)
    state = jax.jit(lambda k: create_train_state(
        net, k, (SIZE, SIZE, 3), 1e-4, jnp.bfloat16))(jax.random.key(0))
    state = replicate(mesh, state)

    rng = np.random.default_rng(0)
    r = np.linalg.qr(rng.normal(size=(ulb_batch, 3, 3)))[0].astype(np.float32)
    r[np.linalg.det(r) < 0, :, 2] *= -1
    sup = shard_batch(mesh, {
        "img": rng.normal(size=(batch, SIZE, SIZE, 3)).astype(np.float32),
        "rot_mat": r[:batch]})
    ulb = shard_batch(mesh, {
        "img": rng.normal(size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
        "img_strong": rng.normal(
            size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
        "aug_rot_mat": r})

    sgd = optax.sgd(1e-4)
    sgd_state = jax.jit(sgd.init)(state.params)

    def fwd(params, stats, img, key, train=True):
        out, mut = net.apply({"params": params, "batch_stats": stats}, img,
                             train=train, rngs={"dropout": key},
                             mutable=["batch_stats"])
        return out, mut["batch_stats"]

    # --- variant bodies: (carry, key) -> carry', scalar ---------------------
    def convfloor_body(carry, key):
        st, opt = carry
        kt, ks, kl = jax.random.split(key, 3)
        t_out, _ = fwd(st.ema_params, st.ema_batch_stats, ulb["img"], kt)
        t_out = jax.lax.stop_gradient(t_out)

        def loss_fn(p):
            o1, s1 = fwd(p, st.batch_stats, sup["img"], kl)
            o2, s2 = fwd(p, s1, ulb["img_strong"], ks)
            l = jnp.mean((o1 - sup["rot_mat"].reshape(batch, 9)) ** 2)
            l += jnp.mean((o2 - t_out) ** 2)
            return l.astype(jnp.float32), s2
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        up, opt = sgd.update(g, opt, st.params)
        st = st.replace(params=optax.apply_updates(st.params, up),
                        batch_stats=stats)
        return (st, opt), l

    def fisher_body(carry, key):
        st, opt = carry
        kt, ks, kl = jax.random.split(key, 3)
        t_out, _ = fwd(st.ema_params, st.ema_batch_stats, ulb["img"], kt)
        t_out = jax.lax.stop_gradient(t_out)
        entropy, pseudo_rot, ce_target = fisher.fisher_teacher_stats(t_out)
        mask = (entropy < 0.0).astype(jnp.float32)

        def loss_fn(p):
            o1, s1 = fwd(p, st.batch_stats, sup["img"], kl)
            o2, s2 = fwd(p, s1, ulb["img_strong"], ks)
            nll, per_sample, _ = fisher.fisher_nll_and_cross_entropy(
                o1, sup["rot_mat"], o2, ce_target, overreg=1.025)
            l = jnp.mean(nll) + jnp.sum(per_sample * mask) / ulb_batch
            return l.astype(jnp.float32), s2
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        up, opt = sgd.update(g, opt, st.params)
        st = st.replace(params=optax.apply_updates(st.params, up),
                        batch_stats=stats)
        return (st, opt), l

    full_step = steps_mod.make_ssl_step(
        net, 1e-4, rotate_aug=True, cutout_aug=True, cutmix_aug=True,
        stage1_iteration=0, with_diagnostics=False)

    def full_body(carry, key):
        st, opt = carry
        st, metrics = full_step(st, sup, ulb, key, jnp.float32(0.0),
                                jnp.float32(1.0))
        return (st, opt), metrics["loss_all"]

    def emaadam_body(carry, key):
        # full step minus the strong-view cutout/cutmix (isolate aug cost).
        st, opt = carry
        st, metrics = noaug_step(st, sup, ulb, key, jnp.float32(0.0),
                                 jnp.float32(1.0))
        return (st, opt), metrics["loss_all"]

    noaug_step = steps_mod.make_ssl_step(
        net, 1e-4, rotate_aug=True, cutout_aug=False, cutmix_aug=False,
        stage1_iteration=0, with_diagnostics=False)

    def timeit(name, body):
        def many(carry, key):
            def scan_body(c, i):
                c, l = body(c, jax.random.fold_in(key, i))
                return c, l
            (carry), ls = jax.lax.scan(scan_body, carry, jnp.arange(STEPS))
            return ls[-1]
        f = jax.jit(many)
        carry = (state, sgd_state)
        t0 = time.time(); _ = float(f(carry, jax.random.key(1)))
        compile_s = time.time() - t0
        t0 = time.time(); _ = float(f(carry, jax.random.key(2)))
        dt = time.time() - t0
        print(json.dumps({"variant": name,
                          "step_ms": round(dt / STEPS * 1000, 2),
                          "compile_s": round(compile_s, 1)}))

    table = {"convfloor": convfloor_body, "fisher": fisher_body,
             "emaadam": emaadam_body, "full": full_body}
    for name in (table if which == "all" else [which]):
        timeit(name, table[name])


if __name__ == "__main__":
    main()
