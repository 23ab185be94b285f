#!/usr/bin/env python
"""Throughput benchmark: SSL training imgs/sec/chip on the flagship recipe.

Measures the full stage-2 SSL step (teacher forward on weak unlabeled +
student forward/backward on labeled + strong unlabeled, EMA update,
entropy masking, Fisher-CE consistency, Adam) with the reference recipe
shapes: EfficientNetV2-S, labeled batch 32, unlabeled batch 128
(ulb_batch_ratio 4), 224x224, bfloat16 compute — counting
labeled+unlabeled images per optimizer step, per chip.

Baseline context: the PyTorch reference publishes no throughput numbers
(SURVEY.md §6).  We estimate the single-A100 reference SSL step at
~500 imgs/sec: EffNetV2-S fwd/bwd on 160 imgs/step plus the reference's
per-step CPU round-trips (SVD + 512-pt Bessel quadrature normalizer +
autograd-in-forward Bingham entropy on host, fisher_utils.py:25-35) which
serialize against GPU compute.  ``vs_baseline`` = ours / that estimate,
so the BASELINE.json target (>2x A100 per v5e chip) is met when
vs_baseline > 2.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

A100_BASELINE_IMGS_PER_SEC = 500.0

BATCH = int(os.environ.get("BENCH_BATCH", 32))
ULB_RATIO = int(os.environ.get("BENCH_ULB_RATIO", 4))
SIZE = int(os.environ.get("BENCH_SIZE", 224))
NET = os.environ.get("BENCH_NET", "effinetv2")
STEPS = int(os.environ.get("BENCH_STEPS", 20))


def main():
    import jax

    import hashlib
    try:
        flags_line = next(ln for ln in open("/proc/cpuinfo")
                          if ln.startswith("flags"))
        fp = hashlib.md5(flags_line.encode()).hexdigest()[:8]
    except (OSError, StopIteration):
        fp = "generic"
    cache = os.path.expanduser(
        f"~/.cache/jax_cache_{jax.default_backend()}_{fp}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from semiuhpe_tpu.models import build_network
    from semiuhpe_tpu.parallel import make_mesh, jit_step, shard_batch, replicate
    from semiuhpe_tpu.training import steps as steps_mod
    from semiuhpe_tpu.training.state import create_train_state

    n_chips = len(jax.devices())
    mesh = make_mesh()
    batch = -(-BATCH // n_chips) * n_chips
    ulb_batch = -(-(BATCH * ULB_RATIO) // n_chips) * n_chips

    net = build_network(NET, dtype=jnp.bfloat16)
    state = jax.jit(lambda k: create_train_state(net, k, (SIZE, SIZE, 3), 1e-4,
                                                 jnp.bfloat16))(jax.random.key(0))
    state = replicate(mesh, state)

    # with_diagnostics=False is the steady-state trainer configuration
    # (diagnostic metrics only run on log steps).
    step = jit_step(
        steps_mod.make_ssl_step(
            net, 1e-4, rotate_aug=True, cutout_aug=True, cutmix_aug=True,
            stage1_iteration=0, with_diagnostics=False),
        mesh, n_batch_args=2, n_scalar_args=3)

    rng = np.random.default_rng(0)
    rot = np.linalg.qr(rng.normal(size=(ulb_batch, 3, 3)))[0].astype(np.float32)
    rot[np.linalg.det(rot) < 0, :, 2] *= -1
    sup = shard_batch(mesh, {
        "img": rng.normal(size=(batch, SIZE, SIZE, 3)).astype(np.float32),
        "rot_mat": rot[:batch],
    })
    ulb = shard_batch(mesh, {
        "img": rng.normal(size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
        "img_strong": rng.normal(size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
        "aug_rot_mat": rot,
    })

    def run_one(i):
        nonlocal state
        state, metrics = step(state, sup, ulb, jax.random.key(i),
                              jnp.float32(0.0), jnp.float32(1.0))
        return metrics

    t0 = time.time()
    m = run_one(0)
    jax.block_until_ready(m)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(1, STEPS + 1):
        m = run_one(i)
    jax.block_until_ready(m)
    dt = time.time() - t0

    imgs_per_step = batch + ulb_batch
    rate_per_chip = imgs_per_step * STEPS / dt / n_chips
    print(json.dumps({
        "metric": "ssl_train_imgs_per_sec_per_chip",
        "value": round(rate_per_chip, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(rate_per_chip / A100_BASELINE_IMGS_PER_SEC, 3),
        "detail": {
            "net": NET, "batch": batch, "ulb_batch": ulb_batch, "size": SIZE,
            "steps": STEPS, "n_chips": n_chips, "dtype": "bfloat16",
            "step_ms": round(dt / STEPS * 1000, 1),
            "compile_s": round(compile_s, 1),
            "baseline_estimate": "A100 reference SSL step ~500 imgs/s (see docstring)",
        },
    }))


if __name__ == "__main__":
    main()
