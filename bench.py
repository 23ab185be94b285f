#!/usr/bin/env python
"""Throughput benchmark: SSL training imgs/sec/chip on the flagship recipe.

Measures the full stage-2 SSL step (teacher forward on weak unlabeled +
student forward/backward on labeled + strong unlabeled, EMA update,
entropy masking, Fisher-CE consistency, Adam) with the reference recipe
shapes: EfficientNetV2-S, labeled batch 32, unlabeled batch 128
(ulb_batch_ratio 4), 224x224, bfloat16 compute — counting
labeled+unlabeled images per optimizer step, per chip.

Measurement design (round-2 rework for honesty):
* ``jax.block_until_ready`` does NOT block on the axon relay backend (a
  1.7-TFLOP program "completed" in 0.18 ms with it) — every round-1
  timing built on it was fiction (14k imgs/s claimed, implying 272
  TFLOP/s > the 197 TFLOP/s v5e bf16 peak).  The only real sync is a
  value fetch (``float(...)``), which this bench uses.
* The timed region is a single device-side ``lax.scan`` over chained
  train steps, so the number is pure device throughput, independent of
  host dispatch latency (~32 ms tunnel round-trip floor per dispatch on
  this one-core host).
* Scan iterations rotate through ROTATE distinct pre-staged batches, each
  bound as a loop-invariant program input (dynamic-slicing one stacked
  pool inside the scan runs ~100x slower through the relay).

Baseline context: the PyTorch reference publishes no throughput numbers
(SURVEY.md §6).  ``vs_baseline`` divides by a PER-BACKBONE single-A100
estimate (A100_BASELINE_BY_NET below) derived in BASELINE.md
("Per-backbone A100 SSL-step estimates"): a 3.8 x fwd-FLOPs step-work
model at documented achieved-TFLOP/s anchors for the reference's actual
precision regime — fp32 with TF32 matmul explicitly disabled
(train.py:28) and per-step CPU round-trips (SVD + 512-pt Bessel
quadrature normalizer, fisher_utils.py:25-35) serializing against GPU
compute.  The flagship (effinetv2) denominator stays at the historical
500 imgs/s, which is the generous end of its derived band.  The
BASELINE.json target (>2x A100 per v5e chip) is met when
vs_baseline > 2.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Per-backbone A100 SSL-step estimates — derived in BASELINE.md
# ("Per-backbone A100 SSL-step estimates", round 4): 3.8 x fwd-FLOPs work
# model at documented achieved-TFLOP/s anchors for the reference's actual
# precision regime (fp32, TF32 matmul disabled at train.py:28, cudnn TF32
# convs).  Values are best estimates; BASELINE.md records the bands.
A100_BASELINE_BY_NET = {
    "effinetv2": 500.0,   # kept at the historical flagship denominator
    "resnet50": 900.0,
    "resnet18": 2100.0,
    "repvgg": 400.0,
    "mobilenet": 1200.0,
    "effinet": 1000.0,
    "tinyvit": 400.0,
    "tinyvit_11m": 820.0,
}
A100_BASELINE_IMGS_PER_SEC = 500.0  # fallback for nets not in the table

BATCH = int(os.environ.get("BENCH_BATCH", 32))
ULB_RATIO = int(os.environ.get("BENCH_ULB_RATIO", 4))
SIZE = int(os.environ.get("BENCH_SIZE", 224))
NET = os.environ.get("BENCH_NET", "effinetv2")
STEPS = int(os.environ.get("BENCH_STEPS", 30))
ROTATE = int(os.environ.get("BENCH_ROTATE", 2))  # distinct staged batches


def _xla_opts():
    """BENCH_XLA_OPTS="k=v,k2=v2" -> per-executable XLA compiler options
    (jit compiler_options), the zero-code A/B mechanism for the TPU
    compiler-flag sweep (latency-hiding scheduler, scoped-VMEM limit,
    fusion knobs) — BENCH_NOTES round-4 section."""
    spec = os.environ.get("BENCH_XLA_OPTS", "").strip()
    if not spec:
        return None
    out = {}
    for kv in spec.split(","):
        k, _, v = kv.partition("=")
        out[k.strip()] = v.strip()
    return out


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
    from semiuhpe_tpu.parallel import make_mesh, replicate
    from semiuhpe_tpu.training import steps as steps_mod
    from semiuhpe_tpu.training.state import create_train_state

    n_chips = len(jax.devices())
    mesh = make_mesh()
    batch = -(-BATCH // n_chips) * n_chips
    ulb_batch = -(-(BATCH * ULB_RATIO) // n_chips) * n_chips

    net = build_network(NET, dtype=jnp.bfloat16)

    # with_diagnostics=False is the steady-state trainer configuration
    # (diagnostic metrics only run on log steps).
    step = steps_mod.make_ssl_step(
        net, 1e-4, rotate_aug=True, cutout_aug=True, cutmix_aug=True,
        stage1_iteration=0, with_diagnostics=False)

    # ROTATE distinct pre-staged batches, stacked on a leading axis and
    # sharded batch-wise over the mesh.
    rng = np.random.default_rng(0)
    rot = np.linalg.qr(
        rng.normal(size=(ROTATE, ulb_batch, 3, 3)))[0].astype(np.float32)
    rot[np.linalg.det(rot) < 0, :, 2] *= -1

    from semiuhpe_tpu.parallel import shard_batch

    # ROTATE distinct staged batches, each a loop-invariant program input.
    # (Dynamic-slicing one big staged pool inside the scan measured ~100x
    # slower through the axon relay — keep every batch a separate arg.)
    def stage_pair():
        r = np.linalg.qr(
            rng.normal(size=(ulb_batch, 3, 3)))[0].astype(np.float32)
        r[np.linalg.det(r) < 0, :, 2] *= -1
        sup = shard_batch(mesh, {
            "img": rng.normal(size=(batch, SIZE, SIZE, 3)).astype(np.float32),
            "rot_mat": r[:batch],
        })
        ulb = shard_batch(mesh, {
            "img": rng.normal(
                size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
            "img_strong": rng.normal(
                size=(ulb_batch, SIZE, SIZE, 3)).astype(np.float32),
            "aug_rot_mat": r,
        })
        return sup, ulb

    compile_only = os.environ.get("BENCH_COMPILE_ONLY") == "1"
    if compile_only:
        # Cache-warm mode: AOT-compile the scan program through the remote
        # compiler WITHOUT staging data or running on the (possibly busy)
        # TPU.  Used to pre-compile A/B variants (SEMIUHPE_REMAT=1,
        # BENCH_BATCH=64, ...) while a training run owns the chip.
        from semiuhpe_tpu.parallel.mesh import batch_sharding

        bsh = batch_sharding(mesh)  # same shardings as the timed run,
        # so the cache key matches shard_batch-placed inputs.

        def sds_pair():
            f32 = jnp.float32
            sds = lambda *s: jax.ShapeDtypeStruct(s, f32, sharding=bsh)
            sup = {"img": sds(batch, SIZE, SIZE, 3),
                   "rot_mat": sds(batch, 3, 3)}
            ulb = {"img": sds(ulb_batch, SIZE, SIZE, 3),
                   "img_strong": sds(ulb_batch, SIZE, SIZE, 3),
                   "aug_rot_mat": sds(ulb_batch, 3, 3)}
            return sup, ulb
        flat_batches = [d for _ in range(ROTATE) for d in sds_pair()]
    else:
        pairs = [stage_pair() for _ in range(ROTATE)]
        flat_batches = [d for pair in pairs for d in pair]

    def many(state, key, *batches, n_rounds):
        pairs = [(batches[2 * i], batches[2 * i + 1])
                 for i in range(len(batches) // 2)]

        def body(carry, i):
            st, _ = carry
            last = jnp.float32(0.0)
            for j, (sup, ulb) in enumerate(pairs):  # unrolled R chained steps
                st, metrics = step(st, sup, ulb,
                                   jax.random.fold_in(key, i * len(pairs) + j),
                                   jnp.float32(0.0), jnp.float32(1.0))
                last = metrics["loss_all"]
            return (st, last), None

        (state, last), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                        jnp.arange(n_rounds))
        return state, last

    n_rounds = max(1, STEPS // ROTATE)
    n_steps = n_rounds * ROTATE
    opts = _xla_opts()
    many_jit = jax.jit(many, static_argnames="n_rounds", donate_argnums=0,
                       compiler_options=opts)

    if compile_only:
        from semiuhpe_tpu.parallel.mesh import replicated
        rsh = replicated(mesh)
        st_shape = jax.eval_shape(
            lambda k: create_train_state(net, k, (SIZE, SIZE, 3), 1e-4,
                                         jnp.bfloat16), jax.random.key(0))
        st_shape = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rsh),
            st_shape)
        t0 = time.time()
        many_jit.lower(st_shape, jax.random.key(1), *flat_batches,
                       n_rounds=n_rounds).compile()
        print(json.dumps({"compile_only": True, "net": NET, "batch": batch,
                          "ulb_batch": ulb_batch, "xla_opts": opts,
                          "compile_s": round(time.time() - t0, 1)}))
        return

    # Timed dispatch goes through the SAME ``lower().compile()`` AOT route
    # as BENCH_COMPILE_ONLY cache warming by default (BENCH_AOT=0 reverts
    # to plain jit dispatch).  Round-4 post-mortem: with non-default
    # compiler_options the runtime jit dispatch MISSES the persistent-cache
    # entry the AOT warm pass wrote (key divergence) and silently
    # recompiles from scratch — the vmem64 timed run DNF'd at an 18-min cap
    # that way while its executable sat warm in the cache.  Compiling the
    # executable object explicitly and calling it guarantees the warm entry
    # is the one used.
    use_aot = os.environ.get("BENCH_AOT", "1") == "1"

    def attempt():
        """One warm-up (compile/cache-load) + one timed run.  State is
        donated, so every attempt starts from a freshly materialized state
        (the init program itself is compile-cached)."""
        st = jax.jit(lambda k: create_train_state(
            net, k, (SIZE, SIZE, 3), 1e-4, jnp.bfloat16))(jax.random.key(0))
        st = replicate(mesh, st)
        t0 = time.time()
        if use_aot:
            compiled = many_jit.lower(st, jax.random.key(1), *flat_batches,
                                      n_rounds=n_rounds).compile()
            run = lambda s, k: compiled(s, k, *flat_batches)
        else:
            run = lambda s, k: many_jit(s, k, *flat_batches,
                                        n_rounds=n_rounds)
        st, last = run(st, jax.random.key(1))
        # value fetch: the only real sync on the axon relay
        last = float(last)
        compile_s = time.time() - t0
        t0 = time.time()
        st, last = run(st, jax.random.key(2))
        last = float(last)
        dt = time.time() - t0
        assert np.isfinite(last), last
        return dt, compile_s

    # The remote compile service intermittently drops connections
    # (JaxRuntimeError INTERNAL); retry so a transient blip doesn't void
    # the benchmark artifact.
    for retry in range(3):
        try:
            dt, compile_s = attempt()
            break
        except Exception as e:  # noqa: BLE001 - backend errors vary by type
            if retry == 2:
                raise
            print(f"bench attempt {retry + 1} failed ({type(e).__name__}: "
                  f"{e}); retrying in 30s", file=sys.stderr)
            time.sleep(30)

    imgs_per_step = batch + ulb_batch
    rate_per_chip = imgs_per_step * n_steps / dt / n_chips
    baseline = A100_BASELINE_BY_NET.get(NET, A100_BASELINE_IMGS_PER_SEC)
    print(json.dumps({
        "metric": "ssl_train_imgs_per_sec_per_chip",
        "value": round(rate_per_chip, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(rate_per_chip / baseline, 3),
        "detail": {
            "net": NET, "batch": batch, "ulb_batch": ulb_batch, "size": SIZE,
            "steps": n_steps, "rotate_buffers": ROTATE, "n_chips": n_chips,
            "dtype": "bfloat16",
            "step_ms": round(dt / n_steps * 1000, 2),
            "compile_s": round(compile_s, 1),
            "timing": "device-side lax.scan, rotating staged batches",
            **({"xla_opts": opts} if opts else {}),
            "vs_round1": "r01's 8,148 was a sync artifact: block_until_"
                         "ready is a no-op through the axon relay, so the"
                         " scan hadn't finished; this number is value-"
                         "fetch synced (BENCH_NOTES.md)",
            "baseline_estimate":
                f"A100 reference SSL step ~{baseline:.0f} imgs/s for "
                f"{NET} (per-net derivation: BASELINE.md)",
        },
    }))


if __name__ == "__main__":
    main()
