"""Two-stage SSL training CLI.

Parity with /root/reference/train.py: stage-1 supervised until
``stage1_iteration``; at the boundary reload the best checkpoint and drop
LR x0.1; stage-2 FixMatch-style SSL with the EMA teacher; per
``val_frequency`` evaluation of student (and teacher in stage 2) with
best-checkpoint tracking by mean test error; per ``save_frequency``
dynamic entropy-threshold recompute over the whole unlabeled set.

TPU-native execution: one jit-compiled step per stage over a data-sharded
device mesh, host loaders prefetching batches onto the mesh, orbax
checkpoints.

Usage:
    python -m semiuhpe_tpu.cli.train --config settings/300WLP_AFLW2000.yml \
        --network effinetv2 --ss_ratio 0.2 ...
Synthetic smoke run (no datasets needed):
    python -m semiuhpe_tpu.cli.train --train_labeled synthetic \
        --train_unlabeled synthetic --test_set synthetic \
        --stage1_iteration 50 --max_iteration 100 ...
"""

from __future__ import annotations

import itertools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.data import Loader, cycle
from semiuhpe_tpu.data.loader import prefetch_to_device
from semiuhpe_tpu.data.datasets import get_dataset
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.ops.laplace import grids_as_device_matrix
from semiuhpe_tpu.parallel import make_mesh, jit_step, shard_batch, replicate
from semiuhpe_tpu.training import steps as steps_mod
from semiuhpe_tpu.training.checkpoints import (load_checkpoint,
                                               save_checkpoint,
                                               wedge_watchdog)
from semiuhpe_tpu.training.loggingx import TextLogger, Throughput
from semiuhpe_tpu.training.profiling import StepTimer, device_memory_stats, trace
from semiuhpe_tpu.training.state import create_train_state, set_learning_rate


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature set — AOT executables compiled for
    a different microarchitecture must not be loaded (SIGILL risk)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


def setup_compile_cache():
    # Cache dir keyed by platform AND host CPU fingerprint: artifacts
    # compiled for another microarchitecture must never be loaded.
    cache = os.path.expanduser(
        f"~/.cache/jax_cache_{jax.default_backend()}_{_host_fingerprint()}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def save_visual_fixtures(log_dir, batch, prefix, limit=10):
    """First ~10 crops of a batch saved as JPEGs — the reference's runtime
    augmentation-monitoring idiom (agent.py:128-136, dataset save blocks)."""
    import cv2

    from semiuhpe_tpu.data.augments_host import denormalize

    existing = [n for n in os.listdir(log_dir) if n.startswith(prefix)]
    if len(existing) >= limit:
        return
    imgs = np.asarray(batch)[:limit]
    for i, img in enumerate(imgs):
        path = os.path.join(log_dir, f"{prefix}{i:08d}.jpg")
        cv2.imwrite(path, denormalize(img)[:, :, ::-1])


_weak_view_jit = None


def ulb_entropy_images(batch, rng=None):
    """The image tensor the dynamic-threshold sweep (and save_feat dump)
    scores: the host weak view, or — raw-crop modes (--device_views) — a
    freshly-sampled ON-DEVICE weak view of the raw crop.  Parity: the
    reference sweep iterates the unlabeled loader, whose batches are
    weak-augmented (agent.py:386-391); scoring the raw crop instead would
    shift the entropy distribution and so the quantile threshold."""
    import jax as _jax

    if "img" in batch:
        return jnp.asarray(batch["img"])
    global _weak_view_jit
    if _weak_view_jit is None:
        from semiuhpe_tpu.ops.views import weak_view_images
        _weak_view_jit = _jax.jit(weak_view_images)
    assert rng is not None, "raw-crop sweep batches need a view rng"
    return _weak_view_jit(rng, jnp.asarray(batch["img_raw"]))


def sweep_keys(seed: int, it: int):
    """Deterministic per-batch view keys for one dynamic-threshold sweep
    (stream disjoint from the train-step keys, which use seed*1_000_003+it)."""
    return (jax.random.key((seed + 0x5EED) * 1_000_003 + it + 7919 * j)
            for j in itertools.count())


def pad_to(batch, size):
    """Pad a possibly-short batch to ``size`` rows; returns (batch, n_valid)."""
    n = len(next(iter(batch.values())))
    if n == size:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[-1:], size - n, axis=0)
        out[k] = np.concatenate([v, pad], 0)
    return out, n


def evaluate(eval_step, state, test_loader, mesh, conf_thres, batch_size,
             pool=None):
    """Returns (loss, err_mean, mask_ratio, err_pseudo_gt): the last is the
    mean error over confidently-predicted samples only (reference val_func
    err_pseudo_gt, agent.py:238-247).

    Short final batches are padded on device for a single compiled shape,
    but every aggregate weights only the ``n_valid`` real rows — padding
    must never bias the metrics (it decides the best checkpoint).

    With ``pool`` (a data.device_pool.DevicePool), ``eval_step`` is the
    pooled variant and batches are in-program index gathers (padding =
    repeating the last index)."""

    def _outputs():
        if pool is None:
            for batch in test_loader:
                batch, n_valid = pad_to(batch, batch_size)
                yield eval_step(state, shard_batch(mesh, batch),
                                jnp.float32(conf_thres)), n_valid
            return
        from semiuhpe_tpu.parallel.mesh import batch_sharding
        idx_sh = batch_sharding(mesh)
        for start in range(0, pool.n, batch_size):
            idx = np.arange(start, min(start + batch_size, pool.n))
            n_valid = len(idx)
            if n_valid < batch_size:
                idx = np.concatenate(
                    [idx, np.full(batch_size - n_valid, idx[-1])])
            yield eval_step(state, pool.arrays,
                            jax.device_put(idx.astype(np.int32), idx_sh),
                            jnp.float32(conf_thres)), n_valid

    losses, errs, masks_n, masked_errs, n_total = [], [], 0.0, [], 0
    for out, n_valid in _outputs():
        per_loss = np.asarray(out.get("losses", out["loss"]))
        if per_loss.ndim == 0:  # scalar fallback: weight by n_valid
            losses.append(float(per_loss) * n_valid)
        else:
            losses.append(float(per_loss[:n_valid].sum()))
        err = np.asarray(out["err_deg"])[:n_valid]
        errs.append(err)
        mask = np.asarray(out["entropy"])[:n_valid] < conf_thres
        masks_n += float(mask.sum())
        masked_errs.append(err[mask])
        n_total += n_valid
    errs = np.concatenate(errs)
    masked = np.concatenate(masked_errs) if masked_errs else np.asarray([])
    err_pseudo = float(masked.mean()) if masked.size else -1.0
    return (float(np.sum(losses) / n_total), float(errs.mean()),
            float(masks_n / n_total), err_pseudo)


def plan_chunk(it: int, config) -> int:
    """Return --scan_chunk when a full chunk of steps starting after
    iteration ``it`` crosses no boundary, else 1 (single-step dispatch).

    Boundaries: log/val/save frequencies (post-increment space), the
    stage-1 -> SSL transition, and max_iteration.  An SSL chunk may not
    even *end* on a log boundary — that step must be the diagnostic
    single-step program so the log line carries the extra SVD metrics.
    """
    k = config.scan_chunk
    s1 = it < config.stage1_iteration
    if it + k > config.max_iteration:
        return 1
    if s1 and it + k > config.stage1_iteration:
        return 1
    for freq, strict in ((config.log_frequency, not s1),
                         (config.val_frequency, False),
                         (config.save_frequency, False)):
        nxt = freq - it % freq
        if nxt < k or (strict and nxt == k):
            return 1
    return k


def _rss_gb() -> float:
    """Host anonymous RSS of this process in GB (Linux)."""
    try:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def main(argv=None):
    # SIGUSR1 -> all-thread stack dump on stderr (hang diagnosis without
    # killing the run; an unhandled SIGUSR1 would terminate the process).
    import faulthandler
    import signal
    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):  # non-main thread / platform quirk
        pass
    setup_compile_cache()
    config = get_config("train", argv)
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

    logger = TextLogger(config.log_dir)
    logger.line(f"devices: {jax.devices()}")
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())

    # ----- data -----
    def maybe_packed(name, phase):
        """Decode-once packed cache (data/packed.py): deterministic
        decode+crop happens one time; per-epoch stochastic views run on
        device.  Collapses per-batch host cost to a memmap gather."""
        ds = get_dataset(name, phase, config)
        if not config.packed_cache:
            return ds
        if phase == "test" and "img_raw" not in ds[0]:
            # Dataset has no deterministic raw-crop mode (real test sets
            # keep host-normalized views); leave it unpacked.
            return ds
        assert config.device_views, "--packed_cache requires --device_views"
        from semiuhpe_tpu.data.packed import (PackedHeadPose, is_packed,
                                              pack_dataset)
        # Content-addressed cache dir: the source dataset's fingerprint
        # (split/seed/size identity, data/datasets/base.py) is hashed into
        # the path, so a changed config lands in a *different* dir — no
        # in-place repacking, no reader-vs-repacker races.  Fingerprint-
        # less datasets (real data: identity = files on disk) fall back
        # to the name/phase/size key plus a length check.
        fp = getattr(ds, "fingerprint", None)
        key = f"{name}_{phase}_s{config.input_size}"
        if fp is not None:
            import hashlib
            key += "_" + hashlib.md5(fp.encode()).hexdigest()[:8]
        d = os.path.join(config.packed_cache, key)
        if not is_packed(d):
            logger.line(f"packing {name}/{phase} -> {d} (one-time)")
            pack_dataset(ds, d)
        packed = PackedHeadPose(d)
        if len(packed) != len(ds) or (fp is not None
                                      and packed.fingerprint != fp):
            # Unreachable for fingerprinted datasets short of a hash
            # collision; guards legacy/fingerprint-less dirs.
            logger.line(f"packed cache {d} is stale; repacking")
            pack_dataset(ds, d)
            packed = PackedHeadPose(d)
        return packed

    labeled_phase = "train_all" if config.ss_ratio >= 1.0 else "train"
    train_set = maybe_packed(config.train_labeled, labeled_phase)
    test_set = maybe_packed(config.test_set, "test")
    batch = _round_up(config.batch_size, n_dev)
    config.eval_batch_size = _round_up(config.eval_batch_size, n_dev)

    def train_loader_cls(dataset, *a, **kw):
        # Packed datasets take the vectorized fast path inside Loader; the
        # shm backend only pays off for decode-heavy per-sample datasets.
        if config.loader == "shm" and not hasattr(dataset, "get_batch"):
            from semiuhpe_tpu.data.shm_loader import ShmLoader

            return ShmLoader(dataset, *a, **kw)
        return Loader(dataset, *a, **kw)

    # Loaders get explicit per-role seeds: an unseeded Loader shuffles
    # from OS entropy, which made short e2e runs (and any debug repro)
    # trajectory-nondeterministic.
    train_loader = train_loader_cls(train_set, batch, shuffle=True,
                                    drop_last=True,
                                    num_workers=config.num_workers,
                                    seed=config.seed * 7_368_787 + 1)
    assert len(train_loader) > 0, (
        f"labeled set ({len(train_set)} samples) smaller than one batch "
        f"({batch}); lower --batch_size or raise --ss_ratio")
    test_loader = Loader(test_set, config.eval_batch_size, shuffle=False,
                         drop_last=False, num_workers=config.num_workers)

    do_ssl = config.max_iteration > config.stage1_iteration
    if do_ssl:
        ulb_set = maybe_packed(config.train_unlabeled, "ulb_train")
        ulb_batch = _round_up(round(config.batch_size * config.ulb_batch_ratio), n_dev)
        ulb_loader = train_loader_cls(ulb_set, ulb_batch, shuffle=True,
                                      drop_last=True,
                                      num_workers=config.num_workers,
                                      seed=config.seed * 7_368_787 + 2)
        if not config.device_data:
            # Device-side prefetch: unlabeled batches land sharded on the
            # mesh two steps ahead of consumption (overlaps H2D+compute).
            ulb_iter = prefetch_to_device(cycle(ulb_loader), mesh, depth=2)

    # Device-resident data (data/device_pool.py): stage every pool in HBM
    # once; per-step batches become in-program index gathers.  Measured on
    # the axon relay: 28 ms/step vs 712 ms/step of per-batch H2D at recipe
    # shapes — and no per-transfer host staging leak.
    dd = bool(config.device_data)
    if dd:
        assert config.device_views and config.packed_cache, \
            "--device_data requires --device_views and --packed_cache"
        from semiuhpe_tpu.data.device_pool import (DevicePool, epoch_indices,
                                                   infinite_indices,
                                                   jit_pool_step)
        from semiuhpe_tpu.parallel.mesh import batch_sharding
        idx_sh = batch_sharding(mesh)
        logger.line("staging datasets in device HBM (one-time)...")
        lb_pool = DevicePool(train_set, mesh)
        # Eval needs only the image + labels; never stage the train-only
        # tensors (img_strong is a full batch of zeros on test sets).
        test_pool = DevicePool(test_set, mesh,
                               keys={"img", "img_raw", "rot_mat",
                                     "euler_angles"})
        ulb_pool = DevicePool(ulb_set, mesh) if do_ssl else None
        ulb_idx_iter = (iter(infinite_indices(len(ulb_set), ulb_batch,
                                              config.seed + 7))
                        if do_ssl else None)
        logger.line(
            f"staged on device: labeled {len(train_set)}, "
            f"test {len(test_set)}"
            + (f", unlabeled {len(ulb_set)}" if do_ssl else ""))

    # ----- model/state -----
    net = build_network(config.network, num_outputs=config.num_classes, dtype=dtype)
    grids9 = (grids_as_device_matrix(config.rl_grid_level, config.rl_grid_mode,
                                     file=config.rl_grid_file)
              if config.distribution == "RotationLaplace" else None)
    if grids9 is not None:
        src = (f"file {config.rl_grid_file}" if config.rl_grid_file
               else f"level {config.rl_grid_level}")
        logger.line(f"[RotationLaplace] grid {src} "
                    f"mode {config.rl_grid_mode}: {grids9.shape[0]} points")
    with jax.default_device(jax.devices()[0]):
        state = jax.jit(
            lambda k: create_train_state(net, k, (config.input_size, config.input_size, 3), config.lr, dtype)
        )(jax.random.key(config.seed))
    if config.pretrained:
        # Backbone trunk from a torch checkpoint (student AND teacher, like
        # the reference's two pretrained get_network calls, agent.py:31-35).
        from semiuhpe_tpu.models.convert import (load_torch_checkpoint,
                                                 pretrained_into_state)
        state = pretrained_into_state(
            jax.device_get(state), net, load_torch_checkpoint(config.pretrained),
            (config.input_size, config.input_size, 3), config.network)
        logger.line(f"initialized backbone trunk from {config.pretrained}")
    state = replicate(mesh, state)

    # ----- steps -----
    sup_fn = steps_mod.make_supervised_step(
        net, config.lr, config.distribution, grids9,
        grad_clip=config.grad_clip, device_views=config.device_views,
        labeled_weak_aug=(config.train_labeled != "DAD3DHeads"))
    sup_step = (jit_pool_step(sup_fn, mesh, n_batches=1, n_scalar_args=1)
                if dd else
                jit_step(sup_fn, mesh, n_batch_args=1, n_scalar_args=1))
    ssl_kwargs = dict(
        distribution=config.distribution, type_unsuper=config.type_unsuper,
        labeled_set=config.train_labeled, rotate_aug=config.rotate_aug,
        cutout_aug=config.cutout_aug, cutmix_aug=config.cutmix_aug,
        is_ema=config.is_ema, eman=config.eman, ema_decay=config.ema_decay,
        stage1_iteration=config.stage1_iteration, grids9=grids9,
        grad_clip=config.grad_clip, device_views=config.device_views)
    # Fast step for most iterations; diagnostic step (extra SVD metrics,
    # ~9% slower) only on logging iterations.
    def _mk_ssl(diag):
        fn = steps_mod.make_ssl_step(net, config.lr, with_diagnostics=diag,
                                     **ssl_kwargs)
        if dd:
            return jit_pool_step(fn, mesh, n_batches=2, n_scalar_args=3)
        return jit_step(fn, mesh, n_batch_args=2, n_scalar_args=3)

    ssl_step_fast = _mk_ssl(False)
    ssl_step_diag = _mk_ssl(True)

    # Chunked dispatch (--scan_chunk, device_data only): K steps per
    # lax.scan program.  Single fixed K so exactly one extra executable
    # compiles per stage; boundary-adjacent steps run singly.
    sup_scan = ssl_scan = idx_rows_sh = None
    if dd and config.scan_chunk > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from semiuhpe_tpu.data.device_pool import jit_pool_scan

        idx_rows_sh = NamedSharding(mesh, P(None, "data"))
        sup_scan = jit_pool_scan(sup_fn, mesh, n_batches=1, n_scalar_args=0)
        if do_ssl:
            ssl_scan = jit_pool_scan(
                steps_mod.make_ssl_step(net, config.lr,
                                        with_diagnostics=False, **ssl_kwargs),
                mesh, n_batches=2, n_scalar_args=2)

    from semiuhpe_tpu.parallel.mesh import jit_with_mesh

    def _mk_eval(use_ema):
        fn = steps_mod.make_eval_step(net, config.distribution, grids9,
                                      use_ema=use_ema)
        if not dd:
            return jit_with_mesh(fn, mesh)
        from semiuhpe_tpu.data.device_pool import gather
        from semiuhpe_tpu.parallel.mesh import replicated

        def pooled(state, pools, idx, conf_thres):
            return fn(state, gather(pools, idx), conf_thres)

        repl = replicated(mesh)
        return jit_with_mesh(pooled, mesh,
                             in_shardings=(repl, repl, idx_sh, repl))

    eval_student = _mk_eval(False)
    eval_teacher = _mk_eval(True)
    entropy_fn = jit_with_mesh(steps_mod.make_entropy_fn(net, use_ema=True),
                               mesh)
    if dd:
        from semiuhpe_tpu.ops.views import weak_view_images
        from semiuhpe_tpu.parallel.mesh import replicated

        _ent_inner = steps_mod.make_entropy_fn(net, use_ema=True)

        def _entropy_pooled(state, pools, idx, rng):
            # Weak view sampled in-program: the sweep scores the same
            # distribution the training mask sees (reference parity,
            # agent.py:386-391 — the sweep's loader batches are weak views).
            img = weak_view_images(rng, jnp.take(pools["img_raw"], idx, axis=0))
            return _ent_inner(state, img)

        repl_sh = replicated(mesh)
        entropy_pool = jit_with_mesh(
            _entropy_pooled, mesh,
            in_shardings=(repl_sh, repl_sh, idx_sh, repl_sh))
    feature_fn = (jit_with_mesh(
        steps_mod.make_feature_entropy_fn(net, use_ema=True), mesh)
        if config.save_feat else None)

    # ----- resume -----
    if config.cont_ckpt:
        # The step fetch here has wedged through the relay just like the
        # eval fetches (train.py evaluate); watchdog the whole restore so
        # a wedged resume retries via exit-75 instead of hanging forever.
        with wedge_watchdog("resume restore/step fetch"):
            state = load_checkpoint(config.model_dir,
                                    config.resolve_ckpt(config.cont_ckpt),
                                    state)
            state = replicate(mesh, state)
            start_step = int(state.step)
        logger.line(f"resumed from {config.cont_ckpt} at iter {start_step}")

    best_mean_error = 360.0
    if config.cont_ckpt:
        # Sidecar keeps best-ckpt semantics across resumes (else the first
        # val of a resumed run, usually worse, would overwrite `best`).
        sidecar = os.path.join(config.model_dir, "best_err.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                best_mean_error = float(json.load(f)["err"])
            logger.line(f"best-so-far restored: {best_mean_error:.4f}")
    conf_thres = config.conf_thres
    meter = Throughput()
    step_timer = StepTimer()
    profiler_ctx = None
    epoch = 0
    # Host-side iteration mirror of state.step: avoids a device round-trip
    # (and dispatch serialization) every step.
    it = int(jax.device_get(state.step))
    last_latest_it = it  # rolling-save interval anchor (--ckpt_frequency)

    while it < config.max_iteration:
        data_iter = (epoch_indices(len(train_set), batch, config.seed, epoch)
                     if dd else train_loader)
        for data in data_iter:
            if it >= config.max_iteration:
                break

            # Stage boundary: reload best, drop LR x0.1 (train.py:104-109).
            if it == config.stage1_iteration and do_ssl:
                step_now = state.step
                try:
                    state = load_checkpoint(config.model_dir, "best", state)
                    state = state.replace(step=step_now)
                    state = replicate(mesh, state)
                    logger.line("stage boundary: reloaded best checkpoint")
                except FileNotFoundError:
                    logger.line("stage boundary: no best checkpoint to reload")
                state = set_learning_rate(
                    state, config.lr * config.stage2_lr_scale)

            # Profiler window management.
            if config.profile_dir and it == config.profile_start:
                profiler_ctx = trace(config.profile_dir)
                profiler_ctx.__enter__()
            if (profiler_ctx is not None
                    and it == config.profile_start + config.profile_steps):
                profiler_ctx.__exit__(None, None, None)
                profiler_ctx = None
                logger.line(f"profiler trace written to {config.profile_dir}")

            s1 = it < config.stage1_iteration
            chunk = (plan_chunk(it, config)
                     if sup_scan is not None and not config.profile_dir
                     else 1)
            if chunk > 1:
                rows = [data] + list(itertools.islice(data_iter, chunk - 1))
                step_timer.start()
                if len(rows) < chunk:
                    # Epoch tail shorter than the chunk: single steps (no
                    # boundary lies inside the planned range).
                    for row in rows:
                        rng = jax.random.key(config.seed * 1_000_003 + it)
                        ridx = jax.device_put(row, idx_sh)
                        if s1:
                            state, metrics = sup_step(
                                state, lb_pool.arrays, ridx, rng)
                        else:
                            state, metrics = ssl_step_fast(
                                state, lb_pool.arrays, ridx,
                                ulb_pool.arrays,
                                jax.device_put(next(ulb_idx_iter), idx_sh),
                                rng, jnp.float32(conf_thres),
                                jnp.float32(config.SSL_lambda))
                        it += 1
                    n_imgs = (batch if s1 else batch + ulb_batch) * len(rows)
                else:
                    # One device program for the whole chunk; per-step keys
                    # keep results bit-identical to single-step dispatch.
                    keys = jnp.stack([
                        jax.random.key(config.seed * 1_000_003 + it + j)
                        for j in range(chunk)])
                    idxs = jax.device_put(np.stack(rows), idx_rows_sh)
                    if s1:
                        state, metrics = sup_scan(
                            state, lb_pool.arrays, idxs, keys)
                        n_imgs = batch * chunk
                    else:
                        ulb_rows = np.stack(
                            [next(ulb_idx_iter) for _ in range(chunk)])
                        state, metrics = ssl_scan(
                            state, lb_pool.arrays, idxs, ulb_pool.arrays,
                            jax.device_put(ulb_rows, idx_rows_sh), keys,
                            jnp.float32(conf_thres),
                            jnp.float32(config.SSL_lambda))
                        n_imgs = (batch + ulb_batch) * chunk
                    it += chunk
                step_timer.stop()
                rate = meter.tick(n_imgs)
            else:
                rng = jax.random.key(config.seed * 1_000_003 + it)
                if it < 2 and not dd and "img" in data:
                    save_visual_fixtures(config.log_dir, data["img"],
                                         f"{config.train_labeled}_weak_")
                step_timer.start()
                if s1:
                    if dd:
                        state, metrics = sup_step(
                            state, lb_pool.arrays,
                            jax.device_put(data, idx_sh), rng)
                    else:
                        sdata = shard_batch(mesh, data)
                        state, metrics = sup_step(state, sdata, rng)
                    n_imgs = batch
                else:
                    ssl_step = (ssl_step_diag
                                if (it + 1) % config.log_frequency == 0
                                else ssl_step_fast)
                    if dd:
                        state, metrics = ssl_step(
                            state, lb_pool.arrays,
                            jax.device_put(data, idx_sh),
                            ulb_pool.arrays,
                            jax.device_put(next(ulb_idx_iter), idx_sh),
                            rng, jnp.float32(conf_thres),
                            jnp.float32(config.SSL_lambda))
                    else:
                        ulb_data = next(ulb_iter)  # already sharded on the mesh
                        if (it < config.stage1_iteration + 2
                                and "img_strong" in ulb_data):
                            save_visual_fixtures(
                                config.log_dir,
                                jax.device_get(ulb_data["img_strong"]),
                                f"{config.train_unlabeled}_strong_")
                        state, metrics = ssl_step(
                            state, shard_batch(mesh, data), ulb_data,
                            rng, jnp.float32(conf_thres),
                            jnp.float32(config.SSL_lambda))
                    n_imgs = batch + ulb_batch
                jax.block_until_ready(metrics) if config.profile_dir else None
                step_timer.stop()
                rate = meter.tick(n_imgs)
                it += 1
            if it % config.log_frequency == 0:
                with wedge_watchdog(f"log-metrics fetch @it {it}"):
                    metrics = jax.device_get(metrics)
                m = {k: float(v) for k, v in metrics.items()}
                m["imgs_per_sec"] = rate
                logger.log("train" if s1 else "train_SSL", it, m)
                print(f"[{epoch:03d}|{it:07d}] " +
                      " ".join(f"{k}:{v:.4f}" for k, v in m.items()), flush=True)

            if it % config.val_frequency == 0:
                # Eval fetches through the relay have wedged permanently
                # (Array.__array__ stuck >13 min, live round-4 run); the
                # watchdog turns that into an exit-75 auto-resume.
                with wedge_watchdog(f"student eval @it {it}"):
                    loss, err, mratio, err_pseudo = evaluate(
                        eval_student, state, test_loader, mesh, conf_thres,
                        config.eval_batch_size,
                        pool=test_pool if dd else None)
                logger.log("test", it, {"loss": loss, "err_mean": err,
                                        "mask_ratio": mratio,
                                        "err_pseudo_gt": err_pseudo})
                if err < best_mean_error:
                    best_mean_error = err
                    save_checkpoint(config.model_dir, "best",
                                    jax.device_get(state))
                    with open(os.path.join(config.model_dir,
                                           "best_err.json"), "w") as f:
                        json.dump({"err": err, "iter": it}, f)
                    logger.line(f"saved best (err {err:.4f})")
                # Rolling crash-recovery checkpoint: a hang/kill loses at
                # most ckpt_frequency (default val_frequency) iterations
                # (resume via --cont_ckpt <exp>/<date>/latest; restores
                # net+EMA+optimizer+clock).  Each save costs a full-state
                # D2H fetch (~45 s at EffNetV2-S size through the relay),
                # so --ckpt_frequency decouples it from frequent vals.
                # Interval (not modulo) so any --ckpt_frequency value
                # bounds recovery loss even when it doesn't divide the
                # val boundaries it is checked at.
                saved_latest = (not config.ckpt_frequency
                                or it - last_latest_it >= config.ckpt_frequency)
                if saved_latest:
                    save_checkpoint(config.model_dir, "latest",
                                    jax.device_get(state))
                    last_latest_it = it
                if config.max_rss_gb and _rss_gb() > config.max_rss_gb:
                    # Voluntary restart point: the axon relay leaks host
                    # staging per H2D transfer (parallel/mesh.py docstring);
                    # exit 75 (EX_TEMPFAIL) tells train_auto_resume.sh to
                    # relaunch from `latest` with a fresh process.  Make
                    # the restart lossless even when this val skipped the
                    # rolling save.
                    if not saved_latest:
                        save_checkpoint(config.model_dir, "latest",
                                        jax.device_get(state))
                    logger.line(
                        f"host RSS {_rss_gb():.1f} GB > --max_rss_gb "
                        f"{config.max_rss_gb:g}: exiting 75 for auto-resume")
                    sys.exit(75)
                if not s1:
                    with wedge_watchdog(f"teacher eval @it {it}"):
                        loss_e, err_e, mratio_e, err_pseudo_e = evaluate(
                            eval_teacher, state, test_loader, mesh,
                            conf_thres, config.eval_batch_size,
                            pool=test_pool if dd else None)
                    logger.log("test_ema", it,
                               {"loss": loss_e, "err_mean": err_e,
                                "mask_ratio": mratio_e,
                                "err_pseudo_gt": err_pseudo_e})

            first_sweep_at = config.stage1_iteration + (
                config.save_frequency if config.sweep_after_warmup else 0)
            if (it % config.save_frequency == 0 and do_ssl
                    and it >= first_sweep_at):
                if config.dynamic_thres:
                    with wedge_watchdog(f"dynamic sweep @it {it}"):
                        if dd:
                            conf_thres = steps_mod.pooled_entropy_threshold(
                                entropy_pool, state, ulb_pool.arrays,
                                len(ulb_set), config.eval_batch_size,
                                sweep_keys(config.seed, it),
                                config.left_ratio,
                                put_idx=lambda a: jax.device_put(a, idx_sh))
                        else:
                            keys = sweep_keys(config.seed, it)
                            conf_thres = steps_mod.dynamic_entropy_threshold(
                                lambda st, img: entropy_fn(
                                    st, jax.device_put(img)),
                                state,
                                ({"img": ulb_entropy_images(b, k)}
                                 for b, k in zip(ulb_loader, keys)),
                                config.left_ratio)
                    logger.log("settings", it, {"conf_thres": conf_thres})
                if feature_fn is not None:
                    # save_feat: dump {idx: [penultimate_feat, entropy]} for
                    # t-SNE analysis (reference agent.py:369-401).
                    import json as _json

                    feats = {}
                    fkeys = sweep_keys(config.seed + 1, it)
                    for b, k in zip(ulb_loader, fkeys):
                        e, f = feature_fn(
                            state, jax.device_put(ulb_entropy_images(b, k)))
                        for bi, ei, fi in zip(b["idx"], np.asarray(e),
                                              np.asarray(f)):
                            feats[str(int(bi))] = [fi.tolist(), float(ei)]
                    feat_path = os.path.join(
                        config.log_dir,
                        f"ulb_feats_iter{it}_thre{conf_thres}.json")
                    with open(feat_path, "w") as fjson:
                        _json.dump(feats, fjson)
                    logger.line(f"saved unlabeled features to {feat_path}")

        epoch += 1

    save_checkpoint(config.model_dir, "last", jax.device_get(state))
    timing = step_timer.summary()
    if timing:
        logger.log("timing", it, timing)
    mem = device_memory_stats()
    if mem:
        logger.line(f"device memory: {mem}")
    logger.line(f"done at iter {int(jax.device_get(state.step))}, "
                f"best err {best_mean_error:.4f}")
    return best_mean_error


def _round_up(n: int, k: int) -> int:
    return int(-(-int(n) // k) * k)


if __name__ == "__main__":
    main(sys.argv[1:])
