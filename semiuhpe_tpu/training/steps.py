"""Pure train/eval step functions — the heart of the SSL framework.

Functional re-design of the reference SSLAgent
(/root/reference/src/agent.py:61-274).  Every step is a pure function
``(state, batch, ...) -> (state, metrics)`` meant to be jit/pjit-compiled
once and executed entirely on device:

* supervised NLL (matrix-Fisher or Rotation-Laplace) on the labeled batch;
* EMA teacher update with the warmup rule ``alpha = min(1 - 1/(t+1),
  decay)`` applied *before* the gradient step (agent.py:194-200,277-284);
* teacher scoring of weakly-augmented unlabeled crops with the
  rotation-consistency adjustment for pose-altering strong rotation
  (agent.py:110-120, incl. the 300WLP rot-180 conjugation);
* on-device CutOut/CutMix of the strong crops (agent.py:125-126);
* Fisher-entropy confidence masking at ``conf_thres`` and the Fisher-CE
  (or NLL) consistency loss scaled by mask ratio so it is a mean over the
  full unlabeled batch (agent.py:148-168) — expressed as a masked global
  sum, which under pjit shards correctly with no manual psum.

Unlike the reference there is no CPU round-trip anywhere: SVDs, the Fisher
normalizer quadrature, entropies and CE all run inside the same XLA
program as the backbone.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from semiuhpe_tpu.ops import fisher, laplace, so3
from semiuhpe_tpu.ops.augment import random_cutmix, random_cutout
from semiuhpe_tpu.ops.views import make_views
from semiuhpe_tpu.training.state import (TrainState, apply_optimizer,
                                          make_optimizer)

# numpy (not jnp) so importing this module never initializes a backend.
ROT_180 = np.diag([1.0, -1.0, -1.0]).astype(np.float32)


def error_degrees(pred_rot, gt_rot, gt_euler=None):
    """Per-sample error in degrees: Euler MAE when Euler GT exists (front
    range), geodesic SO(3) angle otherwise (agent.py:447-455)."""
    if gt_euler is None:
        return jnp.degrees(so3.relative_angle(pred_rot, gt_rot))
    pd_euler = jnp.degrees(so3.matrix_to_euler(pred_rot, full_range=False))
    return jnp.mean(jnp.abs(pd_euler - gt_euler), axis=-1)


def _net_forward(net, params, batch_stats, img, rng):
    """Train-mode forward returning (output, updated batch_stats).

    SEMIUHPE_REMAT=1 wraps the apply in ``jax.checkpoint`` (full
    rematerialization: the backward recomputes the forward instead of
    reloading saved activations from HBM) — a measured A/B knob for the
    backward-pass HBM-traffic hypothesis (BENCH_NOTES rejection/keep
    table decides the default)."""
    import os as _os

    def apply(params, batch_stats, img):
        out, mutated = net.apply({"params": params, "batch_stats": batch_stats},
                                 img, train=True, rngs={"dropout": rng},
                                 mutable=["batch_stats"])
        return out, mutated["batch_stats"]

    if _os.environ.get("SEMIUHPE_REMAT") == "1":
        apply = jax.checkpoint(apply)
    return apply(params, batch_stats, img)


def _supervised_loss(net, params, batch_stats, batch, rng, distribution, grids9,
                     train=True):
    """Returns (loss, (per-sample nll, pred, pred_orth, new_batch_stats))."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = net.apply(variables, batch["img"], train=True,
                                 rngs={"dropout": rng}, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = net.apply(variables, batch["img"], train=False)
        new_stats = batch_stats
    if distribution == "RotationLaplace":
        losses, pred_orth = laplace.laplace_nll(out, batch["rot_mat"], grids9)
    else:
        losses, pred_orth = fisher.fisher_nll(out, batch["rot_mat"], overreg=1.025)
    return jnp.mean(losses), (out, pred_orth, new_stats)


def labeled_device_views(rng, batch, weak_aug: bool = True):
    """Weak view + 50% flip of a labeled raw-crop batch, on device.

    Mirrors process_annotated_image (dataset_300WLP.py:103-125): flip
    negates yaw/roll — in matrix form R' = F R F (ops.so3.flip_rotation) —
    then 5% blur + RandomResizedCrop(0.8, 1.25) + normalize.

    ``weak_aug=False`` (the DAD3DHeads labeled side, which takes no view
    augmentation) only normalizes the raw crop.
    """
    from semiuhpe_tpu.ops.views import normalize_u8

    if not weak_aug:
        new = dict(batch)
        new["img"] = normalize_u8(new.pop("img_raw"))
        return new
    views = make_views(rng, batch["img_raw"], batch["img_raw"].shape[1],
                       make_strong=False)
    flip = views["flip"]
    new = dict(batch)
    new.pop("img_raw")
    new["img"] = views["img"]
    new["rot_mat"] = jnp.where(flip[:, None, None],
                               so3.flip_rotation(batch["rot_mat"]),
                               batch["rot_mat"])
    if "euler_angles" in batch:
        sign = jnp.where(flip[:, None],
                         jnp.asarray([1.0, -1.0, -1.0], jnp.float32),
                         jnp.ones((3,), jnp.float32))
        new["euler_angles"] = batch["euler_angles"] * sign
    return new


def make_supervised_step(net, lr: float, distribution: str = "matrixFisher",
                         grids9=None, grad_clip: float = 0.0,
                         device_views: bool = False,
                         labeled_weak_aug: bool = True) -> Callable:
    """Stage-1 supervised step (reference train_func_s1, agent.py:254-266)."""
    tx = make_optimizer(lr, grad_clip)

    def step(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        if device_views:
            rng, rng_lv = jax.random.split(rng)
            batch = labeled_device_views(rng_lv, batch, labeled_weak_aug)

        def loss_fn(params):
            return _supervised_loss(net, params, state.batch_stats, batch, rng,
                                    distribution, grids9)

        (loss, (out, pred_orth, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state = apply_optimizer(tx, grads, state.opt_state,
                                            state.params)
        err = error_degrees(pred_orth, batch["rot_mat"], batch.get("euler_angles"))
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        metrics = {"loss": loss, "err_deg": jnp.mean(err),
                   "lr": opt_state.hyperparams["learning_rate"]}
        return new_state, metrics

    return step


def ema_update(params, ema_params, alpha):
    return jax.tree_util.tree_map(
        lambda e, p: e * alpha + p * (1.0 - alpha), ema_params, params)


def adjust_teacher_prediction(pred_a, aug_rot_mat, labeled_set: str):
    """Rotation-consistency adjustment of the teacher Fisher parameter for
    pose-altering strong rotation (agent.py:110-120).

    DAD3DHeads convention: A' = R_aug A.  300WLP convention (labels live in
    a flipped frame): A' = A R_180 R_aug^T R_180.
    """
    a = pred_a.reshape(-1, 3, 3)
    if labeled_set == "300WLP":
        adj = ROT_180 @ jnp.swapaxes(aug_rot_mat, -1, -2) @ ROT_180
        out = jnp.matmul(a, adj)
    else:
        out = jnp.matmul(aug_rot_mat, a)
    return out.reshape(pred_a.shape)


def make_ssl_step(
    net,
    lr: float,
    *,
    distribution: str = "matrixFisher",
    type_unsuper: str = "ce",
    labeled_set: str = "300WLP",
    rotate_aug: bool = False,
    cutout_aug: bool = False,
    cutmix_aug: bool = False,
    is_ema: bool = True,
    eman: bool = False,
    ema_decay: float = 0.999,
    stage1_iteration: int = 0,
    grids9=None,
    with_diagnostics: bool = True,
    grad_clip: float = 0.0,
    device_views: bool = False,
) -> Callable:
    """Stage-2 SSL step (reference train_func + forward, agent.py:61-218).

    Returned callable: ``step(state, batch, ulb_batch, rng, conf_thres,
    ssl_lambda) -> (state, metrics)``; conf_thres/ssl_lambda are traced
    scalars so the dynamic threshold never retraces.

    ``with_diagnostics=False`` drops the SVD-orthogonalization-based error
    metrics (err_weakAll_gt / err_weakPseudo_gt / err_strongSuper_pseudo +
    the labeled err_deg) — ~9% of the step cost that only feeds logging;
    the train CLI uses the diagnostic variant on log steps only.
    """
    tx = make_optimizer(lr, grad_clip)

    def step(state: TrainState, batch, ulb_batch, rng, conf_thres, ssl_lambda):
        (rng_teacher, rng_student, rng_sup, rng_cutout, rng_cutmix,
         rng_views, rng_lviews) = jax.random.split(rng, 7)

        if device_views:
            # Unlabeled weak/strong views generated on device from the raw
            # uint8 crop (ops/views.py); labels adjusted with the device-
            # sampled aug_rot_mat exactly like the host pipeline
            # (dataset_300WLP.py:195-201).  The 50% base flip hits both
            # views, so only the (diagnostic) GT needs the F R F adjust.
            views = make_views(rng_views, ulb_batch["img_raw"],
                               ulb_batch["img_raw"].shape[1],
                               rotate_aug=rotate_aug)
            new_ulb = {"img": views["img"], "img_strong": views["img_strong"],
                       "aug_rot_mat": views["aug_rot_mat"]}
            if "rot_mat" in ulb_batch:
                gt = jnp.where(views["flip"][:, None, None],
                               so3.flip_rotation(ulb_batch["rot_mat"]),
                               ulb_batch["rot_mat"])
                new_ulb["rot_mat"] = jnp.matmul(views["aug_rot_mat"], gt)
            ulb_batch = new_ulb
            if "img_raw" in batch:
                batch = labeled_device_views(rng_lviews, batch,
                                             labeled_set != "DAD3DHeads")

        # --- EMA teacher update (before fwd/bwd, warmup keyed to stage-2 iter).
        stage2_iter = state.step - stage1_iteration
        if is_ema:
            alpha = jnp.minimum(
                1.0 - 1.0 / (stage2_iter.astype(jnp.float32) + 1.0), ema_decay)
        else:
            alpha = 0.0
        ema_params = ema_update(state.params, state.ema_params, alpha)
        if eman:
            # EMAN (agent.py:286-296): EMA the full state incl. BN statistics.
            ema_batch_stats = ema_update(state.batch_stats,
                                         state.ema_batch_stats, alpha)
        else:
            ema_batch_stats = state.ema_batch_stats

        # --- Teacher scores weak unlabeled crops (train-mode BN, stats
        # tracked on the teacher's own statistics like the reference's
        # ema_net.train() forward).
        pred_weak, t_mutated = net.apply(
            {"params": ema_params, "batch_stats": ema_batch_stats},
            ulb_batch["img"], train=True, rngs={"dropout": rng_teacher},
            mutable=["batch_stats"])
        pred_weak = jax.lax.stop_gradient(pred_weak)
        ema_batch_stats = t_mutated["batch_stats"]

        if rotate_aug:
            pred_weak_adj = adjust_teacher_prediction(
                pred_weak, ulb_batch["aug_rot_mat"], labeled_set)
        else:
            pred_weak_adj = pred_weak

        # --- Strong-view occlusion augs, on device.
        ulb_strong = ulb_batch["img_strong"]
        if cutout_aug:
            ulb_strong = random_cutout(rng_cutout, ulb_strong, 3)
        if cutmix_aug:
            ulb_strong = random_cutmix(rng_cutmix, ulb_strong, 3)

        # --- Confidence mask from teacher Fisher entropy.  On the flagship
        # matrixFisher+CE recipe the fused teacher-stats path computes the
        # entropy, the pseudo-rotation mode, and the cached Bingham CE target
        # from ONE proper SVD + ONE normalizer quadrature pass (equivalence
        # tested in tests/test_fisher.py::TestFusedSSLPaths).  The entropy is
        # a function of singular values only, so computing it on the
        # rotation-adjusted A is identical to the reference's un-adjusted one.
        import os as _os
        fused = (distribution != "RotationLaplace" and type_unsuper == "ce"
                 and _os.environ.get("SEMIUHPE_NO_FUSED") != "1")
        n_ulb = pred_weak.shape[0]
        if fused:
            entropy, pseudo_rot, ce_target = fisher.fisher_teacher_stats(
                pred_weak_adj)
        else:
            entropy = fisher.fisher_entropy(pred_weak)
            pseudo_rot = so3.special_procrustes(pred_weak_adj.reshape(-1, 3, 3))
        mask = (entropy < conf_thres).astype(jnp.float32)
        mask_ratio = jnp.mean(mask)

        def loss_fn(params):
            if fused:
                # Labeled NLL + strong-view CE share one concatenated SVD and
                # one normalizer quadrature (custom-VJP bwd included).
                out, new_stats = _net_forward(net, params, state.batch_stats,
                                              batch["img"], rng_sup)
                pred_strong, strong_stats = _net_forward(
                    net, params, new_stats, ulb_strong, rng_student)
                nll, per_sample, pred_orth = fisher.fisher_nll_and_cross_entropy(
                    out, batch["rot_mat"], pred_strong, ce_target, overreg=1.025)
                sup_loss = jnp.mean(nll)
            else:
                sup_loss, (out, pred_orth, new_stats) = _supervised_loss(
                    net, params, state.batch_stats, batch, rng_sup, distribution,
                    grids9)
                pred_strong, s_mutated = net.apply(
                    {"params": params, "batch_stats": new_stats}, ulb_strong,
                    train=True, rngs={"dropout": rng_student},
                    mutable=["batch_stats"])
                strong_stats = s_mutated["batch_stats"]
                if type_unsuper == "ce":
                    per_sample = fisher.fisher_cross_entropy(
                        pred_weak_adj, pred_strong)
                else:  # 'nll'
                    if distribution == "RotationLaplace":
                        per_sample, _ = laplace.laplace_nll(
                            pred_strong, pseudo_rot, grids9)
                    else:
                        per_sample, _ = fisher.fisher_nll(
                            pred_strong, pseudo_rot, overreg=1.025)
            # mean-over-masked * mask_ratio  ==  masked-sum / batch size
            # (agent.py:163-168) — shard-safe as a plain global sum.
            unsuper_loss = jnp.sum(per_sample * mask) / n_ulb
            total = sup_loss + ssl_lambda * unsuper_loss
            aux = (sup_loss, unsuper_loss, pred_orth, pred_strong, strong_stats)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        sup_loss, unsuper_loss, pred_orth, pred_strong, new_stats = aux
        params, opt_state = apply_optimizer(tx, grads, state.opt_state,
                                            state.params)

        metrics = {
            "loss": sup_loss,
            "unsuper_loss": unsuper_loss,
            "loss_all": total,
            "entropy_mean": jnp.mean(entropy),
            "entropy_std": jnp.std(entropy),
            "mask_ratio": mask_ratio,
            "lr": opt_state.hyperparams["learning_rate"],
        }
        if with_diagnostics:
            err = error_degrees(pred_orth, batch["rot_mat"],
                                batch.get("euler_angles"))
            metrics["err_deg"] = jnp.mean(err)
            # Diagnostics vs unlabeled GT when present (agent.py:171-181).
            if "rot_mat" in ulb_batch:
                e_all = error_degrees(pseudo_rot, ulb_batch["rot_mat"])
                metrics["err_weakAll_gt"] = jnp.mean(e_all)
                metrics["err_weakPseudo_gt"] = (
                    jnp.sum(e_all * mask) / jnp.maximum(jnp.sum(mask), 1.0))
            strong_rot = so3.special_procrustes(pred_strong.reshape(-1, 3, 3))
            e_sp = error_degrees(strong_rot, pseudo_rot)
            metrics["err_strongSuper_pseudo"] = (
                jnp.sum(e_sp * mask) / jnp.maximum(jnp.sum(mask), 1.0))

        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            ema_params=ema_params, ema_batch_stats=ema_batch_stats,
            opt_state=opt_state)
        return new_state, metrics

    return step


def make_eval_step(net, distribution: str = "matrixFisher", grids9=None,
                   use_ema: bool = False) -> Callable:
    """Validation step (reference val_func/val_func_s1, agent.py:220-274):
    eval-mode forward, NLL, entropy mask ratio, per-sample errors."""

    def step(state: TrainState, batch, conf_thres):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats
        if "img" in batch:
            img = batch["img"]
        else:
            # Packed/raw test batches ship uint8 base crops; the test-time
            # transform is deterministic (crop -> resize -> normalize, no
            # stochastic views — reference test pipeline), so normalizing
            # on device is the whole of it.
            from semiuhpe_tpu.ops.views import normalize_u8

            img = normalize_u8(batch["img_raw"])
        out = net.apply({"params": params, "batch_stats": stats},
                        img, train=False)
        if distribution == "RotationLaplace":
            losses, pred_orth = laplace.laplace_nll(out, batch["rot_mat"], grids9)
        else:
            losses, pred_orth = fisher.fisher_nll(out, batch["rot_mat"], overreg=1.025)
        err = error_degrees(pred_orth, batch["rot_mat"], batch.get("euler_angles"))
        entropy = fisher.fisher_entropy(out)
        mask = (entropy < conf_thres).astype(jnp.float32)
        return {
            "loss": jnp.mean(losses),
            "losses": losses,  # per-sample: lets callers ignore eval padding
            "err_deg": err,
            "pred": out,
            "pred_orth": pred_orth,
            "entropy": entropy,
            "mask_ratio": jnp.mean(mask),
        }

    return step


def make_entropy_fn(net, use_ema: bool = True) -> Callable:
    """Teacher entropy of a weak batch — the building block of the dynamic
    threshold sweep (reference compute_dynamic_entropy_threshold,
    agent.py:357-417); the global sort/quantile happens on the host over
    gathered entropies."""

    def entropies(state: TrainState, img):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats
        out = net.apply({"params": params, "batch_stats": stats}, img, train=False)
        return fisher.fisher_entropy(out)

    return entropies


def make_feature_entropy_fn(net, use_ema: bool = True) -> Callable:
    """Teacher entropy + penultimate head feature per sample — the
    ``save_feat`` t-SNE dump capability (reference registers a forward hook
    on the second-to-last head Linear, agent.py:369-401).

    The feature is the explicit ``penultimate_feature`` handle that
    models.layers.RegressionHead sows into the ``intermediates``
    collection — no guessing at module names or Dense nesting; a backbone
    whose head lacks the handle (or that somehow exposes two heads) fails
    loudly here rather than silently dumping the wrong layer."""

    def fn(state: TrainState, img):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats
        out, mod = net.apply(
            {"params": params, "batch_stats": stats}, img, train=False,
            mutable=["intermediates"])

        def find_feats(tree, hits):
            for k, v in tree.items():
                if k == "penultimate_feature":
                    hits.append(v)
                elif isinstance(v, dict):
                    find_feats(v, hits)
            return hits

        hits = find_feats(mod.get("intermediates", {}), [])
        if len(hits) != 1:
            raise ValueError(
                f"expected exactly one sown penultimate_feature, found "
                f"{len(hits)} — does this backbone's head use "
                "models.layers.RegressionHead?")
        feat = hits[0][0]  # sow stores a tuple of sown values
        return fisher.fisher_entropy(out), feat

    return fn


def dynamic_entropy_threshold(entropy_fn, state, batches, left_ratio: float) -> float:
    """Full teacher pass over the unlabeled set; threshold = left_ratio
    quantile of the sorted entropies (keep the most-confident fraction)."""
    import numpy as np

    all_e = [np.asarray(entropy_fn(state, b["img"])) for b in batches]
    e = np.sort(np.concatenate(all_e))
    index = int(len(e) * left_ratio)
    return float(e[min(index, len(e) - 1)])


def pooled_entropy_threshold(entropy_pool, state, pool_arrays, n: int,
                             chunk: int, keys, left_ratio: float,
                             put_idx=None) -> float:
    """``--device_data`` twin of :func:`dynamic_entropy_threshold`: same
    quantile semantics (reference compute_dynamic_entropy_threshold,
    agent.py:357-417), but entropies are scored by in-program pool gathers
    — only int32 index vectors cross the host↔device tunnel.  The tail
    chunk is padded by repeating its last index and trimmed after the
    fetch so every dispatch has the same static shape.  ``put_idx``
    pre-places each index vector (e.g. ``jax.device_put`` with the mesh
    batch sharding); ``keys`` yields one view rng per chunk.

    Equivalence with the host-gather path is asserted at WildHead scale
    (>=400k entropies) in tests/test_sweep_scale.py."""
    import numpy as np

    ents = []
    for start in range(0, n, chunk):
        idx = np.arange(start, min(start + chunk, n))
        nv = len(idx)
        if nv < chunk:
            idx = np.concatenate([idx, np.full(chunk - nv, idx[-1])])
        idx = idx.astype(np.int32)
        if put_idx is not None:
            idx = put_idx(idx)
        e = entropy_pool(state, pool_arrays, idx, next(keys))
        ents.append(np.asarray(e)[:nv])
    e = np.sort(np.concatenate(ents))
    index = int(len(e) * left_ratio)
    return float(e[min(index, len(e) - 1)])
