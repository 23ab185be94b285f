"""Offline evaluation CLI — parity with /root/reference/eval.py.

Evaluates a checkpoint (student then EMA teacher) on AFLW2000 / BIWItest /
DAD3DHeads-val / synthetic, with the reference's metric fork:

* Euler-GT sets -> per-axis MAE in degrees (eval.py:124-133); when the
  model was trained on DAD3DHeads (full-range), predicted rotations are
  converted through the rot-180 frame + wrapped angles first
  (eval.py:66-74);
* matrix-GT sets -> SO(3) geodesic angle + Frobenius ||I - R1 R2^T||_F
  (eval.py:87-98);
* dumps a per-sample error JSON next to the checkpoint (eval.py:115-142).

Usage: python -m semiuhpe_tpu.cli.evaluate <ckpt_dir> --config ... flags
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.data import Loader
from semiuhpe_tpu.data.datasets import get_dataset
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.ops.laplace import grids_as_device_matrix
from semiuhpe_tpu.parallel import make_mesh, shard_batch, replicate
from semiuhpe_tpu.training.checkpoints import load_checkpoint
from semiuhpe_tpu.training.state import create_train_state
from semiuhpe_tpu.cli.train import pad_to, setup_compile_cache


def euler_from_matrix_dad_convention(rots: np.ndarray) -> np.ndarray:
    """Full-range matrices -> (pitch, yaw, roll) degrees via the reference's
    scipy xyz-extrinsic extraction + limit_angle wrap (eval.py:66-74)."""
    from scipy.spatial.transform import Rotation

    out = []
    for r in rots:
        ax, ay, az = Rotation.from_matrix(np.transpose(r)).as_euler(
            "xyz", degrees=True)
        pitch = so3.limit_angle(ax - 180.0)
        yaw = so3.limit_angle(ay)
        roll = so3.limit_angle(az)
        out.append([pitch, yaw, roll])
    return np.asarray(out, np.float64)


def run_eval(config, state, net, test_loader, mesh, use_ema: bool, grids9):
    """Returns (metrics dict, per-sample arrays)."""
    params = "ema" if use_ema else "student"
    all_pred, all_gt, all_gt_euler, all_idx = [], [], [], []

    @jax.jit
    def forward(state, img):
        p = state.ema_params if use_ema else state.params
        s = state.ema_batch_stats if use_ema else state.batch_stats
        out = net.apply({"params": p, "batch_stats": s}, img, train=False)
        return so3.special_procrustes(out.reshape(-1, 3, 3))

    for batch in test_loader:
        batch, n_valid = pad_to(batch, config.eval_batch_size)
        # device_views configs yield raw uint8 crops with no "img" key;
        # batch_images normalizes them (test transform = plain normalize).
        from semiuhpe_tpu.ops.views import batch_images
        pred = forward(state, batch_images(shard_batch(mesh, batch)))
        all_pred.append(np.asarray(pred)[:n_valid])
        all_gt.append(batch["rot_mat"][:n_valid])
        if "euler_angles" in batch:
            all_gt_euler.append(batch["euler_angles"][:n_valid])
        all_idx.append(batch["idx"][:n_valid])

    pred = np.concatenate(all_pred)
    gt = np.concatenate(all_gt)
    idx = np.concatenate(all_idx)
    metrics = {}
    per_sample = {}

    has_euler_gt = bool(all_gt_euler) and config.test_set.lower() in (
        "aflw2000", "biwitest", "synthetic")
    if has_euler_gt:
        gt_euler = np.concatenate(all_gt_euler)
        if config.train_labeled == "DAD3DHeads":
            pd_euler = euler_from_matrix_dad_convention(pred)
        else:
            pd_euler = np.degrees(np.asarray(
                so3.matrix_to_euler(jnp.asarray(pred), full_range=False)))
        err_axis = np.abs(pd_euler - gt_euler)
        metrics["mae_pitch"] = float(err_axis[:, 0].mean())
        metrics["mae_yaw"] = float(err_axis[:, 1].mean())
        metrics["mae_roll"] = float(err_axis[:, 2].mean())
        metrics["mae_mean"] = float(err_axis.mean())
        per_sample["euler_err"] = err_axis.mean(-1)
    # Always report the rotation-space metrics too.
    ang = np.degrees(np.asarray(so3.relative_angle(jnp.asarray(pred), jnp.asarray(gt))))
    fro = np.asarray(so3.frobenius_rot_distance(jnp.asarray(pred), jnp.asarray(gt)))
    metrics["angle_err_deg"] = float(ang.mean())
    metrics["frobenius"] = float(fro.mean())
    per_sample["angle_err"] = ang
    per_sample["frobenius"] = fro
    per_sample["idx"] = idx
    return metrics, per_sample


def main(argv=None):
    setup_compile_cache()
    config = get_config("test", argv)
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    config.eval_batch_size = -(-config.eval_batch_size // n_dev) * n_dev

    test_set = get_dataset(config.test_set, "test", config)
    test_loader = Loader(test_set, config.eval_batch_size, shuffle=False,
                         drop_last=False, num_workers=config.num_workers)

    net = build_network(config.network, num_outputs=config.num_classes, dtype=dtype)
    grids9 = (grids_as_device_matrix(config.rl_grid_level, config.rl_grid_mode,
                                     file=config.rl_grid_file)
              if config.distribution == "RotationLaplace" else None)
    with jax.default_device(jax.devices()[0]):
        template = jax.jit(lambda k: create_train_state(
            net, k, (config.input_size, config.input_size, 3), config.lr, dtype)
        )(jax.random.key(0))
    assert config.test_ckpt, "pass a checkpoint directory"
    state = load_checkpoint("", config.test_ckpt, template)
    state = replicate(mesh, state)

    results = {}
    for use_ema in (False, True):
        tag = "ema" if use_ema else "student"
        metrics, per_sample = run_eval(config, state, net, test_loader, mesh,
                                       use_ema, grids9)
        results[tag] = metrics
        print(f"[{tag}] " + " ".join(f"{k}:{v:.4f}" for k, v in metrics.items()),
              flush=True)
        dump = {str(int(i)): float(e) for i, e in
                zip(per_sample["idx"], per_sample["angle_err"])}
        out_json = os.path.join(os.path.dirname(os.path.abspath(config.test_ckpt)),
                                f"errors_{config.test_set}_{tag}.json")
        with open(out_json, "w") as f:
            json.dump(dump, f)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
