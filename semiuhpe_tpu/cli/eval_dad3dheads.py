"""DAD-3DHeads test-set submission generator.

Parity with /root/reference/eval_DAD3DHeads.py: iterate the test split's
``test.json``, crop each head with the fixed ad = 0.15 center-based bbox
crop, run the pose net, orthogonalize A -> R, and emit the benchmark
submission JSON ``{item_id: {rotation_matrix: [[...]], ...}}``.

TPU-native difference: crops are batched (the reference runs one image per
forward) — the whole test set streams through a jitted batch forward.

Usage: python -m semiuhpe_tpu.cli.eval_dad3dheads <ckpt_dir> \
           --data_dir_DAD3DHeads ... --network effinetv2
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from semiuhpe_tpu.config import get_config
from semiuhpe_tpu.data.augments_host import normalize
from semiuhpe_tpu.data.crops import head_crop_from_bbox
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.training.checkpoints import load_checkpoint
from semiuhpe_tpu.training.state import create_train_state
from semiuhpe_tpu.cli.train import setup_compile_cache


def main(argv=None):
    setup_compile_cache()
    config = get_config("test", argv)
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

    net = build_network(config.network, num_outputs=config.num_classes, dtype=dtype)
    with jax.default_device(jax.devices()[0]):
        template = jax.jit(lambda k: create_train_state(
            net, k, (config.input_size, config.input_size, 3), config.lr, dtype)
        )(jax.random.key(0))
    assert config.test_ckpt, "pass a checkpoint directory"
    state = load_checkpoint("", config.test_ckpt, template)

    use_ema = getattr(config, "eval_ema", False)
    params = state.ema_params if use_ema else state.params
    stats = state.ema_batch_stats if use_ema else state.batch_stats

    @jax.jit
    def forward(img):
        out = net.apply({"params": params, "batch_stats": stats}, img, train=False)
        return so3.special_procrustes(out.reshape(-1, 3, 3))

    db = config.data_dir_DAD3DHeads
    items = json.load(open(os.path.join(db, "test", "test.json")))
    size = config.input_size
    batch_size = config.eval_batch_size

    results = {}
    buf, ids = [], []

    def flush():
        if not buf:
            return
        arr = np.stack(buf)
        n = len(arr)
        if n < batch_size:  # pad to avoid retraces
            arr = np.concatenate([arr, np.repeat(arr[-1:], batch_size - n, 0)])
        rots = np.asarray(forward(jnp.asarray(arr)))[:n]
        for item_id, rot in zip(ids, rots):
            results[item_id] = {
                "68_landmarks_2d": [], "N_landmarks_3d": [], "7_landmarks_3d": [],
                "rotation_matrix": rot.tolist(),
            }
        buf.clear()
        ids.clear()

    for item in items:
        item_id = item["item_id"]
        img_path = os.path.join(db, "test", "images", item_id + ".png")
        img = Image.open(img_path).convert("RGB")
        crop = head_crop_from_bbox(img, item["bbox"], ad=0.15, out_size=size,
                                   top_scale=1.0)
        buf.append(normalize(crop).astype(np.float32))
        ids.append(item_id)
        if len(buf) == batch_size:
            flush()
    flush()

    name = config.network + "_"
    if "Dyna" in config.exp_detail:
        name += "SemiUHPE"
    elif "r0.05" in config.exp_detail:
        name += "Baseline"
    else:
        name += "Supervised"
    out_path = os.path.join(config.exp_dir, f"testset_results_{name}.json")
    os.makedirs(config.exp_dir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print(f"wrote {len(results)} predictions to {out_path}")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1:])
