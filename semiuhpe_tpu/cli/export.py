"""Serving export: freeze a trained pose model to a StableHLO artifact.

Beyond-reference capability for production deployment: the checkpoint's
inference path (normalize -> backbone(eval) -> A -> orthogonalized R) is
exported with ``jax.export`` to a serialized StableHLO function that any
PJRT runtime (TPU/GPU/CPU serving stack) can load without Python or flax.
RepVGG checkpoints are structurally re-parameterized to the fused
deploy-mode convs first (models/repvgg.py).

Usage:
    python -m semiuhpe_tpu.cli.export <ckpt_dir> --network effinetv2 \
        --out model_stablehlo.bin [--serve_batch 32] [--use_ema true]

Verification round-trip happens in-process: the deserialized artifact is
called and compared against the live model.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.config import get_config, str2bool
from semiuhpe_tpu.models import build_network
from semiuhpe_tpu.ops import so3
from semiuhpe_tpu.training.checkpoints import load_checkpoint
from semiuhpe_tpu.training.state import create_train_state
from semiuhpe_tpu.cli.train import setup_compile_cache


def main(argv=None):
    setup_compile_cache()
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", type=str, default="pose_model_stablehlo.bin")
    extra.add_argument("--serve_batch", type=int, default=32)
    extra.add_argument("--use_ema", type=str2bool, default=False)
    args, rest = extra.parse_known_args(argv)

    config = get_config("test", rest)
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    size = config.input_size

    net = build_network(config.network, num_outputs=config.num_classes,
                        dtype=dtype)
    with jax.default_device(jax.devices()[0]):
        template = jax.jit(lambda k: create_train_state(
            net, k, (size, size, 3), config.lr, dtype))(jax.random.key(0))
    assert config.test_ckpt, "pass a checkpoint directory"
    state = load_checkpoint("", config.test_ckpt, template)

    params = state.ema_params if args.use_ema else state.params
    stats = state.ema_batch_stats if args.use_ema else state.batch_stats

    if config.network == "repvgg":
        from semiuhpe_tpu.models.repvgg import reparameterize_params

        deploy_params = reparameterize_params(params, stats)
        stats = {k: v for k, v in stats.items()
                 if not k.startswith("RepVGGBlock")}
        params = deploy_params
        net = build_network("repvgg", num_outputs=config.num_classes,
                            dtype=dtype, deploy=True)

    variables = {"params": params, "batch_stats": stats}

    def serve(img):
        """(B, S, S, 3) normalized float32 -> (B, 3, 3) rotations + (B, 9) A."""
        out = net.apply(variables, img.astype(dtype), train=False)
        rot = so3.special_procrustes(out.reshape(-1, 3, 3))
        return rot, out

    from jax import export as jexport

    from semiuhpe_tpu.models.tinyvit import pallas_attn_mode

    spec = jax.ShapeDtypeStruct((args.serve_batch, size, size, 3), jnp.float32)
    # Trace with the Pallas attention forced off: a Mosaic custom call
    # baked into the artifact is not portable StableHLO (jax.export
    # rejects no-compatibility-guarantee custom calls).
    with pallas_attn_mode("off"):
        exported = jexport.export(jax.jit(serve))(spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)

    # Round-trip verification.
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(args.serve_batch, size, size, 3)).astype(np.float32))
    with pallas_attn_mode("off"):
        live_rot, _ = serve(x)
    reloaded = jexport.deserialize(blob)
    exp_rot, _ = reloaded.call(x)
    np.testing.assert_allclose(np.asarray(exp_rot), np.asarray(live_rot),
                               atol=1e-3)
    print(f"exported {len(blob)/1e6:.1f} MB StableHLO -> {args.out} "
          f"(round-trip verified, batch {args.serve_batch})")
    return args.out


if __name__ == "__main__":
    main(sys.argv[1:])
