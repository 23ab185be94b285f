"""Pre-pack the synthetic pools for a ladder run (one-time, cached).

Packing renders each sample once in Python (data/packed.py); doing it
ahead of time in a niced background process keeps the train processes'
startup at memmap-gather speed.  Usage:

    python scripts/prepack_synthetic.py /tmp/pack_r2_224 \
        --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625 \
        --synthetic_test_size 2048
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cache_dir")
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--synthetic_size", type=int, default=16384)
    ap.add_argument("--ss_ratio", type=float, default=0.015625)
    ap.add_argument("--synthetic_test_size", type=int, default=2048)
    ap.add_argument("--phases", nargs="*",
                    default=["train", "ulb_train", "test"])
    args = ap.parse_args()

    class Cfg:
        input_size = args.input_size
        synthetic_size = args.synthetic_size
        ss_ratio = args.ss_ratio
        synthetic_test_size = args.synthetic_test_size
        device_views = True
        rotate_aug = False
        is_full_range = False

    from semiuhpe_tpu.data.datasets import get_dataset
    from semiuhpe_tpu.data.packed import is_packed, pack_dataset

    for phase in args.phases:
        ds = get_dataset("synthetic", phase, Cfg())
        d = os.path.join(args.cache_dir,
                         f"synthetic_{phase}_s{args.input_size}")
        if is_packed(d):
            print(f"{d}: already packed ({len(ds)})", flush=True)
            continue
        print(f"packing {phase} ({len(ds)} samples) -> {d}", flush=True)
        pack_dataset(ds, d)
    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
