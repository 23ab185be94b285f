"""Config system: YAML defaults + CLI overrides + experiment directories.

Capability parity with /root/reference/src/config.py (configargparse +
settings/*.yml): the same flag surface (dataset dirs, backbone choice, SSL
knobs, test options), the derived ``exp_detail`` run name encoding the
ablation flags, ``exps/<exp_name>/<exp_detail>/<date>/`` directory layout
with log/model subdirs, a full config + source snapshot into ``log.txt``
for reproducibility, and ``--cont_ckpt`` resume addressing.

Implementation is plain argparse + PyYAML (configargparse is not in this
image); ``--config settings/x.yml`` supplies defaults, CLI flags win.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import yaml


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0", "none"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def build_parser(phase: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SemiUHPE-TPU")
    p.add_argument("--config", type=str, default=None,
                   help="YAML file with default values (settings/*.yml)")
    if phase == "test":
        p.add_argument("test_ckpt", type=str, nargs="?", default=None,
                       help="checkpoint path or exp_detail/date/name")

    # basic
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--exp_dir", type=str, default="exps")
    p.add_argument("--date", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cont_ckpt", type=str, default=None,
                   help="exp_detail/date/ckpt_name to continue training from")

    # dataset dirs
    p.add_argument("--data_dir_300WLP", type=str, default="")
    p.add_argument("--data_dir_AFLW2000", type=str, default="")
    p.add_argument("--data_dir_DAD3DHeads", type=str, default="")
    p.add_argument("--data_dir_COCOHead", type=str, default="")
    p.add_argument("--data_dir_WildHead", type=str, default="")
    p.add_argument("--data_dir_CrowdHuman", type=str, default="")
    p.add_argument("--data_dir_WiderFace", type=str, default="")
    p.add_argument("--data_dir_AFLWFace", type=str, default="")
    p.add_argument("--data_dir_BIWItrain", type=str, default="")
    p.add_argument("--data_dir_BIWItest", type=str, default="")

    # task
    p.add_argument("--train_labeled", type=str, default="300WLP")
    p.add_argument("--train_unlabeled", type=str, default="300WLP")
    p.add_argument("--test_set", type=str, default="AFLW2000")
    p.add_argument("--ss_ratio", type=float, default=0.05)
    p.add_argument("--is_full_range", type=str2bool, default=False)
    p.add_argument("--num_classes", type=int, default=9)

    # network
    p.add_argument("--network", type=str, default="resnet50",
                   help="mobilenet|resnet18|resnet50|repvgg|effinetv2|effinet|tinyvit")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   help="compute dtype: float32|bfloat16")
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch .pth/.pt checkpoint to initialize the backbone "
                        "trunk from (torchvision resnet/efficientnet_v2 or "
                        "official RepVGG layout; the regression head keeps "
                        "its fresh init, reference networks.py:301-331)")

    # training
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip; 0 disables (reference "
                        "behavior)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--loader", type=str, default="threads",
                   choices=["threads", "shm"],
                   help="train-loader backend: 'threads' (PIL/cv2 release "
                        "the GIL) or 'shm' (spawn workers + shared-memory "
                        "batch ring, data/shm_loader.py — scales decode "
                        "across cores with zero per-sample IPC)")
    p.add_argument("--stage1_iteration", type=int, default=50000)
    p.add_argument("--max_iteration", type=int, default=150000)
    p.add_argument("--log_frequency", type=int, default=100)
    p.add_argument("--val_frequency", type=int, default=1000)
    p.add_argument("--save_frequency", type=int, default=10000)
    p.add_argument("--ckpt_frequency", type=int, default=0,
                   help="minimum iterations between rolling `latest` "
                        "crash-recovery checkpoints (interval-checked at "
                        "val boundaries, so any value works); 0 = every "
                        "val.  On a relay-attached TPU each save costs a "
                        "full-state D2H fetch (~tens of seconds), which "
                        "dominates wall time when vals are frequent.")

    # SSL
    p.add_argument("--SSL_lambda", type=float, default=1.0)
    p.add_argument("--ulb_batch_ratio", type=float, default=4)
    p.add_argument("--conf_thres", type=float, default=-5.3)
    p.add_argument("--is_ema", type=str2bool, default=True)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--eman", type=str2bool, default=False)
    p.add_argument("--type_unsuper", type=str, default="ce", choices=["ce", "nll"])
    p.add_argument("--distribution", type=str, default="matrixFisher",
                   choices=["matrixFisher", "RotationLaplace"])
    p.add_argument("--rl_grid_level", type=int, default=2,
                   help="RotationLaplace SO(3) grid HEALPix level: 2 = 4608 "
                        "points (the reference's active choice, "
                        "agent.py:43-58), 3 = 36864, 4 = 294912 (generated, "
                        "not loaded from .npy blobs)")
    p.add_argument("--rl_grid_file", type=str, default=None,
                   help="load the RotationLaplace SO(3) quadrature grid "
                        "from this .npy blob (the reference's eq_grids*.npy "
                        "format, agent.py:43-58) instead of generating it — "
                        "for bit-parity runs on the exact reference point "
                        "set; overrides --rl_grid_level")
    p.add_argument("--rl_grid_mode", type=str, default="full",
                   choices=["full", "front", "large", "half"],
                   help="RotationLaplace grid range filter (reference "
                        "filter_grids.py subsets: front <90deg of the "
                        "frontal basis ~18%%, large <100deg ~24%%, half "
                        "<median 50%%)")
    p.add_argument("--dynamic_thres", type=str2bool, default=False)
    p.add_argument("--sweep_after_warmup", type=str2bool, default=False,
                   help="delay the first dynamic-threshold sweep by one "
                        "save_frequency period into stage 2, so it scores "
                        "with a warmed-up teacher (the reference runs the "
                        "first sweep against the just-reloaded teacher at "
                        "the stage boundary, train.py:242-251 — faithfully "
                        "reproduced when false)")
    p.add_argument("--stage2_lr_scale", type=float, default=0.1,
                   help="stage-boundary LR multiplier; 0.1 reproduces the "
                        "reference's hardcoded x0.1 drop (train.py:104-109), "
                        "1.0 keeps the stage-1 LR (useful on compressed "
                        "schedules where stage-1 overfits scarce labels and "
                        "stage-2 consistency needs a live learning rate)")
    p.add_argument("--left_ratio", type=float, default=0.95)
    p.add_argument("--std_ratio", type=float, default=2.0,
                   help="legacy mean+k*std thresholding (defective in ref)")
    p.add_argument("--rotate_aug", type=str2bool, default=False)
    p.add_argument("--cutout_aug", type=str2bool, default=False)
    p.add_argument("--cutmix_aug", type=str2bool, default=False)
    p.add_argument("--save_feat", type=str2bool, default=False)
    p.add_argument("--device_views", type=str2bool, default=False,
                   help="generate labeled+unlabeled train views on device "
                        "from raw uint8 crops (ops/views.py): 50% flip with "
                        "F R F label adjust, 5% blur, RandomResizedCrop, "
                        "normalize — near-zero host work per sample; "
                        "rotate_aug uses the (slower) device warp")
    p.add_argument("--packed_cache", type=str, default=None,
                   help="directory for decode-once packed uint8 crop caches "
                        "(data/packed.py); built on first use per "
                        "dataset/phase/size; requires --device_views")
    p.add_argument("--device_data", type=str2bool, default=False,
                   help="stage the packed train/unlabeled pools (and the "
                        "test set) in device HBM once; per-step batches "
                        "are in-program index gathers with zero per-step "
                        "H2D (data/device_pool.py). Requires "
                        "--device_views + --packed_cache. The big win on "
                        "remote/relay-attached TPUs where H2D is slow.")

    p.add_argument("--scan_chunk", type=int, default=1,
                   help="with --device_data: dispatch K train steps as one "
                        "device-side lax.scan program (one host round-trip "
                        "per chunk instead of per step; amortizes the "
                        "relay's per-dispatch cost). Steps adjacent to "
                        "log/val/sweep/stage boundaries run singly so only "
                        "one scan shape compiles. Prefer a K dividing "
                        "gcd(log, val, save frequencies). 1 = off.")

    # test
    p.add_argument("--eval_batch_size", type=int, default=64)

    # synthetic / demo
    p.add_argument("--max_rss_gb", type=float, default=0.0,
                   help="voluntary-restart budget: when host RSS exceeds "
                        "this at a val boundary, save `latest` and exit 75 "
                        "so an auto-resume wrapper can restart the process "
                        "(mitigates the axon relay's per-transfer host "
                        "staging leak; 0 = off)")
    p.add_argument("--synthetic_size", type=int, default=2048)
    p.add_argument("--synthetic_test_size", type=int, default=0,
                   help="held-out synthetic test-set size; 0 = same as "
                        "--synthetic_size (decoupled so a large unlabeled "
                        "pool doesn't inflate eval cost)")
    p.add_argument("--input_size", type=int, default=224,
                   help="crop side; 224 for the reference datasets, smaller "
                        "for synthetic smoke runs")

    # observability
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the steps in "
                        "[profile_start, profile_start+profile_steps)")
    p.add_argument("--profile_start", type=int, default=20)
    p.add_argument("--profile_steps", type=int, default=10)
    return p


class Config:
    """Parsed config + experiment directory management."""

    def __init__(self, phase: str, argv=None):
        self.phase = phase
        parser = build_parser(phase)
        args, _ = parser.parse_known_args(argv)
        if args.config:
            with open(args.config) as f:
                defaults = yaml.safe_load(f) or {}
            known = {a.dest for a in parser._actions}
            parser.set_defaults(**{k: v for k, v in defaults.items() if k in known})
            args = parser.parse_args(argv)
        for k, v in vars(args).items():
            setattr(self, k, v)

        self.exp_detail = self._derive_exp_detail()
        self.date = self.date or datetime.now().strftime("%Y-%m-%d")
        base = os.path.join(self.exp_dir, self.exp_name, self.exp_detail, self.date)
        self.log_dir = os.path.join(base, "log")
        self.model_dir = os.path.join(base, "model")
        if phase == "train":
            os.makedirs(self.log_dir, exist_ok=True)
            os.makedirs(self.model_dir, exist_ok=True)
            self._snapshot()

    def _derive_exp_detail(self) -> str:
        """Run name encoding the ablation flags, reference style
        (src/config.py:165-180), e.g.
        SSL1.0_r0.2_ce_effinetv2_tDyna0.95_b32_ema_CO_CM."""
        parts = [f"SSL{self.SSL_lambda}", f"r{self.ss_ratio}", self.type_unsuper,
                 self.network]
        if self.dynamic_thres:
            parts.append(f"tDyna{self.left_ratio}")
        else:
            parts.append(f"t{self.conf_thres}")
        parts.append(f"b{self.batch_size}")
        if self.is_ema:
            parts.append("eman" if self.eman else "ema")
        if self.rotate_aug:
            parts.append("RT")
        if self.cutout_aug:
            parts.append("CO")
        if self.cutmix_aug:
            parts.append("CM")
        if self.distribution == "RotationLaplace":
            parts.append("RL")
        if self.is_full_range:
            parts.append("FR")
        return "_".join(parts)

    def _snapshot(self):
        """Full config dump + package source snapshot into log.txt
        (reference reproducibility idiom, src/config.py:54-68)."""
        path = os.path.join(self.log_dir, "log.txt")
        pkg_root = os.path.dirname(os.path.abspath(__file__))
        with open(path, "w") as f:
            f.write("===== CONFIG =====\n")
            f.write(json.dumps({k: v for k, v in vars(self).items()
                                if not k.startswith("_")}, indent=2, default=str))
            f.write("\n\n===== SOURCE SNAPSHOT =====\n")
            for root, _, files in os.walk(pkg_root):
                for name in sorted(files):
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        f.write(f"\n----- {os.path.relpath(full, pkg_root)} -----\n")
                        try:
                            f.write(open(full).read())
                        except OSError:
                            pass

    def resolve_ckpt(self, name: str) -> str:
        if os.path.isabs(name) or os.path.exists(name):
            return name
        return os.path.join(self.exp_dir, self.exp_name, name)


def get_config(phase: str, argv=None) -> Config:
    assert phase in ("train", "test")
    return Config(phase, argv)
