#!/bin/bash
# Round-5 re-run of the TinyViT 224px SSL arm to its FULL 40k budget
# (VERDICT r4 #5: the r4 arm died at 29.2k/40k when the host VM recycled
# and its .gitignored checkpoints died with it, leaving the stage-2
# conclusion a 46%-budget sample).
#
# Two durability mechanisms on top of the r4 protocol (which is otherwise
# byte-identical: EXP_DIR changes, everything else matches
# scripts/ssl_benefit_224_net.sh tinyvit ssl-only):
#   1. train_auto_resume.sh process recycling (relay RSS leak, wedges).
#   2. A parking loop (scripts/park_ckpt.sh) that periodically COMMITS the
#      rolling `latest` checkpoint to git under exps_r5/ — the only storage
#      that survives a host-VM recycle.  On a fresh clone, restart this
#      script with CONT=exps_r5/ckpt_park/latest to lose at most one
#      parking interval.
set -u
cd "$(dirname "$0")/.."
EXP_DIR=exps_r5
NET=tinyvit

COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network $NET --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625
  --synthetic_test_size 2048
  --batch_size 32 --lr 1e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r3_224 --device_data true
  --log_frequency 400 --val_frequency 500
  --eval_batch_size 256 --exp_dir $EXP_DIR --num_workers 4 --max_rss_gb 80"

extra=()
if [ -n "${CONT:-}" ]; then extra=(--cont_ckpt "$CONT"); fi

scripts/train_auto_resume.sh $COMMON --exp_name "ssl_224_$NET" \
  --scan_chunk 8 --ckpt_frequency 2000 --stage2_lr_scale 1.0 \
  --stage1_iteration 20000 --max_iteration 40000 --save_frequency 1000 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999 "${extra[@]}"
