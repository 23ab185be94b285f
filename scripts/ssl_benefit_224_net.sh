#!/bin/bash
# SSL-vs-supervised A/B at 224px for an arbitrary backbone — the
# ssl_benefit_224.sh protocol (RESULTS.md §6) parameterized by network,
# to reproduce the reference's multi-backbone Tab2 claims (EffNetV2-S /
# ResNet50 / RepVGG all gain from SSL at 2-20% labels).
#
# Usage: scripts/ssl_benefit_224_net.sh <network> [ssl-only|sup-only]
#   e.g. scripts/ssl_benefit_224_net.sh resnet50
#
# Protocol is byte-identical to ssl_benefit_224.sh (same data pool,
# budgets, threshold, augs); only --network and the exp names change,
# so arms are comparable across backbones.  The packed pool cache
# (/tmp/pack_r3_224) is network-independent and shared.
set -e
cd "$(dirname "$0")/.."

NET="${1:?usage: ssl_benefit_224_net.sh <network> [ssl-only|sup-only]}"
EXP_DIR="${EXP_DIR:-exps_r3}"   # round-4 arms pass EXP_DIR=exps_r4

COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network $NET --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625
  --synthetic_test_size 2048
  --batch_size 32 --lr 1e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r3_224 --device_data true
  --log_frequency 400 --val_frequency 500
  --eval_batch_size 256 --exp_dir $EXP_DIR --num_workers 4 --max_rss_gb 80"

if [ "${2:-}" != "ssl-only" ]; then
scripts/train_auto_resume.sh $COMMON --exp_name "sup_224_$NET" \
  --scan_chunk 8 --ckpt_frequency 2000 \
  --stage1_iteration 30000 --max_iteration 30000 --save_frequency 100000
fi

if [ "${2:-}" != "sup-only" ]; then
scripts/train_auto_resume.sh $COMMON --exp_name "ssl_224_$NET" \
  --scan_chunk 8 --ckpt_frequency 2000 --stage2_lr_scale 1.0 \
  --stage1_iteration 20000 --max_iteration 40000 --save_frequency 1000 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999
fi
