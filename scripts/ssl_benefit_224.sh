#!/bin/bash
# SSL-vs-supervised A/B at the PAPER'S backbone and resolution:
# EffNetV2-S @224px, recipe batch (32 labeled + 4x unlabeled), bf16.
# Protocol carries over the settings that won the 96px ladder
# (ssl_benefit_24k_b.sh + proportional-hole rerun, RESULTS.md §5):
# 256 labeled / 16,128 unlabeled (63x pool), 2,048-img held-out test,
# stage-1 to convergence, --sweep_after_warmup, left_ratio 0.35, full
# stage-2 LR, rotate+cutout+cutmix.  lr 1e-4 = the reference recipe for
# this net/batch (settings/300WLP_AFLW2000.yml).  Iteration budgets are
# scaled up (30k sup / 20k+20k SSL) since batch 32 halves the
# samples/iter of the 96px ladder's batch 64.
#
# Runs under train_auto_resume + --max_rss_gb 80: the axon relay leaks
# ~one staging copy per H2D transfer (~24 MB/step at these shapes), so
# each process recycles cleanly at a val boundary every ~4-5k iters.
set -e
cd "$(dirname "$0")/.."

COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network effinetv2 --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625
  --synthetic_test_size 2048
  --batch_size 32 --lr 1e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r3_224 --device_data true
  --log_frequency 400 --val_frequency 500
  --eval_batch_size 256 --exp_dir exps_r3 --num_workers 4 --max_rss_gb 80"

if [ "${1:-}" != "ssl-only" ]; then
scripts/train_auto_resume.sh $COMMON --exp_name sup_224 \
  --scan_chunk 8 --ckpt_frequency 2000 \
  --stage1_iteration 30000 --max_iteration 30000 --save_frequency 100000
fi

# --scan_chunk 8: SSL steps are ~74 ms device-side; chunking 8 per
# dispatch amortizes the relay's ~32 ms/dispatch host floor.
# --ckpt_frequency 2000: the rolling `latest` save is a ~45 s full-state
# D2H fetch; at val_frequency 500 it would dominate wall time.  Crash
# recovery then costs <=2000 iters; RSS-recycle exits still save first.
scripts/train_auto_resume.sh $COMMON --exp_name ssl_224 \
  --scan_chunk 8 --ckpt_frequency 2000 --stage2_lr_scale 1.0 \
  --stage1_iteration 20000 --max_iteration 40000 --save_frequency 1000 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999
