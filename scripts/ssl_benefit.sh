#!/bin/bash
# SSL-vs-supervised A/B in the reference's label-scarce regime, on synthetic
# data (no real datasets in this image; RESULTS.md documents the setting).
# 256 labeled / 3840 unlabeled, MobileNetV2 @96px, batch 64 (+256 ulb).
#
# The supervised arm trains 8000 iters with best-val checkpointing.  The SSL
# arm runs the reference two-stage schedule (stage-1 2000, then best-reload +
# lr x0.1 + FixMatch-style SSL to 8000) with the round-2 fixes for compressed
# schedules: --sweep_after_warmup orders the first dynamic-threshold sweep
# AFTER 500 iters of teacher EMA warmup, and the strict static conf_thres
# (-5.3) keeps mask_ratio ~0 until that first sweep (no garbage pseudo-labels
# from a cold teacher — the round-1 failure mode, RESULTS.md §3).
set -e
COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network mobilenet --input_size 96 --synthetic_size 4096 --ss_ratio 0.0625
  --batch_size 64 --lr 3e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r2 --log_frequency 200 --val_frequency 500
  --eval_batch_size 256 --exp_dir exps_r2 --num_workers 4"

if [ "$1" != "ssl-only" ]; then
python -m semiuhpe_tpu.cli.train $COMMON --exp_name sup_only \
  --stage1_iteration 8000 --max_iteration 8000 --save_frequency 100000
fi

python -m semiuhpe_tpu.cli.train $COMMON --exp_name ssl \
  --stage1_iteration 2000 --max_iteration 8000 --save_frequency 500 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.8 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999
