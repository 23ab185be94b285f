#!/bin/bash
# Fourth iteration of the SSL-vs-supervised synthetic A/B.  Deltas vs
# ssl_benefit_24k.sh: the unlabeled pool grows 4x (16,128 vs 3,840 images;
# 256 labeled unchanged) so the teacher-student consistency loss sees real
# data diversity — the reference's regime is ulb >> labeled (74k-400k heads
# vs a few k labels, SURVEY 2.6) and the prior near-tie (14.01 vs 14.38 at
# 16k budget) ran with an unlabeled pool only 15x the labeled set.  Test
# set decoupled at 2,048 (--synthetic_test_size) so eval cost stays flat.
# Stage-1 16k (convergence per sup_long), left_ratio 0.35 (the teacher's
# most-confident third), full stage-2 LR.
set -e
COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network mobilenet --input_size 96 --synthetic_size 16384 --ss_ratio 0.015625
  --synthetic_test_size 2048
  --batch_size 64 --lr 3e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r2b --log_frequency 400 --val_frequency 500
  --eval_batch_size 256 --exp_dir exps_r2 --num_workers 4"

if [ "$1" != "ssl-only" ]; then
python -m semiuhpe_tpu.cli.train $COMMON --exp_name sup_24k_b \
  --stage1_iteration 24000 --max_iteration 24000 --save_frequency 100000
fi

python -m semiuhpe_tpu.cli.train $COMMON --exp_name ssl_24k_b \
  --stage2_lr_scale 1.0 \
  --stage1_iteration 16000 --max_iteration 24000 --save_frequency 1000 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999
