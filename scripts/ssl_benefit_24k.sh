#!/bin/bash
# Third iteration of the SSL-vs-supervised synthetic A/B: stage-1 run to
# actual convergence (16k iters; sup_long's best stopped improving at 14k)
# before SSL, strict left_ratio 0.35 (the teacher's most-confident third
# carries ~9-10 deg pseudo-error vs ~21 deg unmasked), equal 24k budgets.
set -e
COMMON="--train_labeled synthetic --train_unlabeled synthetic --test_set synthetic
  --network mobilenet --input_size 96 --synthetic_size 4096 --ss_ratio 0.0625
  --batch_size 64 --lr 3e-4 --dtype bfloat16 --device_views true
  --packed_cache /tmp/pack_r2 --log_frequency 400 --val_frequency 500
  --eval_batch_size 256 --exp_dir exps_r2 --num_workers 4"

if [ "$1" != "ssl-only" ]; then
python -m semiuhpe_tpu.cli.train $COMMON --exp_name sup_24k \
  --stage1_iteration 24000 --max_iteration 24000 --save_frequency 100000
fi

python -m semiuhpe_tpu.cli.train $COMMON --exp_name ssl_24k \
  --stage2_lr_scale 1.0 \
  --stage1_iteration 16000 --max_iteration 24000 --save_frequency 500 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999
