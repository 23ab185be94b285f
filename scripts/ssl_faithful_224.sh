#!/bin/bash
# VERDICT r3 "next #5": one FAITHFUL-recipe synthetic SSL arm at the 224px
# ladder scale — the reference's own stage-2 protocol, not the ladder
# winner's knobs.  Differences vs scripts/ssl_benefit_224.sh (SSL arm):
#   left_ratio 0.95          (reference README.md:73; ladder used 0.35)
#   stage2_lr_scale 0.1      (reference train.py:104-109 boundary lr x0.1;
#                             ladder used 1.0)
#   sweep at stage boundary  (reference train.py:242-251 runs the dynamic
#                             sweep on the save_frequency grid from the
#                             boundary; ladder used --sweep_after_warmup)
# Everything else (data scale, budgets, augs, batch recipe) is identical to
# the round-3 protocol arm so the three arms are directly comparable:
#   supervised 30k best 13.3800 | protocol-SSL best 12.2807 (RESULTS.md §6).
set -e
cd "$(dirname "$0")/.."

exec scripts/train_auto_resume.sh \
  --train_labeled synthetic --train_unlabeled synthetic --test_set synthetic \
  --network effinetv2 --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625 \
  --synthetic_test_size 2048 \
  --batch_size 32 --lr 1e-4 --dtype bfloat16 --device_views true \
  --packed_cache /tmp/pack_r3_224 --device_data true \
  --log_frequency 400 --val_frequency 500 \
  --eval_batch_size 256 --exp_dir exps_r4 --num_workers 4 --max_rss_gb 80 \
  --exp_name ssl_224_faithful \
  --scan_chunk 8 --ckpt_frequency 2000 \
  --stage1_iteration 20000 --max_iteration 40000 --save_frequency 1000 \
  --dynamic_thres true --left_ratio 0.95 --stage2_lr_scale 0.1 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999 \
  "$@"
