#!/bin/bash
# One-shot resume of the 224px SSL ladder arm (ssl_benefit_224.sh, SSL arm)
# from the newest rolling checkpoint.  Used after a host-session restart
# killed the wrapper mid-run; passes --cont_ckpt explicitly because
# train_auto_resume.sh's FIRST launch is otherwise fresh.
set -u
cd "$(dirname "$0")/.."

CKPT=$(ls -td exps_r3/ssl_224/*/*/model/latest exps_r3/ssl_224/*/*/model/best 2>/dev/null | head -1)
[ -n "$CKPT" ] || { echo "no ckpt found" >&2; exit 2; }
echo "resuming from $CKPT"

exec scripts/train_auto_resume.sh \
  --train_labeled synthetic --train_unlabeled synthetic --test_set synthetic \
  --network effinetv2 --input_size 224 --synthetic_size 16384 --ss_ratio 0.015625 \
  --synthetic_test_size 2048 \
  --batch_size 32 --lr 1e-4 --dtype bfloat16 --device_views true \
  --packed_cache /tmp/pack_r3_224 --device_data true \
  --log_frequency 400 --val_frequency 500 \
  --eval_batch_size 256 --exp_dir exps_r3 --num_workers 4 --max_rss_gb 80 \
  --exp_name ssl_224 \
  --scan_chunk 8 --ckpt_frequency 2000 --stage2_lr_scale 1.0 \
  --stage1_iteration 20000 --max_iteration 40000 --save_frequency 1000 \
  --dynamic_thres true --sweep_after_warmup true --left_ratio 0.35 \
  --conf_thres -5.3 --rotate_aug true --cutout_aug true --cutmix_aug true \
  --ulb_batch_ratio 4 --ema_decay 0.999 \
  --cont_ckpt "$CKPT"
