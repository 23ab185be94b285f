#!/bin/bash
# Auto-resume wrapper for long runs on the axon relay backend, whose
# IFRT-proxy client leaks ~one host staging copy per H2D transfer
# (parallel/mesh.py docstring).  Pair with --max_rss_gb so the trainer
# exits 75 at a val boundary before the OOM killer fires; this wrapper
# relaunches it from the rolling `latest` checkpoint until the run
# completes.  Also resumes after an actual OOM kill (exit 137).
#
# Usage: scripts/train_auto_resume.sh <all semiuhpe_tpu.cli.train args>
# The args MUST include --exp_dir and --exp_name (used to locate the
# model dir for --cont_ckpt on restarts).
set -u
cd "$(dirname "$0")/.."

EXP_DIR=""; EXP_NAME=""
args=("$@")
for ((i = 0; i < ${#args[@]}; i++)); do
  case "${args[$i]}" in
    --exp_dir)  EXP_DIR="${args[$((i + 1))]}" ;;
    --exp_name) EXP_NAME="${args[$((i + 1))]}" ;;
  esac
done
[ -n "$EXP_DIR" ] && [ -n "$EXP_NAME" ] || {
  echo "train_auto_resume: --exp_dir/--exp_name required" >&2; exit 2; }

latest_ckpt() {
  # newest <detail>/<date>/model/latest under the experiment; fall back
  # to `best` (e.g. the very first save wedged before `latest` ever
  # finalized — best+sidecar are written first, so resuming from best
  # loses at most one val interval and keeps best-ckpt semantics).
  ls -td "$EXP_DIR/$EXP_NAME"/*/*/model/latest \
         "$EXP_DIR/$EXP_NAME"/*/*/model/best 2>/dev/null | head -1
}

MAX_RESTARTS=${MAX_RESTARTS:-40}
MAX_CRASH_RETRIES=${MAX_CRASH_RETRIES:-3}
restart=0
crashes=0
extra=()
while :; do
  python -m semiuhpe_tpu.cli.train "$@" "${extra[@]}"
  rc=$?
  case $rc in
    0) exit 0 ;;
    75|137) crashes=0 ;;            # voluntary restart / OOM kill
    *)
      # Transient infra failures (the remote compiler intermittently drops
      # connections) exit 1; retry a bounded number of consecutive times.
      crashes=$((crashes + 1))
      if [ "$crashes" -gt "$MAX_CRASH_RETRIES" ]; then
        echo "train_auto_resume: exit $rc, $crashes consecutive failures — giving up" >&2
        exit $rc
      fi
      echo "train_auto_resume: exit $rc (crash $crashes/$MAX_CRASH_RETRIES), retrying" >&2
      sleep 20
      ;;
  esac
  restart=$((restart + 1))
  if [ "$restart" -gt "$MAX_RESTARTS" ]; then
    echo "train_auto_resume: gave up after $MAX_RESTARTS restarts" >&2
    exit 1
  fi
  ckpt=$(latest_ckpt)
  if [ -z "$ckpt" ]; then
    echo "train_auto_resume: no latest checkpoint found; restarting fresh" >&2
    extra=()
  else
    echo "train_auto_resume: restart #$restart from $ckpt (rc=$rc)" >&2
    extra=(--cont_ckpt "$ckpt")
  fi
done
