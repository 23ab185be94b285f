#!/bin/bash
# Round-5 quiet-chip timed sequence.  Run ONLY with nothing else on the
# TPU or host (relay shows ~2x spread under load).  Every variant is
# judged against an adjacent baseline run, and all programs are assumed
# pre-compiled by the round-5 compile queues (BENCH_AOT=1 default routes
# timed dispatch through the same cached AOT executable).
#
# Usage: scripts/timed_r5.sh [stage]   stages: sweep1 b4 fused probes sweep2
set -u
cd "$(dirname "$0")/.."
OUT=exps_r5/perf
mkdir -p "$OUT"
STAGE=${1:-all}

bench() {  # bench <tag> [env k=v ...]
  local tag=$1; shift
  echo "--- bench $tag $(date -Is)"
  env "$@" python bench.py 2>>"$OUT/timed_r5.err" \
    | sed "s/^{/{\"tag\": \"$tag\", /" | tee -a "$OUT/timed_r5.jsonl"
}

probe() {  # probe <script> <variant> [env ...]
  local script=$1 variant=$2; shift 2
  echo "--- probe $script $variant $(date -Is)"
  env "$@" python "scripts/$script" "$variant" 2>>"$OUT/timed_r5.err" \
    | tee -a "$OUT/probes_r5.jsonl"
}

if [ "$STAGE" = all ] || [ "$STAGE" = sweep1 ]; then
  bench base_a
  bench vmem64 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
  bench base_b
  bench lhs_on BENCH_XLA_OPTS=xla_tpu_enable_latency_hiding_scheduler=true
fi

if [ "$STAGE" = all ] || [ "$STAGE" = b4 ]; then
  bench effinet_b4 BENCH_NET=effinet
fi

if [ "$STAGE" = all ] || [ "$STAGE" = fused ]; then
  bench fused_adam SEMIUHPE_FUSED_ADAM=1
  bench base_c
fi

if [ "$STAGE" = all ] || [ "$STAGE" = probes ]; then
  for v in s2_full s2_noact s2_ch64 s2_28px s5_nodrop s5_nose s5_noact s5_expproj; do
    probe block_profile.py "$v"
  done
  for v in student_fwdbwd teacher128; do
    probe conv_profile.py "$v" BENCH_NET=effinet
  done
fi

if [ "$STAGE" = all ] || [ "$STAGE" = sweep2 ]; then
  bench base_d
  bench vmem32 BENCH_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768
  bench lhs_off BENCH_XLA_OPTS=xla_tpu_enable_latency_hiding_scheduler=false
  bench licm BENCH_XLA_OPTS=xla_tpu_licm_size_inflation_ratio=2
  # flash: NOT timed — backend rejected the flag at compile ("No such
  # compile option: 'xla_tpu_use_flash_attention'", compile_flash.err).
fi
echo "=== timed_r5 $STAGE done $(date -Is)"
