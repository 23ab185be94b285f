#!/bin/bash
# Round-5 XLA compiler-flag sweep — finishes the round-4 sweep under the
# fixed protocol (VERDICT r4 #3): the timed dispatch now routes through
# the SAME lower().compile() AOT executable the warming pass builds
# (bench.py BENCH_AOT=1, default), closing the persistent-cache key
# divergence that DNF'd the r4 vmem64 timed run; outputs land in a
# git-committed dir (ADVICE r4: /tmp artifacts were wiped by a VM recycle,
# leaving the r4 compile-time evidence uncommitted).
#
# Phase 1 AOT-compiles every variant (BENCH_COMPILE_ONLY=1 — does not
# occupy the chip); phase 2 runs timed pairs interleaved with the baseline
# on a QUIET chip (the relay has ~2x spread under load: every variant is
# judged against its adjacent baseline run, never a historical number).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-exps_r5/perf/xla_sweep}
PHASE=${PHASE:-both}   # 1 = compile only, 2 = timed only, both
ONLY=${ONLY:-}         # space-separated variant names to restrict to
mkdir -p "$OUT"

VARIANTS=(
  "vmem64:xla_tpu_scoped_vmem_limit_kib=65536"
  "lhs_on:xla_tpu_enable_latency_hiding_scheduler=true"
  "vmem32:xla_tpu_scoped_vmem_limit_kib=32768"
  "lhs_off:xla_tpu_enable_latency_hiding_scheduler=false"
  "licm:xla_tpu_licm_size_inflation_ratio=2"
  "flash:xla_tpu_use_flash_attention=true"
)

want() { [ -z "$ONLY" ] || [[ " $ONLY " == *" $1 "* ]]; }

if [ "$PHASE" != "2" ]; then
echo "=== phase 1: AOT compile variants (cache warm; chip stays free)"
touch "$OUT/compile.jsonl" "$OUT/compile_status.txt"
for v in "${VARIANTS[@]}"; do
  name=${v%%:*}; opts=${v#*:}
  want "$name" || continue
  echo "--- compile $name ($opts)"
  if BENCH_COMPILE_ONLY=1 BENCH_XLA_OPTS="$opts" nice -n 19 python bench.py \
      >>"$OUT/compile.jsonl" 2>"$OUT/compile_$name.err"; then
    echo "$name ok" >> "$OUT/compile_status.txt"
  else
    echo "$name FAILED (flag rejected or compile error)" \
      >> "$OUT/compile_status.txt"
    tail -3 "$OUT/compile_$name.err"
  fi
done
fi

if [ "$PHASE" = "1" ]; then echo "=== phase 1 done (PHASE=1)"; exit 0; fi

echo "=== phase 2: timed pairs (baseline, variant) on a quiet chip, AOT route"
touch "$OUT/timed.jsonl"
for v in "${VARIANTS[@]}"; do
  name=${v%%:*}; opts=${v#*:}
  want "$name" || continue
  grep -q "^$name ok" "$OUT/compile_status.txt" || continue
  echo "--- timed pair: baseline vs $name"
  python bench.py 2>>"$OUT/bench.err" \
    | sed "s/^{/{\"pair\": \"$name\/baseline\", /" | tee -a "$OUT/timed.jsonl"
  BENCH_XLA_OPTS="$opts" python bench.py 2>>"$OUT/bench.err" \
    | sed "s/^{/{\"pair\": \"$name\/variant\", /" | tee -a "$OUT/timed.jsonl"
done

echo "=== done; results in $OUT/timed.jsonl"
