#!/bin/bash
# Round-4 XLA compiler-flag sweep on the flagship SSL step (VERDICT r3 #3i).
#
# Zero-code A/Bs: each variant forwards per-executable TPU compiler options
# through jit(compiler_options=...) via bench.py's BENCH_XLA_OPTS knob.
# Phase 1 AOT-compiles every variant (BENCH_COMPILE_ONLY=1 — does not
# occupy the chip); phase 2 runs timed pairs interleaved with the baseline
# on a QUIET chip (the relay has ~2x spread under load, so every variant
# is judged against its adjacent baseline run, not a historical number).
#
# Unknown/rejected flags fail the variant's compile; that is recorded and
# the variant is skipped in phase 2 (BENCH_NOTES records it as "flag not
# accepted" rather than a perf result).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/xla_sweep_r4}
PHASE=${PHASE:-both}   # 1 = compile only, 2 = timed only, both
mkdir -p "$OUT"

VARIANTS=(
  "vmem32:xla_tpu_scoped_vmem_limit_kib=32768"
  "vmem64:xla_tpu_scoped_vmem_limit_kib=65536"
  "lhs_on:xla_tpu_enable_latency_hiding_scheduler=true"
  "lhs_off:xla_tpu_enable_latency_hiding_scheduler=false"
  "flash:xla_tpu_use_flash_attention=true"
  "licm:xla_tpu_licm_size_inflation_ratio=2"
)

if [ "$PHASE" != "2" ]; then
echo "=== phase 1: AOT compile variants (cache warm)"
: > "$OUT/compile.jsonl"
: > "$OUT/compile_status.txt"
for v in "${VARIANTS[@]}"; do
  name=${v%%:*}; opts=${v#*:}
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
# baseline is assumed already cached (plain bench.py run this round)
fi

if [ "$PHASE" = "1" ]; then echo "=== phase 1 done (PHASE=1)"; exit 0; fi

echo "=== phase 2: timed pairs (baseline, variant) on a quiet chip"
: > "$OUT/timed.jsonl"
for v in "${VARIANTS[@]}"; do
  name=${v%%:*}; opts=${v#*:}
  grep -q "^$name ok" "$OUT/compile_status.txt" || continue
  echo "--- timed pair: baseline vs $name"
  python bench.py 2>>"$OUT/bench.err" | tee -a "$OUT/timed.jsonl"
  BENCH_XLA_OPTS="$opts" python bench.py 2>>"$OUT/bench.err" \
    | tee -a "$OUT/timed.jsonl"
done

echo "=== done; results in $OUT/timed.jsonl"
