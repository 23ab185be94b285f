#!/bin/bash
# Round-3 quiet-TPU measurement sequence (VERDICT weak #1/#2):
#   1. isolated window-attention variant sweep (scripts/attn_probe.py)
#   2. EffNetV2-S remat A/B (SEMIUHPE_REMAT=1), back-to-back pairs
#   3. b64 batch-scaling row
# Run ONLY on a quiet chip (no concurrent training) — the relay has ~2x
# run-to-run spread under load.  All programs were pre-compiled via
# BENCH_COMPILE_ONLY=1, so this is almost pure measurement time.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/quiet_probes_r3}
mkdir -p "$OUT"

echo "=== attn probe sweep" | tee "$OUT/attn.jsonl"
python scripts/attn_probe.py 2>>"$OUT/attn.err" | tee -a "$OUT/attn.jsonl"

echo "=== remat A/B (pairs: base, remat, base, remat)"
for i in 1 2; do
  python bench.py 2>>"$OUT/bench.err" | tee -a "$OUT/remat_ab.jsonl"
  SEMIUHPE_REMAT=1 python bench.py 2>>"$OUT/bench.err" \
    | tee -a "$OUT/remat_ab.jsonl"
done

echo "=== b64 batch-scaling row"
BENCH_BATCH=64 python bench.py 2>>"$OUT/bench.err" | tee "$OUT/b64.jsonl"

echo "=== done"
