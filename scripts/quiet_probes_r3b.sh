#!/bin/bash
# Round-3 second quiet-TPU measurement sequence:
#   1. TinyViT stage attribution re-run with the D-major production
#      kernel (floor analysis for VERDICT r2 weak #1 / next-#4)
#   2. Per-pass conv splits (BENCH_PASSES=fwd|wgrad|full) on the
#      flagship + TinyViT dense/depthwise shapes: successive diffs
#      attribute the dgrad vs wgrad cost the backward pays.
# Run ONLY on a quiet chip (no concurrent training).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/quiet_probes_r3b}
mkdir -p "$OUT"

echo "=== tinyvit attribution (D-major kernel)" | tee "$OUT/tinyvit.jsonl"
python scripts/tinyvit_profile.py all 2>>"$OUT/tinyvit.err" \
  | tee -a "$OUT/tinyvit.jsonl"

echo "=== per-pass conv splits" | tee "$OUT/passes.jsonl"
for probe in s2_48_192 ctl_14_384_1536 dw_s4_512 dw_s5_960 dw_s6_1536 \
             dw_tv_s1_384 dw_tv_s2_192 dw_tv_s3_384; do
  for p in fwd wgrad full; do
    BENCH_PASSES=$p python scripts/conv_shape_probe.py "$probe" \
      2>>"$OUT/passes.err" | tee -a "$OUT/passes.jsonl"
  done
done

echo "=== done"
