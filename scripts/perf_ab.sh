#!/bin/bash
# Perf A/B matrix on the quiet TPU (run nothing else concurrently — the
# axon relay has ~2x run-to-run spread under load, BENCH_NOTES.md).
# Each variant prints one JSON line from bench.py; first run of a new
# program variant pays a remote compile (cached afterwards).
#
#   1. default: Jacobi fused 3x3 SVD (SEMIUHPE_SVD=jacobi) + fused loss paths
#   2. xla SVD (round-2 pre-change baseline program)
#   3. default + optax.flatten tree updates
#   4. unfused loss paths (sanity: fused still wins)
set -e
cd "$(dirname "$0")/.."
run() { echo "== $*"; env "$@" python bench.py; }

run SEMIUHPE_SVD=jacobi
run SEMIUHPE_SVD=xla
run SEMIUHPE_SVD=jacobi SEMIUHPE_FLAT_OPT=1
run SEMIUHPE_SVD=jacobi SEMIUHPE_NO_FUSED=1
