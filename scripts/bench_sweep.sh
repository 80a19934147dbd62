#!/bin/bash
# TPU bench sweep: measure the flagship train-step throughput across modes.
# One process per mode (compute dtype + sparse flags are process-global).
# Usage: bash scripts/bench_sweep.sh [out_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_sweep.jsonl}"
: > "$OUT"
run() {
  local name="$1"; shift
  echo "--- $name ($*)" >&2
  local line
  line=$(env "$@" timeout 1500 python bench.py 2>/dev/null | tail -1)
  echo "{\"mode\": \"$name\", \"result\": $line}" | tee -a "$OUT"
}
run f32_dense        SWR_SPARSE_EMB=0 SWR_BF16=0
run f32_sparse       SWR_SPARSE_EMB=1 SWR_BF16=0
run bf16_dense       SWR_SPARSE_EMB=0 SWR_BF16=1
run bf16_sparse      SWR_SPARSE_EMB=1 SWR_BF16=1
# production-scale vocab: dense Adam cost dominates -> sparse pays off most
run f32_dense_bigv   SWR_SPARSE_EMB=0 SWR_BF16=0 SWR_VOCAB=200000
run f32_sparse_bigv  SWR_SPARSE_EMB=1 SWR_BF16=0 SWR_VOCAB=200000
