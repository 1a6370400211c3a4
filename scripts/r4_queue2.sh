#!/bin/bash
# Round-4 queue, continuation: run 5/5 of the headline variance series
# (runs 1-4 landed in docs/logs/r4_bench_variance.jsonl at end of round 3),
# then the two unmeasured 2M-token cells (VERDICT round-3 next-round #2):
# polynomial and relative at N=2,096,705 through the bounded-program driver
# with kv-segmented backward — same knobs as the r3 rope run
# (q_chunk 65536, kv_chunk 524288, bf16, no remat).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/logs
V=docs/logs/r4_bench_variance.jsonl
L=docs/logs/r4_longseq.jsonl
echo "=== bench variance run 5 ===" >&2
timeout 3600 python bench.py | tail -1 >> "$V"
echo VARIANCE_DONE >&2
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" --kv_chunk "$5" --pe "${@:6}" | tee -a "$L"
}
run 12600 2096705 1 65536 524288 polynomial
run 12600 2096705 1 65536 524288 relative
echo QUEUE_DONE >&2
