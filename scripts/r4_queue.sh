#!/bin/bash
# Round-4 measurement queue. Evidence is persisted IN-REPO under docs/logs/
# (VERDICT.md round-3 weak #4: logs/ is gitignored, so round-3's raw JSONL
# evaporated; every number VALIDATION.md quotes from this round cites a
# committed file).
#
# Stage 1 — headline variance (VERDICT next-round #6): five full bench.py
#   runs. r2 recorded 24,277 img/s, r3 23,746 (-2.2%) with no code change
#   that touches the headline path; the five-run spread says whether that
#   regression is tunnel noise or real.
# Stage 2 — the two unmeasured 2M-token cells (VERDICT next-round #2):
#   polynomial and relative at N=2,096,705 through the bounded-program
#   driver with kv-segmented backward — the modes whose in-kernel
#   dcoeff/dtable gradients are the differentiating claim. Same knobs as
#   the r3 rope run (scripts/r3_longseq_queue5.sh): q_chunk 65536,
#   kv_chunk 524288.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/logs
V=docs/logs/r4_bench_variance.jsonl
L=docs/logs/r4_longseq.jsonl
for i in 1 2 3 4 5; do
  echo "=== bench variance run $i ===" >&2
  timeout 3600 python bench.py | tail -1 >> "$V"
done
echo VARIANCE_DONE >&2
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" --kv_chunk "$5" --pe "${@:6}" | tee -a "$L"
}
run 12600 2096705 1 65536 524288 polynomial
run 12600 2096705 1 65536 524288 relative
echo QUEUE_DONE >&2
