#!/bin/bash
# Round-5 queue, stage 2: bounded-ring penalty closure + long-N ring row.
#
# The r5 device trace (docs/logs/r5_ring_trace.json) measured the r4
# relative multi-chunk ring penalty GONE with current code (0.164 vs
# 0.158 s/step = 1.04x; r4 had 0.364 vs 0.151 = 2.4x). This re-measures
# the full r4 comparison table cleanly (all three modes, ring vs plain)
# and adds the long-N ring row the verdict asked for (relative at
# N=589,825 under --force_ring).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/logs
L=docs/logs/r5_bounded_ring.jsonl
run() {
  echo "=== ring-bench $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" ${5:+--force_ring} --pe "${@:6}" | tee -a "$L"
}
run 7200 16385 3 4096 ring rope-axial polynomial relative
run 7200 16385 3 4096 ""   rope-axial polynomial relative
echo "=== long-N ring row: relative 589k ===" >&2
timeout 12600 python scripts/bench_longseq.py --n 589825 --steps 1 \
  --q_chunk 131072 --force_ring --pe relative | tee -a "$L"
echo QUEUE2_DONE >&2
