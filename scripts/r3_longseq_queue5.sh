#!/bin/bash
# Round-3 capstone: N = 2,096,705 tokens (5792px / patch 4, 1448^2 patches
# + cls) on ONE chip through the bounded-program driver — 32 attention
# programs of 65,536 query rows each, every one far under the tunnel's
# ~60 s per-program execute wall.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" --pe "${@:5}" | tee -a "$LOG"
}
run 10800 2096705 1 65536 rope-axial
echo DONE5 >> "$LOG"
