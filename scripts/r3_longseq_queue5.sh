#!/bin/bash
# Round-3 capstone: N = 2,096,705 tokens (5792px / patch 4, 1448^2 patches
# + cls) on ONE chip through the bounded-program driver — 32 forward
# attention programs of 65,536 query rows each, every one far under the
# tunnel's ~60 s per-program execute wall, and the backward kv-segmented
# (--kv_chunk: the sync-debug run showed the full-width f32 dk/dv
# transients are the N=2M OOM; segments bound them at 256 MB).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" --kv_chunk "$5" --pe "${@:6}" | tee -a "$LOG"
}
run 14400 2096705 1 65536 524288 rope-axial
echo DONE5 >> "$LOG"
