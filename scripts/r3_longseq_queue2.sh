#!/bin/bash
# Resume of r3_longseq_queue.sh from stage 4 (stages 1-3 recorded in
# logs/r3_longseq.jsonl on 2026-08-18; the N>=589k stages needed the
# multi-group window block-shape fix). One TPU job at a time; each stage
# appends JSON lines so partial progress survives interruption.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --pe "${@:4}" | tee -a "$LOG"
}
run 7200 589825 2 rope-axial polynomial relative
run 10800 1048577 2 rope-axial
run 10800 1048577 2 polynomial
run 10800 1048577 2 relative
echo DONE2 >> "$LOG"
