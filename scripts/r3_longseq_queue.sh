#!/bin/bash
# Round-3 long-sequence measurement queue (run after a tunnel outage):
# validates the windowed relative backward on hardware from small N up,
# then pushes the envelope to N=1M. One TPU job at a time; each stage
# appends JSON lines to logs/r3_longseq.jsonl so partial progress
# survives interruption.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --pe "${@:4}" | tee -a "$LOG"
}
# 1. Hardware-validate the changed kernel where numbers are known.
run 3600 4097 4 rope-axial polynomial relative || exit 1
# 2. Spot-check 16k (should match the recorded 0.165/0.131/0.129).
run 3600 16385 4 relative polynomial || exit 1
# 3. Re-measure relative at 262k (was 18.09 with O(2N) residents).
run 5400 262145 2 relative || exit 1
# 4. New envelope points.
run 7200 589825 2 rope-axial polynomial relative
run 10800 1048577 2 rope-axial
run 10800 1048577 2 polynomial
run 10800 1048577 2 relative
echo DONE >> "$LOG"
