#!/bin/bash
# Round-3 long-sequence queue, pass 4: the bounded-program driver
# (train/bounded.py, --q_chunk) versus the tunnel's ~60-70 s per-program
# execute wall. Queue3 established the wall as the ONLY blocker for
# poly/rel at N=589,825 and every mode at N=1M; the bounded driver slices
# the step into programs of q_chunk*N attention work each, all sub-wall.
# Stage 1 sanity-checks the driver on hardware at N=16,385 against the
# monolithic numbers (rope 0.165 / poly 0.128 / rel 0.129 s/step).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --q_chunk "$4" --pe "${@:5}" | tee -a "$LOG"
}
# 1. Hardware sanity: 3 q-chunks at a known-good N.
run 3600 16385 4 8192 rope-axial polynomial relative || exit 1
# 2. The two 589k cells the wall blocked (queue3).
run 5400 589825 1 131072 polynomial
run 5400 589825 1 131072 relative
# 3. One MILLION tokens, single chip, every PE mode.
run 7200 1048577 1 131072 rope-axial
run 7200 1048577 1 131072 polynomial
run 7200 1048577 1 131072 relative
echo DONE4 >> "$LOG"
