#!/bin/bash
# Round-3 long-sequence envelope, final pass (2026-08-18). Supersedes
# queue2: N>=589,825 runs bf16 WITHOUT remat (remat's ~1.5x step-time
# pushes the step past the tunnel's ~60 s execute wall; no-remat fits HBM
# after the H=1 freq-table + lane-major-lse fixes). rope@589k recorded by
# hand-probe (53.75 s/step); this queue fills the remaining cells.
# N=1,048,577 single-chip is infra-bound (>150 s/step > wall) — skipped.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_longseq.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --pe "${@:4}" | tee -a "$LOG"
}
run 3600 409601 2 rope-axial polynomial relative
run 3600 589825 1 polynomial
run 3600 589825 1 relative
echo DONE3 >> "$LOG"
