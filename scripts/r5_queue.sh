#!/bin/bash
# Round-5 measurement queue (run AFTER bench.py is idle — one TPU program
# at a time through the tunnel).
#
# Stage 1 — re-anchor the round-3 marquee evidence (VERDICT r4 weak #1 /
#   ask #2): the r3 long-seq JSONLs were never committed, so the envelope
#   rows rest on prose. Re-measure a representative subset into a COMMITTED
#   file: all three modes at N=65,537, relative at N=262,145, rope-axial at
#   N=589,825 (the r3 table's exact cells).
# Stage 2 — grad_accum × bounded hardware row (ask #3): N=589,825 at
#   effective batch 2 (the 1M-2M regime's only way to form a batch).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p docs/logs
L=docs/logs/r5_longseq.jsonl
run() {
  echo "=== longseq $* ===" >&2
  timeout "$1" python scripts/bench_longseq.py --n "$2" --steps "$3" \
    --pe "${@:4}" | tee -a "$L"
}
run 3600 65537 3 rope-axial polynomial relative
run 3600 262145 2 relative
run 7200 589825 1 rope-axial
echo "=== grad_accum x bounded, N=589825, accum 2 ===" >&2
timeout 12600 python scripts/bench_longseq.py --n 589825 --steps 1 \
  --q_chunk 131072 --grad_accum 2 --pe polynomial | tee -a "$L"
echo QUEUE_DONE >&2
