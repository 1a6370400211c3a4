#!/bin/bash
# Round-3 int8 serving comparison: bf16 vs W8A8 vs the new W8A16
# (weight-only) at throughput (large-batch) and latency (small-batch)
# points, headline + stretch. One JSON line per run -> logs/r3_int8.jsonl.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/r3_int8.jsonl
mkdir -p logs
run() {
  echo "=== $* ===" >&2
  timeout 1800 python scripts/bench_infer.py "$@" | tee -a "$LOG"
}
for b in 128 8 1; do
  run --batch "$b" --dtype bfloat16
  run --batch "$b" --int8 --int8_mode w8a8
  run --batch "$b" --int8 --int8_mode w8a16
done
for b in 64 8 1; do
  run --stretch --batch "$b" --dtype bfloat16
  run --stretch --batch "$b" --int8 --int8_mode w8a8
  run --stretch --batch "$b" --int8 --int8_mode w8a16
done
echo DONE_INT8 >> "$LOG"
