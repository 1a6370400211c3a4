#!/bin/bash
# Round-4 w8a8-static serving matrix: the 6 batch x model points of
# VALIDATION.md's int8 matrix, static column. Sequential (one chip).
# Raw JSON lines land in docs/logs/r4_int8_static.jsonl.
cd "$(dirname "$0")/.."
OUT=docs/logs/r4_int8_static.jsonl
: > "$OUT"
for args in "--batch 128" "--batch 8" "--batch 1" \
            "--stretch --batch 64" "--stretch --batch 8" "--stretch --batch 1"; do
  timeout 2400 python scripts/bench_infer.py $args --int8 --int8_mode w8a8-static \
    2>/dev/null | grep -a '"metric"' >> "$OUT"
done
echo DONE >> "$OUT"
