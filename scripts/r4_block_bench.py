"""Round-4 measurement queue: block-level custom_vjp experiment (VERDICT #9).

Runs bench.measure at the stretch config (ViT-S/16 @224 rope-mixed bf16,
bs64 — the MXU-bound regime where the attention-level custom_vjp boundary
measurably costs ~25%, ROADMAP round-3 closure) for three attention_impl
settings:

  auto        — XLA end-to-end (the boundary-free incumbent)
  flash       — Pallas dense kernels behind the PER-ATTENTION custom_vjp
  flash_block — the SAME Pallas drivers behind ONE PER-BLOCK custom_vjp
                (ops/block_vjp.py): the boundary moves to the residual
                stream, where nothing is left for XLA to fuse across.

Appends one JSON line per point to docs/logs/r4_block_vjp.jsonl.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402

OUT = os.path.join(HERE, "docs", "logs", "r4_block_vjp.jsonl")


def main():
    impls = sys.argv[1:] or ["auto", "flash", "flash_block"]
    for impl in impls:
        try:
            r = bench.measure(attention_impl=impl,
                              compute_dtype="bfloat16", **bench.STRETCH_KW)
            row = {"metric": "ViT-S/16 @224 rope-mixed bf16 train img/s "
                             f"(bs64, attention_impl={impl})",
                   "value": round(r["images_per_sec"], 1),
                   "unit": "images/sec/chip",
                   "step_ms": round(r["step_ms"], 3),
                   "mfu": round(r["mfu"], 4)}
        except Exception as e:  # record the failure, keep the queue going
            row = {"metric": f"stretch attention_impl={impl}",
                   "error": repr(e)[:300]}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write("DONE\n")


if __name__ == "__main__":
    main()
