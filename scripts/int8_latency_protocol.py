"""Median-of-K latency protocol for the serving matrix's small-batch cells.

The round-4 verdict (weak #6): sub-5 ms batches through this machine's
~26 ms dispatch tunnel are noise-dominated — rechecks showed 3x spread on
the same cell across processes — yet the matrix's win/lose claims on those
cells had no measurement protocol. This runs every (config, batch, mode)
cell as K FRESH PROCESSES of scripts/bench_infer.py (fresh process = fresh
tunnel session + dispatch pipeline, the unit the spread lives at), records
every raw run, and decides winners on the MEDIAN with the relative spread
(max-min)/median attached. Cells whose spread exceeds SPREAD_NOISY are
tunnel-noise-bound: the matrix must mark them, not claim a winner.

  python scripts/int8_latency_protocol.py [--k 5] [--out docs/logs/r5_int8_latency.jsonl]

One JSON line per raw run (kind=run) + one per cell (kind=cell) + one
summary (kind=matrix).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPREAD_NOISY = 0.25  # (max-min)/median above this = tunnel-noise-bound

# Sub-5 ms cells of the VALIDATION.md serving matrix: both configs at
# batch 1 and 8, every mode. (bs64/bs128 reproduce to <0.3% across
# processes — r4 measured — and are excluded to keep the queue bounded.)
CELLS = [
    (stretch, batch, mode)
    for stretch in (False, True)
    for batch in (1, 8)
    for mode in ("bf16", "w8a8", "w8a8-static", "w8a16")
]


def run_once(stretch: bool, batch: int, mode: str, steps: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "bench_infer.py"),
           "--batch", str(batch), "--steps", str(steps)]
    if stretch:
        cmd.append("--stretch")
    if mode == "bf16":
        cmd += ["--dtype", "bfloat16"]
    else:
        cmd += ["--int8", "--int8_mode", mode]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                         env={**os.environ,
                              "BENCH_SKIP_BACKEND_PROBE": "1"})
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        parsed = json.loads(line)
    except (json.JSONDecodeError, IndexError):
        parsed = {"error": (out.stderr or out.stdout)[-400:]}
    parsed.update(kind="run", stretch=stretch, batch=batch, mode=mode,
                  wall_s=round(time.time() - t0, 1))
    return parsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "logs", "r5_int8_latency.jsonl"))
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    # Resume: count already-recorded good runs per cell (bench_infer emits
    # its throughput under "value"), so an interrupted protocol only runs
    # the remainder. The LAST kind=cell line per key in the JSONL is the
    # authoritative aggregate.
    have = {}
    if os.path.exists(args.out):
        for ln in open(args.out):
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            ips = d.get("images_per_sec") or d.get("value")
            if d.get("kind") == "run" and ips:
                have.setdefault(
                    (d["stretch"], d["batch"], d["mode"]), []).append(
                        float(ips))

    cells = []
    with open(args.out, "a") as f:
        for stretch, batch, mode in CELLS:
            # Use ALL recorded runs (a cell finished at a higher K keeps
            # its K; `k` in the aggregate reports the actual run count).
            vals = have.get((stretch, batch, mode), [])
            for i in range(max(0, args.k - len(vals))):
                r = run_once(stretch, batch, mode, args.steps)
                print(json.dumps(r), file=f, flush=True)
                print(json.dumps(r), file=sys.stderr)
                ips = r.get("images_per_sec") or r.get("value")
                if ips:
                    vals.append(float(ips))
            if not vals:
                cell = dict(kind="cell", stretch=stretch, batch=batch,
                            mode=mode, error="all runs failed")
            else:
                med = statistics.median(vals)
                spread = (max(vals) - min(vals)) / med if med else 0.0
                cell = dict(kind="cell", stretch=stretch, batch=batch,
                            mode=mode, k=len(vals),
                            median_ips=round(med, 1),
                            min_ips=round(min(vals), 1),
                            max_ips=round(max(vals), 1),
                            spread=round(spread, 3),
                            noise_bound=spread > SPREAD_NOISY)
            cells.append(cell)
            print(json.dumps(cell), file=f, flush=True)
            print(json.dumps(cell), file=sys.stderr)

    # Per (config, batch) group: median winner + whether the margin beats
    # the group's worst spread (else the group is a statistical tie).
    groups = {}
    for c in cells:
        if "median_ips" in c:
            groups.setdefault((c["stretch"], c["batch"]), []).append(c)
    matrix = []
    for (stretch, batch), g in sorted(groups.items()):
        g = sorted(g, key=lambda c: -c["median_ips"])
        best, runner = g[0], (g[1] if len(g) > 1 else None)
        margin = ((best["median_ips"] - runner["median_ips"])
                  / runner["median_ips"] if runner else 1.0)
        decided = (not best["noise_bound"]
                   and margin > max(c["spread"] for c in g) / 2)
        matrix.append(dict(
            config="ViT-S/16@224" if stretch else "ViT-tiny/4@32",
            batch=batch, winner=best["mode"],
            winner_median_ips=best["median_ips"],
            margin_over_runner_up=round(margin, 3),
            decided=decided,
            noise_bound_modes=[c["mode"] for c in g if c["noise_bound"]]))
    line = dict(kind="matrix", k=args.k, spread_noisy=SPREAD_NOISY,
                cells=matrix)
    with open(args.out, "a") as f:
        print(json.dumps(line), file=f, flush=True)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
