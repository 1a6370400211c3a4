"""Device-trace the bounded-ring relative penalty (VERDICT r4 #4).

r4 measured relative multi-chunk 2.4x slower under the ring than under the
plain bounded driver (0.364 vs 0.151 s/step at N=16,385, q_chunk=4,096,
1-device ring) and VALIDATION.md blamed the per-hop window re-framing — a
hypothesis, never traced (at R=1 the framing count matches the plain path,
so it cannot be the whole story). This traces BOTH drivers' steps and
aggregates the device ops by source line / hlo_category
(scripts/profile_stretch.aggregate_trace) so the actual +ms consumer is
named before any fix is attempted.

Usage: python scripts/profile_ring.py [--pe relative] [--n 16385]
       [--q_chunk 4096] [--out docs/logs/r5_ring_trace.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_stretch import aggregate_trace  # noqa: E402
import bench_longseq  # noqa: E402


def traced_run(pe, n, q_chunk, force_ring, steps=2):
    with tempfile.TemporaryDirectory(prefix="ring_trace_") as td:
        # bench_longseq.run times its own chained steps; wrap the whole
        # run (warmup + timed) in a trace and aggregate only device ops —
        # compile happens on the first (warmup) call inside run(), so
        # kernel spans dominate and categories are comparable between the
        # two drivers.
        jax.profiler.start_trace(td)
        r = bench_longseq.run(pe, n, steps, "flash", q_chunk=q_chunk,
                              force_ring=force_ring)
        jax.profiler.stop_trace()
        agg = aggregate_trace(td)
    return r, agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pe", default="relative")
    ap.add_argument("--n", type=int, default=16385)
    ap.add_argument("--q_chunk", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "logs", "r5_ring_trace.json"))
    args = ap.parse_args()

    out = {}
    for name, force in (("ring", True), ("plain", False)):
        r, agg = traced_run(args.pe, args.n, args.q_chunk, force,
                            args.steps)
        out[name] = dict(result=r,
                         device_total_us=agg["device_total_us"],
                         categories=agg["categories"][:12],
                         sources=agg["sources"][:15])
        print(json.dumps({name: r}), flush=True)
        for s in agg["sources"][:10]:
            print(f"  {s['pct']:5.2f}% {int(s['total_us']):>9}us "
                  f"{s['calls']:>7} {s['name']}", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(
        wrote=args.out,
        ring_step_s=out["ring"]["result"]["step_s"],
        plain_step_s=out["plain"]["result"]["step_s"])))


if __name__ == "__main__":
    main()
