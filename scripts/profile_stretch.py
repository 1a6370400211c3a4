"""Device-trace kernel breakdown of the stretch train step (VERDICT r3 #7).

Runs bench.measure on the stretch config (ViT-S/16 @224, rope-mixed, bf16,
bs64 — the MXU-bound recipe) with BENCH_PROFILE_DIR capturing a
jax.profiler device trace around the TIMED dispatches, then parses the
perfetto trace's "XLA Ops" track (per-op device durations) into a top-N
table: total device time per fused-op name, classified matmul/conv (MXU)
vs everything else. Writes the aggregate JSON to docs/logs/ and prints the
table; docs/profile_stretch_r4.md holds the committed analysis.

Usage: python scripts/profile_stretch.py [--top 15] [--out docs/logs/r4_profile_stretch.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hlo_category values that are CONTAINERS: their trace span covers the
# child ops (the k-step fused scan shows up as one `while` spanning the
# whole dispatch), so counting them double-counts every leaf. Totals are
# over LEAF ops only.
CONTAINER_CATEGORIES = ("while", "conditional", "call")
# MXU-resident categories (the systolic array does the work).
MXU_CATEGORIES = ("convolution", "dot", "matmul", "einsum")


def aggregate_trace(trace_dir: str) -> dict:
    """Parse the newest vm.trace.json.gz under trace_dir; aggregate the
    device 'XLA Ops' track by hlo_category, source line, and op name."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # Map (pid, tid) -> track name; device ops live under a /device:TPU pid
    # on the 'XLA Ops' thread.
    proc = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    thread = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    by_cat = collections.defaultdict(lambda: [0.0, 0])
    by_src = collections.defaultdict(lambda: [0.0, 0])
    by_op = collections.defaultdict(lambda: [0.0, 0])
    by_src_cat = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "device" not in proc.get(e.get("pid"), ""):
            continue
        if thread.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if any(c in cat for c in CONTAINER_CATEGORIES):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        total += dur
        by_cat[cat][0] += dur
        by_cat[cat][1] += 1
        src = args.get("source", "?")
        by_src[src][0] += dur
        by_src[src][1] += 1
        by_op[e["name"]][0] += dur
        by_op[e["name"]][1] += 1
        # source × (category, op-name stem): which ops a hot source line is
        # actually made of — a bare source total can hide thousands of
        # scan-plumbing copies behind one dispatch-boundary line.
        stem = e["name"].split(".")[0]
        by_src_cat[f"{src} | {cat} | {stem}"][0] += dur
        by_src_cat[f"{src} | {cat} | {stem}"][1] += 1

    def rows(agg, mxu_key=None):
        out = [dict(name=k, total_us=round(v[0], 1), calls=v[1],
                    pct=round(100 * v[0] / total, 2) if total else 0.0)
               for k, v in agg.items()]
        if mxu_key:
            for r in out:
                r["mxu"] = any(m in r["name"] for m in MXU_CATEGORIES)
        out.sort(key=lambda r: -r["total_us"])
        return out

    cats = rows(by_cat, mxu_key=True)
    mxu_us = sum(r["total_us"] for r in cats if r.get("mxu"))
    return dict(trace=paths[-1], device_total_us=round(total, 1),
                mxu_us=round(mxu_us, 1),
                mxu_pct=round(100 * mxu_us / total, 2) if total else 0.0,
                categories=cats, sources=rows(by_src)[:25],
                ops=rows(by_op)[:40], source_ops=rows(by_src_cat)[:60])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--out", default="docs/logs/r4_profile_stretch.json")
    ap.add_argument("--trace_dir", default=None,
                    help="parse an existing trace instead of running")
    args = ap.parse_args()

    trace_dir = args.trace_dir
    result = None
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="stretch_trace_")
        os.environ["BENCH_PROFILE_DIR"] = trace_dir
        import bench

        result = bench.measure(compute_dtype="bfloat16", **bench.STRETCH_KW)
        print(json.dumps({k: round(v, 3) for k, v in result.items()}),
              flush=True)

    agg = aggregate_trace(trace_dir)
    if result is not None:
        agg["bench"] = {k: round(v, 3) for k, v in result.items()}
    elif os.path.exists(args.out):  # re-aggregating an existing trace:
        prev = json.load(open(args.out))  # keep its bench numbers
        if "bench" in prev:
            agg["bench"] = prev["bench"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=1)
    print(f"device total {agg['device_total_us']/1e3:.2f} ms (leaf ops), "
          f"MXU (dot/conv) {agg['mxu_pct']:.1f}%", flush=True)
    for key, title in (("categories", "hlo_category"), ("sources", "source")):
        print(f"\n{title:<62}{'ms':>9}{'calls':>7}{'%':>7}")
        for r in agg[key][:args.top]:
            print(f"{r['name'][:61]:<62}{r['total_us']/1e3:>9.2f}"
                  f"{r['calls']:>7}{r['pct']:>7.2f}")


if __name__ == "__main__":
    main()
