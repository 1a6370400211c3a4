"""Measure the fused-block Pallas kernel vs the XLA block forward on the real
chip, chained-scan timing (unchained micro-timings through the dispatch
tunnel are garbage — CLAUDE.md). Sweeps the kernel's batch_tile.

Usage: python scripts/bench_block_fused.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.ops import block_fused
from vit_rpe_rope_tpu.pe import rope_axial


def timed(fn, x, iters, tag):
    f = jax.jit(fn)
    out = f(x)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    out = f(x)
    out.block_until_ready()
    dt1 = time.perf_counter() - t0  # single dispatch (sanity)
    t0 = time.perf_counter()
    out = f(x)
    for _ in range(2):
        out = f(out)  # chain on output to defeat caching
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag}: {1e3 * dt / iters:.4f} ms per 6-block fwd "
          f"(chain avg; single-dispatch {1e3 * dt1 / iters:.4f})")
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    cfg = ViTConfig(pos_encoding="rope-axial", in_chans=3)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    freqs = rope_axial.freqs_cis(params, cfg)
    bp = [{name: params[f"blocks.{i}.{name}"]
           for name in vit.BLOCK_PARAM_NAMES} for i in range(cfg.depth)]
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 65, 192), jnp.float32)
    impl = "reference"

    def xla_chain(x0):
        def body(x, _):
            for i in range(cfg.depth):
                x = vit._block_body(bp[i], x, cfg, None, freqs, impl)
            # tiny nonlinearity keeps iterations data-dependent
            return x * (1.0 + 1e-6), None
        x, _ = jax.lax.scan(body, x0, None, length=args.iters)
        return x

    timed(xla_chain, x, args.iters, "XLA block fwd (reference impl)")

    def flash_chain(x0):
        cfgf = ViTConfig(pos_encoding="rope-axial", in_chans=3,
                         attention_impl="flash")
        def body(x, _):
            for i in range(cfg.depth):
                x = vit._block_body(bp[i], x, cfgf, None, freqs, "flash")
            return x * (1.0 + 1e-6), None
        x, _ = jax.lax.scan(body, x0, None, length=args.iters)
        return x

    timed(flash_chain, x, args.iters, "XLA blocks + Pallas flash attention")

    for bt in (8, 16):
        def fused_chain(x0, bt=bt):
            def body(x, _):
                for i in range(cfg.depth):
                    x = block_fused.block_forward(x, bp[i], cfg, freqs,
                                                  batch_tile=bt)
                return x * (1.0 + 1e-6), None
            x, _ = jax.lax.scan(body, x0, None, length=args.iters)
            return x
        try:
            timed(fused_chain, x, args.iters, f"fused block kernel bt={bt}")
        except Exception as e:
            print(f"fused block kernel bt={bt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
