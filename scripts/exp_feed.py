"""Round-5 feed experiment: how should the fused k-step driver fetch its
per-step batch from the resident on-device dataset buffer?

The r4 device trace (docs/profile_stretch_r4.md) attributes 13.4% of stretch
device time to the per-step batch gather at the dispatch boundary
(`bench.py:121`): inside the k-step lax.scan each step does
`data_x[idx]` over the full uint8 image buffer. This measures the
candidate replacements on the real chip, each as ONE jitted program that
scans T steps (chained on device, so the ~26 ms tunnel RTT is amortized):

  A per-step-gather   status quo: body gathers its 64 rows then consumes them
  B prologue-gather   one big gather of all T*B rows before the scan; the
                      scan consumes contiguous slices (scan xs)
  C double-buffer     the batch for step t+1 is gathered into the scan carry
                      while step t computes (gather is data-independent of
                      the compute, so the scheduler may overlap)
  D onehot-matmul     rows fetched as onehot[B,n]·data[n,D] on the MXU
                      (classic TPU gather-as-matmul; dataset pre-cast bf16)
  E slice-preshuffled scan consumes contiguous slices of a buffer that was
                      permuted ONCE (per epoch); permutation cost reported
                      separately

Each variant feeds the same consumer (uint8->f32 normalize + patchify +
one [D,32] matmul + sum) so the gather cannot be elided, and the consumer
is small enough that feed cost dominates the delta. Run on the real TPU:
  python scripts/exp_feed.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, B, T = 1280, 64, 20          # dataset rows, batch, steps per program
H = W = 224
C = 3
P_SZ = 16
D = P_SZ * P_SZ * C             # 768
NP = (H // P_SZ) * (W // P_SZ)  # 196
REPS = 6                        # chained program executions per timing


def consumer(u8_batch, w):
    """uint8 [B,H,W,C] -> scalar; mimics preprocess + patch embed."""
    x = u8_batch.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.25
    x = x.reshape(B, H // P_SZ, P_SZ, W // P_SZ, P_SZ, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, NP, D)
    return jnp.sum(jnp.einsum("bnd,de->bne", x, w))


def variant_a(data, idx, w):
    def body(acc, t):
        rows = jax.lax.dynamic_index_in_dim(idx, t, 0, keepdims=False)
        return acc + consumer(data[rows], w), None

    return jax.lax.scan(body, 0.0, jnp.arange(T))[0]


def variant_b(data, idx, w):
    flat = data[idx.reshape(-1)].reshape(T, B, H, W, C)

    def body(acc, xb):
        return acc + consumer(xb, w), None

    return jax.lax.scan(body, 0.0, flat)[0]


def variant_c(data, idx, w):
    first = data[jax.lax.dynamic_index_in_dim(idx, 0, 0, keepdims=False)]

    def body(carry, t):
        acc, cur = carry
        nxt_rows = jax.lax.dynamic_index_in_dim(
            idx, jnp.minimum(t + 1, T - 1), 0, keepdims=False)
        nxt = data[nxt_rows]
        return (acc + consumer(cur, w), nxt), None

    (acc, _), _ = jax.lax.scan(body, (0.0, first), jnp.arange(T))
    return acc


def variant_d(data_bf16_flat, idx, w):
    # data pre-cast to bf16 and pre-flattened to [N, H*W*C]
    def body(acc, t):
        rows = jax.lax.dynamic_index_in_dim(idx, t, 0, keepdims=False)
        onehot = jax.nn.one_hot(rows, N, dtype=jnp.bfloat16)
        xb = jnp.einsum("bn,nd->bd", onehot, data_bf16_flat)
        xb = xb.reshape(B, H, W, C).astype(jnp.uint8)
        return acc + consumer(xb, w), None

    return jax.lax.scan(body, 0.0, jnp.arange(T))[0]


def variant_e(shuffled, w):
    # shuffled: [T, B, H, W, C] pre-permuted buffer; scan slices it
    def body(acc, xb):
        return acc + consumer(xb, w), None

    return jax.lax.scan(body, 0.0, shuffled)[0]


def permute(data, perm):
    return data[perm].reshape(T, B, H, W, C)


def time_fn(fn, *args):
    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    return dt


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (N, H, W, C), dtype=np.uint8))
    idx = jnp.asarray(
        np.stack([rng.permutation(N)[:B] for _ in range(T)]).astype(np.int32))
    w = jnp.asarray(rng.normal(0, 0.02, (D, 32)).astype(np.float32))
    data_bf = jnp.asarray(np.asarray(data), jnp.bfloat16).reshape(N, -1)
    perm = idx.reshape(-1)

    results = {}
    results["A_per_step_gather"] = time_fn(jax.jit(variant_a), data, idx, w)
    results["B_prologue_gather"] = time_fn(jax.jit(variant_b), data, idx, w)
    results["C_double_buffer"] = time_fn(jax.jit(variant_c), data, idx, w)
    results["D_onehot_matmul"] = time_fn(jax.jit(variant_d), data_bf, idx, w)
    shuffled = jax.jit(permute)(data, perm)
    jax.block_until_ready(shuffled)
    results["E_slice_preshuffled"] = time_fn(jax.jit(variant_e), shuffled, w)
    results["E_permute_cost"] = time_fn(jax.jit(permute), data, perm)
    # Consumer-only floor: scan over a fixed resident [T,B,...] buffer with
    # no per-step fetch at all is variant E; the fetch cost of each variant
    # is its delta over E.
    floor = results["E_slice_preshuffled"]
    line = {
        "experiment": "r5_feed",
        "shapes": dict(N=N, B=B, T=T, img=H),
        "seconds_per_program": {k: round(v, 5) for k, v in results.items()},
        "ms_per_step_over_floor": {
            k: round(1e3 * (v - floor) / T, 4)
            for k, v in results.items() if k.startswith(("A", "B", "C", "D"))
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
