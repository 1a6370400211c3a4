"""Long-sequence train-step timing (the VALIDATION.md "streaming" tables).

Full train step (fwd+bwd+update, make_train_step on a 1-device mesh) at
N = 4,097 (256px/4) or N = 16,385 (512px/4), d128 depth2, every PE mode,
attention_impl=flash — the regime the streaming kernels own (the XLA path
cannot run ≥8k: its [B, H, N, N] logits alone exceed HBM).

Usage: python scripts/bench_longseq.py [--n 16385|4097] [--pe MODE ...]
       [--steps 4] [--impl flash|auto]
Prints one JSON line per (pe, N): steady-state s/step from chained steps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CONFIGS = {
    4097: dict(img_size=256, batch=4),
    16385: dict(img_size=512, batch=2),
    65537: dict(img_size=1024, batch=1),   # 256² patches + cls, one chip
    262145: dict(img_size=2048, batch=1),  # 512² patches + cls — the fused
    # backward sweeps kv in ~9 segments; the materialized bias would be 1.1 TB
    409601: dict(img_size=2560, batch=1,
                 compute_dtype="bfloat16"),   # 640² patches + cls
    589825: dict(img_size=3072, batch=1,
                 compute_dtype="bfloat16"),   # 768² patches + cls. bf16
    # WITHOUT remat: the H=1 freq tables + lane-major lse leave enough HBM,
    # and remat's ~1.5× step-time cost (measured 15.95 vs 10.79 s/step at
    # N=262k) pushes the step past the tunnel's ~60 s execute wall.
    2096705: dict(img_size=5792, batch=1,
                  compute_dtype="bfloat16"),  # 1448² patches + cls — TWO
    # million tokens; bounded-driver (--q_chunk) territory only: the
    # attention alone is ~4x the N=1M step.
    1048577: dict(img_size=4096, batch=1, remat=True,
                  compute_dtype="bfloat16"),  # 1024² patches + cls — one
    # MILLION tokens. Memory-feasible with remat + bf16 (unrematerialized
    # bf16 block residuals alone approach the 16 GB HBM), but the step
    # (~150 s+) exceeds the axon tunnel's ~60 s execute wall — single-chip
    # 1M is INFRA-bound here, not memory-bound; it is the CP ring's
    # multi-chip territory (N/R per chip, one program per ring step).
}


def run(pe: str, n: int, steps: int, impl: str, remat=None, dtype=None,
        q_chunk: int = 0, kv_chunk: int = 0,
        force_ring: bool = False, grad_accum: int = 1) -> dict:
    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data.datasets import NORMALIZATION
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    spec = CONFIGS[n]
    cfg = ViTConfig(img_size=spec["img_size"], patch_size=4, in_chans=3,
                    embed_dim=128, depth=2, num_heads=4, pos_encoding=pe,
                    attention_impl=impl,
                    # The bounded driver schedules residency explicitly —
                    # remat is a monolithic-program knob it never needs.
                    remat=False if q_chunk else (
                        spec.get("remat", False) if remat is None else remat),
                    compute_dtype=spec.get("compute_dtype", "float32")
                    if dtype is None else dtype)
    assert cfg.seq_len == n, (cfg.seq_len, n)
    batch = spec["batch"]
    tcfg = TrainConfig(dataset="cifar10", batch_size=batch, epochs=2)
    if q_chunk:
        return _run_bounded(cfg, tcfg, spec, pe, n, steps, q_chunk, kv_chunk,
                            force_ring, grad_accum)
    assert grad_accum == 1, "--grad_accum needs --q_chunk (bounded driver)"
    mesh = make_mesh(batch_size=batch, num_devices=1)
    rep = NamedSharding(mesh, P())

    rng = np.random.default_rng(0)
    n_ex = batch * 2
    data_x = jax.device_put(
        rng.integers(0, 256, (n_ex, spec["img_size"], spec["img_size"], 3),
                     dtype=np.uint8), rep)
    data_y = jax.device_put((np.arange(n_ex) % 10).astype(np.int32), rep)
    pre = ts.make_preprocess(cfg, *NORMALIZATION["cifar10"],
                             spec["img_size"])
    tx = ts.make_optimizer(tcfg, 2)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    opt = jax.device_put(tx.init(params), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    idx = jax.device_put(ts.epoch_indices(jax.random.PRNGKey(1), n_ex,
                                          batch, True),
                         NamedSharding(mesh, P(None, DATA_AXIS)))

    t_c0 = time.perf_counter()
    params, opt, m = fn(params, opt, jnp.asarray([0], jnp.int32),
                        data_x, data_y, idx)
    m.block_until_ready()
    compile_s = time.perf_counter() - t_c0
    assert np.isfinite(np.asarray(m)[0]), f"non-finite loss {m}"

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt, m = fn(params, opt, jnp.asarray([0], jnp.int32),
                            data_x, data_y, idx)
    m.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return dict(pe=pe, n=n, impl=impl, batch=batch,
                step_s=round(dt, 4), compile_s=round(compile_s, 1),
                loss=round(float(np.asarray(m)[0]), 4))


def _run_bounded(cfg, tcfg, spec, pe, n, steps, q_chunk, kv_chunk=0,
                 force_ring=False, grad_accum=1):
    """Bounded-program stepping (train/bounded.py): the same step as MANY
    short programs — each attention program covers q_chunk query rows —
    for environments with a per-program execution deadline (this machine's
    tunnel kills any single program after ~60-70 s, which is the ONLY
    blocker for poly/rel at N>=589k and every mode at N=1M)."""
    from vit_rpe_rope_tpu.data.datasets import NORMALIZATION
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.train import train_step as ts
    from vit_rpe_rope_tpu.train.bounded import make_bounded_step

    batch = spec["batch"]
    pre = ts.make_preprocess(cfg, *NORMALIZATION["cifar10"],
                             spec["img_size"])
    tx = ts.make_optimizer(tcfg, 2)
    rng = np.random.default_rng(0)
    # grad_accum > 1: micro-batches behind a leading accumulation axis —
    # effective batch = grad_accum · batch with per-micro activation
    # residency (the 1M-2M regime's only way to form a batch).
    bshape = ((grad_accum, batch) if grad_accum > 1 else (batch,))
    imgs = jnp.asarray(rng.integers(
        0, 256, (*bshape, spec["img_size"], spec["img_size"], 3),
        dtype=np.uint8))
    labels = jnp.asarray(
        (np.arange(grad_accum * batch) % 10).astype(np.int32)
        .reshape(bshape))
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    mesh = None
    if force_ring:
        # Run the SPMD ring code path (shard_map + in-program lax.scan KV
        # ring + identity ppermute + dparam psum) on a 1-device mesh — the
        # hardware-validation knob for the bounded × seq composition when
        # only one real chip exists (a 1-device ring is numerically exact).
        # Inputs MUST be device_put onto the mesh: un-placed arrays are
        # re-placed through the tunnel's host path on EVERY dispatch
        # (measured 1.5-6.5 s per piece program vs ~30 ms placed).
        from vit_rpe_rope_tpu.parallel.mesh import (
            DATA_AXIS, NamedSharding, P, make_mesh)

        mesh = make_mesh(batch_size=batch, num_devices=1)
        rep = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P(DATA_AXIS) if grad_accum == 1
                            else P(None, DATA_AXIS))
        params = jax.device_put(params, rep)
        opt = jax.device_put(opt, rep)
        imgs = jax.device_put(imgs, dsh)
        labels = jax.device_put(labels, dsh)
    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=q_chunk,
                             kv_chunk=kv_chunk, mesh=mesh,
                             force_ring=force_ring, grad_accum=grad_accum)

    t_c0 = time.perf_counter()
    params, opt, m = step(params, opt, jnp.asarray([0], jnp.int32),
                          imgs, labels)
    m.block_until_ready()
    compile_s = time.perf_counter() - t_c0
    assert np.isfinite(np.asarray(m)[0]), f"non-finite loss {m}"

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt, m = step(params, opt, jnp.asarray([0], jnp.int32),
                              imgs, labels)
    m.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return dict(pe=pe, n=n,
                impl="bounded-ring" if force_ring else "bounded",
                batch=batch, grad_accum=grad_accum, q_chunk=q_chunk,
                kv_chunk=kv_chunk, n_programs_attn=step.n_chunks,
                step_s=round(dt, 4), compile_s=round(compile_s, 1),
                loss=round(float(np.asarray(m)[0]), 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="*", default=[16385])
    ap.add_argument("--pe", nargs="*",
                    default=["rope-axial", "polynomial", "relative"])
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--impl", default="flash")
    ap.add_argument("--remat", type=int, default=None,
                    help="override the config's remat (0/1)")
    ap.add_argument("--dtype", default=None,
                    help="override the config's compute_dtype")
    ap.add_argument("--q_chunk", type=int, default=0,
                    help="bounded-program stepping: query rows per "
                         "attention program (0 = monolithic step)")
    ap.add_argument("--kv_chunk", type=int, default=0,
                    help="bounded backward: also segment the key axis "
                         "(bounds dk/dv residency; needed at N=2M)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="bounded gradient accumulation: micro-batches per "
                         "optimizer step (effective batch = batch x accum)")
    ap.add_argument("--force_ring", action="store_true",
                    help="run the bounded driver's SPMD KV-ring code path "
                         "on a 1-device mesh (hardware validation of the "
                         "bounded × seq composition on one chip)")
    args = ap.parse_args()
    for n in args.n:
        for pe in args.pe:
            print(json.dumps(run(pe, n, args.steps, args.impl,
                                 remat=None if args.remat is None
                                 else bool(args.remat),
                                 dtype=args.dtype,
                                 q_chunk=args.q_chunk,
                                 kv_chunk=args.kv_chunk,
                                 force_ring=args.force_ring,
                                 grad_accum=args.grad_accum)), flush=True)


if __name__ == "__main__":
    main()
