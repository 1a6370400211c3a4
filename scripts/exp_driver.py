"""Round-5 driver experiment: where do bench.py:121's ~1,250 tiny copy/slice
ops per stretch step come from, and which fused-driver layout minimizes them?

The r5 re-trace (docs/logs/r5_profile_stretch_pre.json, source_ops) shows the
17% "dispatch boundary" bucket is NOT the data gather (scripts/exp_feed.py:
the gather is 18 µs/step): it is 729 copy-done + 523 async slice-done ops
PER STEP — the depth-stacked parameter slicing (13 leaves × 12 blocks ×
fwd/bwd), its pad-accumulate transpose, and the k-step scan's carry
round-trips. This measures the candidate layouts end-to-end on the real
chip (stretch config: ViT-S/16 @224, rope-mixed, bf16, bs64):

  flat_stacked  status quo — flat vector over DEPTH-STACKED leaves,
                apply_stacked (static [i] slices per block)
  flat_dict     flat vector over the ~100 REFERENCE-keyed leaves,
                vit.apply (no stacking; unflatten = contiguous 1-D views)
  dict_fused    reference-keyed dict end-to-end + the fused multi-tensor
                AdamW Pallas kernel (ops/fused_adamw) — no layout
                conversions anywhere

Usage: python scripts/exp_driver.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BATCH, STEPS = 64, 20


def run(variant: str) -> dict:
    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data.datasets import NORMALIZATION
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts
    from vit_rpe_rope_tpu.utils.flatten import Flattener

    cfg = ViTConfig(pos_encoding="rope-mixed", img_size=224, patch_size=16,
                    embed_dim=384, depth=12, in_chans=3,
                    compute_dtype="bfloat16")
    tcfg = TrainConfig(dataset="cifar10", batch_size=BATCH, epochs=20)
    mesh = make_mesh(batch_size=BATCH)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    data_x = jax.device_put(
        rng.integers(0, 256, (n, cfg.img_size, cfg.img_size, 3),
                     dtype=np.uint8), rep)
    data_y = jax.device_put((np.arange(n) % 10).astype(np.int32), rep)
    pre = ts.make_preprocess(cfg, *NORMALIZATION["cifar10"], cfg.img_size)
    tx = ts.make_optimizer(tcfg, STEPS)
    params_dict = vit.init_params(jax.random.PRNGKey(0), cfg)
    k = ts.pick_steps_per_dispatch(STEPS)

    if variant == "flat_stacked":
        stacked = vit.stack_block_params(params_dict, cfg)
        flattener = Flattener(stacked)
        params = jax.device_put(jax.jit(flattener.flatten)(stacked), rep)
        opt = jax.device_put(tx.init(params), rep)
        step_fn = ts.make_flat_train_multi_step(
            cfg, tcfg, mesh, tx, pre, k, flattener,
            apply_fn=vit.apply_stacked, guard_padded_steps=False)
    elif variant == "flat_dict":
        flattener = Flattener(params_dict)
        params = jax.device_put(jax.jit(flattener.flatten)(params_dict), rep)
        opt = jax.device_put(tx.init(params), rep)
        step_fn = ts.make_flat_train_multi_step(
            cfg, tcfg, mesh, tx, pre, k, flattener,
            apply_fn=vit.apply, guard_padded_steps=False)
    elif variant == "dict_fused":
        opt_init, step_fn = ts.make_fused_adamw_multi_step(
            cfg, tcfg, mesh, pre, k, STEPS, guard_padded_steps=False)
        params = jax.device_put(params_dict, rep)
        opt = jax.device_put(opt_init(params), rep)
    else:
        raise SystemExit(f"unknown variant {variant}")

    epoch_idx = jax.device_put(
        ts.pad_epoch_indices(
            ts.epoch_indices(jax.random.PRNGKey(1), n, BATCH, True), k),
        idx_sh)
    total_steps = epoch_idx.shape[0]
    params, opt, m = step_fn(params, opt, jnp.asarray([0], jnp.int32),
                             data_x, data_y, epoch_idx)
    m.block_until_ready()
    starts = list(range(0, total_steps, k))
    n_dispatch = max(2, (STEPS - 1) // k)
    t0 = time.perf_counter()
    measured = 0
    for i in range(n_dispatch):
        s = starts[(i + 1) % len(starts)]
        params, opt, m = step_fn(params, opt, jnp.asarray([s], jnp.int32),
                                 data_x, data_y, epoch_idx)
        measured += k
    m.block_until_ready()
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(m)).all()
    return dict(variant=variant,
                images_per_sec=round(BATCH * measured / dt, 1),
                step_ms=round(1e3 * dt / measured, 3))


def main():
    variants = sys.argv[1:] or ["flat_stacked", "flat_dict", "dict_fused"]
    for v in variants:
        print(json.dumps(run(v)), flush=True)


if __name__ == "__main__":
    main()
