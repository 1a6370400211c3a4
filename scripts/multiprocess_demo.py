"""Multi-process (multi-host-style) data-parallel training demo/harness.

Runs ONE member of a jax.distributed cluster: joins the coordinator, builds
a global mesh spanning every process's devices, stages data per host
(parallel/distributed.py), and drives real optimizer steps whose gradient
psum crosses the process boundary (gloo on CPU — the DCN stand-in this
single-host machine allows; on real TPU pods the same code rides ICI/DCN).

Each process prints one line per step:
    step=<s> loss=<float> count=<n>
and a final `params_sum=<float>` digest. All processes must print identical
values (the model state is replicated), and they must match a single-process
run of the same seed/data — asserted by
tests/test_distributed_multiprocess.py, which launches two of these.

Usage (one per process):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python scripts/multiprocess_demo.py --coordinator localhost:PORT \
        --num_processes 2 --process_id I [--steps 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel import distributed
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    # Plain statement + explicit check (NOT an assert: python -O would strip
    # it and each process would silently run as its own 1-process cluster).
    ok = distributed.initialize(coordinator_address=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id)
    if not ok:
        raise RuntimeError("jax.distributed bootstrap failed")
    print(f"[p{args.process_id}] processes={jax.process_count()} "
          f"global_devices={len(jax.devices())} "
          f"local_devices={len(jax.local_devices())}", flush=True)

    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=32,
                    depth=1, num_heads=2, pos_encoding="rope-axial",
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="mnist", batch_size=args.batch_size, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=args.batch_size * args.steps,
                                n_test=8, seed=11)
    mesh = make_mesh(batch_size=args.batch_size)  # all global devices
    rep = NamedSharding(mesh, P())

    # The dataset is replicated (every host holds it all — the index matrix
    # does the per-shard routing); stage_per_host builds the global arrays
    # from each process's local contribution.
    data_x = distributed.stage_per_host(np.asarray(bundle.train_x), mesh, P())
    data_y = distributed.stage_per_host(np.asarray(bundle.train_y), mesh, P())
    ei = np.asarray(ts.epoch_indices(jax.random.PRNGKey(5),
                                     len(bundle.train_y), args.batch_size,
                                     True))
    epoch_idx = distributed.stage_per_host(ei, mesh, P(None, DATA_AXIS))

    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    opt = jax.device_put(tx.init(jax.device_get(params)), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    for s in range(args.steps):
        params, opt, m = fn(params, opt, jnp.asarray([s], jnp.int32),
                            data_x, data_y, epoch_idx)
        m = np.asarray(jax.device_get(m))
        print(f"step={s} loss={m[0]:.6f} count={m[2]:.0f}", flush=True)
    digest = float(sum(np.abs(np.asarray(jax.device_get(v))).sum()
                       for v in params.values()))
    print(f"params_sum={digest:.6f}", flush=True)


if __name__ == "__main__":
    main()
