"""REAL multi-process distributed training (SURVEY.md §5.8): two separate
OS processes join one jax.distributed cluster (gloo collectives on CPU — the
DCN stand-in this single-host machine allows), build a 4-device global mesh
(2 local devices each), stage data per host, and run data-parallel optimizer
steps whose gradient psum crosses the process boundary. Both processes must
agree with each other AND with a single-process run of the identical
seed/data — upgrading parallel/distributed.py from "single-process no-op
tested" to genuinely multi-process tested."""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiprocess_demo.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out):
    losses = [float(m) for m in re.findall(r"loss=([0-9.]+)", out)]
    digest = float(re.search(r"params_sum=([0-9.]+)", out).group(1))
    return losses, digest


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i), "--steps", "2"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        outs.append(out)
    assert "processes=2" in outs[0] and "global_devices=4" in outs[0]
    l0, d0 = _parse(outs[0])
    l1, d1 = _parse(outs[1])
    # The replicated train state must be identical on both processes.
    np.testing.assert_allclose(l1, l0, rtol=0)
    assert d1 == d0
    assert len(l0) == 2 and all(np.isfinite(l0))

    # And match the single-process trajectory on the same seed/data.
    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.models import vit
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=32,
                    depth=1, num_heads=2, pos_encoding="rope-axial",
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=16, n_test=8, seed=11)
    mesh = make_mesh(batch_size=8, num_devices=1)
    rep = NamedSharding(mesh, P())
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    opt = jax.device_put(tx.init(jax.device_get(params)), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(5), 16, 8, True),
        NamedSharding(mesh, P(None, DATA_AXIS)))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    ref_losses = []
    for s in range(2):
        params, opt, m = fn(params, opt, jnp.asarray([s], jnp.int32),
                            dx, dy, ei)
        ref_losses.append(float(np.asarray(m)[0]))
    np.testing.assert_allclose(l0, ref_losses, rtol=1e-5)
