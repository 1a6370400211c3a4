"""ZeRO-1 × tensor parallelism (train_step.make_tp_train_step(zero1=True)):
the sharded-optimizer TP step must be elementwise-identical to the
replicated-optimizer TP step — the flat-vector ZeRO trick applied per model
shard (tp_local_flattener), moments sharded over 'data' on top of the TP
param sharding, params re-replicated by one tiled all_gather."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, NamedSharding, P, make_mesh)
from vit_rpe_rope_tpu.train import train_step as ts


def _setup():
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding="relative",
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=64, n_test=8, seed=2)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.adamw(1e-3)  # moments must matter for the parity to bite
    return cfg, tcfg, bundle, pre, tx


def _run(cfg, tcfg, bundle, pre, tx, mesh, zero1, steps=3):
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    prepped = tp.prepare_tp_params(params0, cfg)
    specs = tp.tp_param_specs(prepped, cfg)
    p = jax.device_put(prepped, {k: NamedSharding(mesh, s)
                                 for k, s in specs.items()})
    if zero1:
        o, _, _ = ts.init_tp_zero1_opt_state(tx, cfg, mesh)
    else:
        o = jax.jit(tx.init)(p)
    fn = ts.make_tp_train_step(cfg, tcfg, mesh, tx, pre, zero1=zero1)
    dx = jax.device_put(bundle.train_x, NamedSharding(mesh, P()))
    dy = jax.device_put(bundle.train_y, NamedSharding(mesh, P()))
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(7), 64, tcfg.batch_size, True),
        NamedSharding(mesh, P(None, DATA_AXIS)))
    losses = []
    for s in range(steps):
        p, o, m = fn(p, o, jnp.asarray([s], jnp.int32), dx, dy, ei)
        m.block_until_ready()
        losses.append(float(np.asarray(m)[0]))
    gathered = jax.device_get(jax.jit(
        lambda pp: tp.restore_reference_params(pp, cfg),
        out_shardings=NamedSharding(mesh, P()))(p))
    return losses, gathered


def test_zero1_tp_matches_replicated_optimizer():
    cfg, tcfg, bundle, pre, tx = _setup()
    mesh = make_mesh(num_devices=8, model_parallel=2)  # dp4 x tp2
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}

    losses_ref, p_ref = _run(cfg, tcfg, bundle, pre, tx, mesh, zero1=False)
    losses_z, p_z = _run(cfg, tcfg, bundle, pre, tx, mesh, zero1=True)

    np.testing.assert_allclose(losses_z, losses_ref, rtol=1e-5)
    for key in sorted(p_ref):
        np.testing.assert_allclose(
            np.asarray(p_z[key]), np.asarray(p_ref[key]),
            rtol=1e-5, atol=1e-7, err_msg=key)


def test_fit_zero1_tp_resume(tmp_path, monkeypatch):
    """--zero1 --model_parallel 2 from the product surface: fit() trains,
    checkpoints the canonical flat-moment form (reassembled from the
    per-model-shard ZeRO vectors), and resumes back into the sharded
    layout."""
    import functools
    import os

    from vit_rpe_rope_tpu.data import datasets as ds
    from vit_rpe_rope_tpu.train.loop import fit

    monkeypatch.setattr(ds, "synthetic",
                        functools.partial(ds.synthetic, n_train=32,
                                          n_test=16))
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding="relative",
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=1,
                       synthetic_data=True, zero1=True, model_parallel=2,
                       log_dir=str(tmp_path), ckpt_dir=str(tmp_path))
    summary = fit(cfg, tcfg, verbose=False)
    assert summary["num_devices"] == 8  # dp4 x tp2
    assert np.isfinite(summary["history"][0]["train_loss"])
    assert os.path.exists(f"{tmp_path}/mnist_relative_last.npz")

    tcfg2 = TrainConfig(dataset="mnist", batch_size=16, epochs=2,
                        synthetic_data=True, zero1=True, model_parallel=2,
                        resume=True, log_dir=str(tmp_path),
                        ckpt_dir=str(tmp_path))
    summary2 = fit(cfg, tcfg2, verbose=False)
    assert len(summary2["history"]) == 1
    assert summary2["history"][0]["epoch"] == 2


def test_zero1_tp_moment_memory_is_sharded():
    """The placed opt state's vector leaves really shard over both axes:
    per-device moment bytes = total_local / n_data."""
    cfg, tcfg, bundle, pre, tx = _setup()
    mesh = make_mesh(num_devices=8, model_parallel=2)
    o, specs, flt = ts.init_tp_zero1_opt_state(tx, cfg, mesh)
    vec_leaves = [l for l in jax.tree_util.tree_leaves(o)
                  if getattr(l, "ndim", 0) >= 1]
    assert vec_leaves, "adamw state should have moment vectors"
    n_data = mesh.shape[DATA_AXIS]
    padded = ts.zero1_shard_size(flt.total, n_data) * n_data
    for leaf in vec_leaves:
        assert leaf.shape[0] == 2 * padded  # T * padded, T=2
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert shard_shape[0] == padded // n_data
