"""ZeRO-1 × sequence/context parallelism
(train_step.make_cp_train_step(zero1=True)): the sharded-optimizer CP step
must be elementwise-identical to the replicated-optimizer CP step. CP grads
reach the update fully psum'd over BOTH mesh axes and params are replicated,
so the flat moment vector shards over the WHOLE data × seq device product
(2P/(n_data·R) moment bytes per chip) and the new params ride one tiled
all_gather over ('data', 'model') back to replicated."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
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
    p = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg),
                       NamedSharding(mesh, P()))
    if zero1:
        o, _, _ = ts.init_cp_zero1_opt_state(tx, cfg, mesh)
    else:
        o = jax.jit(tx.init)(p)
    fn = ts.make_cp_train_step(cfg, tcfg, mesh, tx, pre, zero1=zero1)
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
    return losses, jax.device_get(p)


@pytest.mark.parametrize("seq", [2, 4])
def test_zero1_cp_matches_replicated_optimizer(seq):
    cfg, tcfg, bundle, pre, tx = _setup()
    mesh = make_mesh(num_devices=8, model_parallel=seq)  # dp(8/seq) x seq
    assert dict(mesh.shape) == {DATA_AXIS: 8 // seq, MODEL_AXIS: seq}

    losses_ref, p_ref = _run(cfg, tcfg, bundle, pre, tx, mesh, zero1=False)
    losses_z, p_z = _run(cfg, tcfg, bundle, pre, tx, mesh, zero1=True)

    np.testing.assert_allclose(losses_z, losses_ref, rtol=1e-5)
    for key in sorted(p_ref):
        np.testing.assert_allclose(
            np.asarray(p_z[key]), np.asarray(p_ref[key]),
            rtol=1e-5, atol=1e-7, err_msg=key)


def test_fit_zero1_cp_resume(tmp_path, monkeypatch):
    """--zero1 --sequence_parallel 2 from the product surface: fit() trains,
    checkpoints the canonical flat-moment form (reassembled from the
    data × seq ZeRO vectors), and resumes back into the sharded layout."""
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
                       synthetic_data=True, zero1=True, sequence_parallel=2,
                       log_dir=str(tmp_path), ckpt_dir=str(tmp_path))
    summary = fit(cfg, tcfg, verbose=False)
    assert summary["num_devices"] == 8  # dp4 x seq2
    assert np.isfinite(summary["history"][0]["train_loss"])
    assert os.path.exists(f"{tmp_path}/mnist_relative_last.npz")

    tcfg2 = TrainConfig(dataset="mnist", batch_size=16, epochs=2,
                        synthetic_data=True, zero1=True, sequence_parallel=2,
                        resume=True, log_dir=str(tmp_path),
                        ckpt_dir=str(tmp_path))
    summary2 = fit(cfg, tcfg2, verbose=False)
    assert len(summary2["history"]) == 1
    assert summary2["history"][0]["epoch"] == 2


def test_zero1_cp_moment_memory_is_sharded():
    """The placed opt state's vector leaves really shard over the full
    device product: per-device moment length = padded / (n_data · seq)."""
    cfg, tcfg, bundle, pre, tx = _setup()
    mesh = make_mesh(num_devices=8, model_parallel=2)
    o, specs, flt = ts.init_cp_zero1_opt_state(tx, cfg, mesh)
    vec_leaves = [l for l in jax.tree_util.tree_leaves(o)
                  if getattr(l, "ndim", 0) >= 1]
    assert vec_leaves, "adamw state should have moment vectors"
    n_sh = mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
    padded = ts.zero1_shard_size(flt.total, n_sh) * n_sh
    for leaf in vec_leaves:
        assert leaf.shape[0] == padded
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert shard_shape[0] == padded // n_sh


def test_zero1_pipeline_still_rejected():
    with pytest.raises(ValueError, match="pipeline"):
        TrainConfig(zero1=True, pipeline_parallel=2)
    with pytest.raises(ValueError, match="3-axis"):
        TrainConfig(zero1=True, sequence_parallel=2, model_parallel=2)
