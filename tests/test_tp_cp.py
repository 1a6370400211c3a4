"""Composed 3-axis parallelism (data × seq × model — parallel/tp_cp.py):
forward parity vs the replicated model for every PE mode, training
trajectory parity vs plain DP, and the product surface (config + CLI).
The reference has no distribution layer (SURVEY.md §2 #20); this is the
round-3 composition of the TP and CP extensions."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
from vit_rpe_rope_tpu.parallel import tp_cp
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, SEQ_AXIS, NamedSharding, P, make_mesh, shard_map)
from vit_rpe_rope_tpu.train import train_step as ts


def mesh3(data=2, seq=2, model=2):
    return make_mesh(num_devices=data * seq * model, model_parallel=model,
                     seq_parallel=seq)


def test_make_mesh_three_axes():
    m = mesh3()
    assert dict(m.shape) == {DATA_AXIS: 2, SEQ_AXIS: 2, MODEL_AXIS: 2}
    # Lone CP still folds onto the 2-axis mesh (back-compat).
    m2 = make_mesh(num_devices=4, seq_parallel=4)
    assert dict(m2.shape) == {DATA_AXIS: 1, MODEL_AXIS: 4}


@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_apply_tp_cp_matches_apply(pe):
    """dp2 × seq2 × tp2 forward == the replicated forward for every PE mode
    (heads sliced per model shard, tokens ring-sharded per seq shard,
    bias generated per (head-shard, row-shard, kv-chunk))."""
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding=pe,
                    attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)

    mesh = mesh3()
    prepped = tp.prepare_tp_params(params, cfg)
    specs = tp.tp_param_specs(prepped, cfg)
    fwd = shard_map(lambda p, xx: tp_cp.apply_tp_cp(p, xx, cfg), mesh,
                    in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(prepped, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("pe", ["relative", "rope-mixed"])
def test_tp_cp_training_matches_dp(pe):
    """A dp2 × seq2 × tp2 step must reproduce the 1-device DP trajectory —
    grads psum over (data, seq) everywhere plus 'model' for the head-sliced
    PE params, counting every (token, head) exactly once."""
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding=pe,
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=64, n_test=8, seed=2)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    ei = ts.epoch_indices(jax.random.PRNGKey(7), 64, 16, True)

    mesh1 = make_mesh(num_devices=1)
    rep1 = NamedSharding(mesh1, P())
    p = jax.device_put(params0, rep1)
    o = jax.device_put(tx.init(params0), rep1)
    fn = ts.make_train_step(cfg, tcfg, mesh1, tx, pre)
    dx = jax.device_put(bundle.train_x, rep1)
    dy = jax.device_put(bundle.train_y, rep1)
    ei1 = jax.device_put(ei, NamedSharding(mesh1, P(None, DATA_AXIS)))
    losses_ref = []
    for s in range(3):
        p, o, m = fn(p, o, jnp.asarray([s], jnp.int32), dx, dy, ei1)
        losses_ref.append(float(np.asarray(m)[0]))
    p_ref = jax.device_get(p)

    mesh = mesh3()
    prepped = tp.prepare_tp_params(
        vit.init_params(jax.random.PRNGKey(0), cfg), cfg)
    specs = tp.tp_param_specs(prepped, cfg)
    shardings = {kk: NamedSharding(mesh, s) for kk, s in specs.items()}
    p2 = jax.device_put(prepped, shardings)
    o2 = jax.jit(tx.init)(p2)
    fn3 = ts.make_tp_cp_train_step(cfg, tcfg, mesh, tx, pre)
    dx2 = jax.device_put(bundle.train_x, NamedSharding(mesh, P()))
    dy2 = jax.device_put(bundle.train_y, NamedSharding(mesh, P()))
    ei2 = jax.device_put(ei, NamedSharding(mesh, P(None, DATA_AXIS)))
    losses_3 = []
    for s in range(3):
        p2, o2, m = fn3(p2, o2, jnp.asarray([s], jnp.int32), dx2, dy2, ei2)
        m.block_until_ready()
        losses_3.append(float(np.asarray(m)[0]))
    np.testing.assert_allclose(losses_3, losses_ref, rtol=1e-4)
    got = jax.device_get(jax.jit(
        lambda pp: tp.restore_reference_params(pp, cfg),
        out_shardings=NamedSharding(mesh, P()))(p2))
    for kk in p_ref:
        np.testing.assert_allclose(np.asarray(got[kk]),
                                   np.asarray(p_ref[kk]),
                                   rtol=1e-4, atol=1e-5, err_msg=kk)


def test_config_accepts_every_pairwise_combo():
    TrainConfig(dataset="mnist", model_parallel=2, sequence_parallel=2)
    # PP × TP composes too (parallel/pp_tp.py — tests/test_pp_tp.py), and
    # since round 4 PP × SP rides the 4-axis mesh (parallel/pp_tp_cp.py —
    # tests/test_pp_tp_cp.py).
    TrainConfig(dataset="mnist", pipeline_parallel=2, model_parallel=2)
    TrainConfig(dataset="mnist", pipeline_parallel=2, sequence_parallel=2)


def test_fit_tp_cp_cli(tmp_path):
    """The composed mode is reachable from the product surface: a CLI run
    with --model_parallel 2 --sequence_parallel 2 on the 8-device mesh
    (dp2 × seq2 × tp2) trains, evals (gathered reference-layout params),
    and checkpoints with the reference key contract."""
    from vit_rpe_rope_tpu.cli import train as cli_train

    summary = cli_train.main([
        "--dataset", "mnist", "--pos_encoding", "relative",
        "--img_size", "16", "--patch_size", "4", "--embed_dim", "64",
        "--depth", "2", "--num_heads", "4",
        "--batch_size", "64", "--synthetic", "--epochs", "1",
        "--log_dir", str(tmp_path / "logs"),
        "--ckpt_dir", str(tmp_path / "ckpts"),
        "--attention_impl", "reference",
        "--model_parallel", "2", "--sequence_parallel", "2"])
    assert summary["num_devices"] == 8
    assert summary["best_acc"] > 15.0
    ckpt = tmp_path / "ckpts" / "mnist_relative_best.npz"
    assert ckpt.exists()
    with np.load(ckpt) as z:
        keys = set(z.files)
    assert "pos_embed.relative_position_bias_table" in keys
    assert "blocks.0.attn.qkv.weight" in keys
