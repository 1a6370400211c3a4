"""Composed 4-axis parallelism (data × pipe × seq × model —
parallel/pp_tp_cp.py): forward parity vs the replicated model for every PE
mode, training trajectory parity vs plain DP on both dp2×pipe2×seq2 (lone
PP×CP, 'model' size 1) and pipe2×seq2×tp2, and the product surface (CLI).
The reference has no distribution layer (SURVEY.md §2 #20); this closes the
composition matrix the 3-axis modules (tp_cp.py, pp_tp.py) left open."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import pp_tp, pp_tp_cp
from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, PIPE_AXIS, SEQ_AXIS, NamedSharding, P, make_mesh,
    shard_map)
from vit_rpe_rope_tpu.train import train_step as ts


def mesh4(data=1, pipe=2, seq=2, model=2):
    return make_mesh(num_devices=data * pipe * seq * model,
                     model_parallel=model, seq_parallel=seq,
                     pipe_parallel=pipe)


def _prep(params, cfg):
    return vit.stack_block_params(tp.prepare_tp_params(params, cfg), cfg)


def test_make_mesh_4axis():
    m = mesh4()
    assert dict(m.shape) == {DATA_AXIS: 1, PIPE_AXIS: 2, SEQ_AXIS: 2,
                             MODEL_AXIS: 2}
    m2 = make_mesh(num_devices=8, seq_parallel=2, pipe_parallel=2)
    assert dict(m2.shape) == {DATA_AXIS: 2, PIPE_AXIS: 2, SEQ_AXIS: 2,
                              MODEL_AXIS: 1}


@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_apply_pp_tp_cp_matches_apply(pe):
    """pipe2 × seq2 × tp2 forward == the replicated forward for every PE
    mode (one block per stage, heads per model shard, tokens per seq shard,
    2 microbatches)."""
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding=pe,
                    attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)

    mesh = mesh4()
    prepped = _prep(params, cfg)
    specs = pp_tp.pp_tp_param_specs(prepped)
    fwd = shard_map(
        lambda p, xx: pp_tp_cp.apply_pp_tp_cp(p, xx, cfg, n_micro=2),
        mesh, in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(prepped, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_apply_pp_cp_without_tp():
    """The same module is the lone PP×CP driver when 'model' is size 1 (the
    Megatron psums degrade to no-ops): dp2 × pipe2 × seq2 forward parity."""
    cfg = ViTConfig(img_size=16, patch_size=4, in_chans=1, embed_dim=64,
                    depth=2, num_heads=4, pos_encoding="polynomial",
                    attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)

    mesh = mesh4(data=2, pipe=2, seq=2, model=1)
    prepped = _prep(params, cfg)
    specs = pp_tp.pp_tp_param_specs(prepped)
    fwd = shard_map(
        lambda p, xx: pp_tp_cp.apply_pp_tp_cp(p, xx, cfg, n_micro=2),
        mesh, in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(prepped, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mesh_shape,pe", [
    ((2, 2, 2, 1), "relative"),    # dp2 × pipe2 × seq2 — the PP×CP ask
    ((1, 2, 2, 2), "rope-mixed"),  # pipe2 × seq2 × tp2 — all model axes
])
def test_pp_tp_cp_training_matches_dp(mesh_shape, pe):
    """A 4-axis step must reproduce the 1-device DP trajectory — block grads
    local to their (stage, model) shard, every grad psum over
    ('data', 'seq'), replicated-use grads additionally over 'pipe',
    head-sliced PE grads additionally over 'model', each contribution
    counted exactly once."""
    data, pipe, seq, model = mesh_shape
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

    mesh = mesh4(data, pipe, seq, model)
    prepped = _prep(vit.init_params(jax.random.PRNGKey(0), cfg), cfg)
    specs = pp_tp.pp_tp_param_specs(prepped)
    shardings = {kk: NamedSharding(mesh, s) for kk, s in specs.items()}
    p2 = jax.device_put(prepped, shardings)
    o2 = jax.jit(tx.init)(p2)
    fn4 = ts.make_pp_tp_cp_train_step(cfg, tcfg, mesh, tx, pre, n_micro=2)
    dx2 = jax.device_put(bundle.train_x, NamedSharding(mesh, P()))
    dy2 = jax.device_put(bundle.train_y, NamedSharding(mesh, P()))
    ei2 = jax.device_put(ei, NamedSharding(mesh, P(None, DATA_AXIS)))
    losses_4 = []
    for s in range(3):
        p2, o2, m = fn4(p2, o2, jnp.asarray([s], jnp.int32), dx2, dy2, ei2)
        m.block_until_ready()
        losses_4.append(float(np.asarray(m)[0]))
    np.testing.assert_allclose(losses_4, losses_ref, rtol=1e-4)
    got = jax.device_get(jax.jit(
        lambda pp: tp.restore_reference_params(
            vit.unstack_block_params(pp, cfg), cfg),
        out_shardings=NamedSharding(mesh, P()))(p2))
    for kk in p_ref:
        np.testing.assert_allclose(np.asarray(got[kk]),
                                   np.asarray(p_ref[kk]),
                                   rtol=1e-4, atol=1e-5, err_msg=kk)


def test_fit_pp_cp_cli(tmp_path):
    """The 4-axis mode is reachable from the product surface: a CLI run with
    --pipeline_parallel 2 --sequence_parallel 2 on the 8-device mesh
    (dp2 × pipe2 × seq2 × model1) trains, evals, checkpoints with the
    reference key contract, and resumes."""
    from vit_rpe_rope_tpu.cli import train as cli_train

    base = [
        "--dataset", "mnist", "--pos_encoding", "relative",
        "--img_size", "16", "--patch_size", "4", "--embed_dim", "64",
        "--depth", "2", "--num_heads", "4",
        "--batch_size", "64", "--synthetic", "--epochs", "1",
        "--log_dir", str(tmp_path / "logs"),
        "--ckpt_dir", str(tmp_path / "ckpts"),
        "--attention_impl", "reference",
        "--pipeline_parallel", "2", "--sequence_parallel", "2"]
    summary = cli_train.main(base)
    assert summary["num_devices"] == 8
    assert summary["best_acc"] > 15.0
    ckpt = tmp_path / "ckpts" / "mnist_relative_best.npz"
    assert ckpt.exists()
    with np.load(ckpt) as z:
        keys = set(z.files)
        assert z["blocks.0.attn.qkv.weight"].shape == (192, 64)
    assert "pos_embed.relative_position_bias_table" in keys

    summary2 = cli_train.main(base + ["--epochs", "2", "--resume"])
    assert len(summary2["history"]) == 1
    assert summary2["history"][0]["epoch"] == 2
