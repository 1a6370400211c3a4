"""Tensor parallelism: TP forward/gradient parity vs the replicated model on
a virtual mesh (data×model), for every PE mode that exercises a distinct
grad-sync path (SURVEY.md §2 #20 rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, NamedSharding, P, make_mesh, shard_map)
from vit_rpe_rope_tpu.train import train_step as ts


def small_cfg(pe="rope-mixed", **kw):
    d = dict(img_size=16, patch_size=4, in_chans=1, embed_dim=64, depth=2,
             num_heads=4, pos_encoding=pe, attention_impl="reference")
    d.update(kw)
    return ViTConfig(**d)


def tp_mesh(model=2, data=1):
    return make_mesh(num_devices=data * model, model_parallel=model)


def place_tp(mesh, params, cfg):
    prepped = tp.prepare_tp_params(params, cfg)
    specs = tp.tp_param_specs(prepped, cfg)
    return jax.device_put(
        prepped, {k: NamedSharding(mesh, s) for k, s in specs.items()}
    ), specs


def test_qkv_relayout_roundtrip():
    cfg = small_cfg()
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    back = tp.restore_reference_params(tp.prepare_tp_params(params, cfg), cfg)
    np.testing.assert_array_equal(
        np.asarray(back["blocks.0.attn.qkv.weight"]),
        np.asarray(params["blocks.0.attn.qkv.weight"]))


@pytest.mark.parametrize("pe", ["absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_tp2_forward_matches_replicated(pe):
    cfg = small_cfg(pe)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)

    mesh = tp_mesh(model=2)
    tp_params, specs = place_tp(mesh, params, cfg)
    fwd = shard_map(
        lambda p, xx: tp.apply_tp(p, xx, cfg), mesh,
        in_specs=(specs, P()), out_specs=P())
    out = jax.jit(fwd)(tp_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pe", ["relative", "polynomial", "rope-mixed",
                                "absolute"])
def test_tp2_training_matches_dp(pe):
    """One mesh (data=2, model=2) TP+DP step must reproduce the plain DP
    step's params — including PE-table gradients that need the model-axis
    reduction."""
    cfg = small_cfg(pe)
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=64, n_test=8, seed=2)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)  # linear in grads: tight comparison
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    ei = ts.epoch_indices(jax.random.PRNGKey(7), 64, 16, True)

    # Reference: plain DP on 1 device.
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

    # TP=2 × DP=2 mesh.
    mesh = tp_mesh(model=2, data=2)
    params0b = vit.init_params(jax.random.PRNGKey(0), cfg)
    tp_params, specs = place_tp(mesh, params0b, cfg)
    opt0 = jax.tree_util.tree_map(jnp.asarray, optax.sgd(0.05).init(tp_params))
    opt0 = jax.device_put(opt0, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        ts.opt_specs_like(opt0, specs),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
    fn_tp = ts.make_tp_train_step(cfg, tcfg, mesh, tx, pre)
    rep = NamedSharding(mesh, P())
    dx2 = jax.device_put(bundle.train_x, rep)
    dy2 = jax.device_put(bundle.train_y, rep)
    ei2 = jax.device_put(ei, NamedSharding(mesh, P(None, DATA_AXIS)))
    p2, o2 = tp_params, opt0
    losses_tp = []
    for s in range(3):
        p2, o2, m = fn_tp(p2, o2, jnp.asarray([s], jnp.int32), dx2, dy2, ei2)
        m.block_until_ready()
        losses_tp.append(float(np.asarray(m)[0]))
    np.testing.assert_allclose(losses_tp, losses_ref, rtol=1e-4)
    p2_ref_layout = tp.restore_reference_params(jax.device_get(p2), cfg)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p2_ref_layout[k]), np.asarray(p_ref[k]),
            rtol=1e-4, atol=1e-5, err_msg=k)


def test_distributed_helpers_single_process():
    """Single-process semantics of the multi-host helpers: initialize() is a
    no-op and stage_per_host == device_put."""
    from vit_rpe_rope_tpu.parallel import distributed

    assert distributed.initialize() is False
    mesh = make_mesh(num_devices=4)
    x = np.arange(32, dtype=np.int32).reshape(8, 4)
    arr = distributed.stage_per_host(x, mesh, P(DATA_AXIS, None))
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == P(DATA_AXIS, None)


def test_fit_model_parallel_cli(tmp_path):
    """TP is reachable from the product surface: a CLI run with
    --model_parallel 2 on the virtual 8-device mesh (dp=4 × tp=2) trains,
    evals, checkpoints with the reference key contract, and resumes."""
    from vit_rpe_rope_tpu.cli import train as cli_train

    base = ["--dataset", "mnist", "--pos_encoding", "relative",
            "--img_size", "16", "--patch_size", "4", "--embed_dim", "64",
            "--depth", "2", "--num_heads", "4",
            "--batch_size", "64", "--synthetic",
            "--log_dir", str(tmp_path / "logs"),
            "--ckpt_dir", str(tmp_path / "ckpts"),
            "--attention_impl", "reference",
            "--model_parallel", "2"]
    summary = cli_train.main(base + ["--epochs", "1"])
    assert summary["num_devices"] == 8
    assert summary["best_acc"] > 15.0  # above 10% chance
    ckpt = tmp_path / "ckpts" / "mnist_relative_best.npz"
    assert ckpt.exists()
    with np.load(ckpt) as z:
        keys = set(z.files)
    # Reference layout + key contract (Q9) survives the TP relayout.
    assert "pos_embed.relative_position_bias_table" in keys
    assert "blocks.0.attn.qkv.weight" in keys
    with np.load(ckpt) as z:
        assert z["blocks.0.attn.qkv.weight"].shape == (192, 64)

    # Resume: continues from the TP-layout-roundtripped train state.
    summary2 = cli_train.main(base + ["--epochs", "2", "--resume"])
    assert len(summary2["history"]) == 1
    assert summary2["history"][0]["epoch"] == 2


def test_tp_dropout_replicated_across_model_axis():
    """Dropout masks on replicated activations must be identical on every
    model shard (else TP replication silently breaks)."""
    cfg = small_cfg("rope-axial", drop_rate=0.2, attn_drop_rate=0.1,
                    drop_path_rate=0.1)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    mesh = tp_mesh(model=2)
    tp_params, specs = place_tp(mesh, params, cfg)

    def fwd(p, xx):
        out = tp.apply_tp(p, xx, cfg, rng=jax.random.PRNGKey(5))
        # If any shard's activations diverged, mean-over-model != local.
        synced = jax.lax.pmean(out, MODEL_AXIS)
        return out, synced

    out, synced = jax.jit(shard_map(
        fwd, mesh, in_specs=(specs, P()), out_specs=(P(), P())))(tp_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(synced),
                               rtol=1e-6, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_tp_multi_step_matches_per_step():
    """k-fused TP dispatch (lax.scan inside shard_map) reproduces the
    per-step TP trajectory, including the guarded padded step."""
    cfg = small_cfg("relative")
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=20, n_test=8, seed=4)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    mesh = tp_mesh(model=2, data=2)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    # 20 examples / bs 8 -> 3 steps (last partial); pad to k=2 multiple -> 4.
    ei = ts.epoch_indices(jax.random.PRNGKey(5), 20, 8, True)

    def init():
        p0 = vit.init_params(jax.random.PRNGKey(0), cfg)
        tp_p, specs = place_tp(mesh, p0, cfg)
        o0 = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, tx.init(tp_p)),
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                ts.opt_specs_like(tx.init(tp_p), specs),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
        return tp_p, o0

    # per-step driver
    p1, o1 = init()
    fn1 = ts.make_tp_train_step(cfg, tcfg, mesh, tx, pre)
    ei1 = jax.device_put(ei, idx_sh)
    for s in range(3):
        p1, o1, m = fn1(p1, o1, jnp.asarray([s], jnp.int32), dx, dy, ei1)
        m.block_until_ready()

    # k=2 fused driver over the padded schedule
    p2, o2 = init()
    fn2 = ts.make_tp_train_step(cfg, tcfg, mesh, tx, pre, k=2,
                                guard_padded_steps=True)
    ei2 = jax.device_put(ts.pad_epoch_indices(ei, 2), idx_sh)
    for s in (0, 2):
        p2, o2, m = fn2(p2, o2, jnp.asarray([s], jnp.int32), dx, dy, ei2)
        m.block_until_ready()
    m = np.asarray(m)
    assert m[-1, 2] == 0  # padded no-op step reported count 0

    g1 = jax.device_get(p1)
    g2 = jax.device_get(p2)
    for kk in g1:
        np.testing.assert_allclose(np.asarray(g2[kk]), np.asarray(g1[kk]),
                                   rtol=1e-5, atol=1e-6, err_msg=kk)
