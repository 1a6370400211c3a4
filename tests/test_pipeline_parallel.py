"""Pipeline parallelism: staged forward parity vs the replicated model, a
PP+DP training trajectory vs plain DP (replicated-param grads need the
stage-axis psum; block grads stay stage-local), and the CLI surface
(SURVEY.md §2 #20 rebuild — depth scaling member of the distribution
layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel import pipeline_parallel as pp
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, NamedSharding, P, make_mesh, shard_map)
from vit_rpe_rope_tpu.train import train_step as ts


def small_cfg(pe="rope-axial", depth=4, **kw):
    d = dict(img_size=16, patch_size=4, in_chans=1, embed_dim=64, depth=depth,
             num_heads=4, pos_encoding=pe, attention_impl="reference")
    d.update(kw)
    return ViTConfig(**d)


def place_pp(mesh, params, cfg):
    stacked = vit.stack_block_params(params, cfg)
    specs = pp.pp_param_specs(stacked)
    return jax.device_put(
        stacked, {k: NamedSharding(mesh, s) for k, s in specs.items()}
    ), specs


@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_apply_pp_matches_apply(pe):
    """4-stage pipeline (1 block per stage), 2 microbatches: staged forward ==
    the replicated forward for every PE mode."""
    cfg = small_cfg(pe)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)

    mesh = make_mesh(num_devices=8, model_parallel=4)  # dp=2 × stages=4
    stacked, specs = place_pp(mesh, params, cfg)
    fwd = shard_map(
        lambda p, xx: pp.apply_pp(p, xx, cfg, n_micro=2), mesh,
        in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_apply_pp_single_stage_degenerates():
    """S=1 (no 'model' sharding) is plain microbatched execution."""
    cfg = small_cfg(depth=2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    ref = vit.apply(params, x, cfg)
    mesh = make_mesh(num_devices=2, model_parallel=1)
    stacked, specs = place_pp(mesh, params, cfg)
    fwd = shard_map(
        lambda p, xx: pp.apply_pp(p, xx, cfg, n_micro=2), mesh,
        in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("pe", ["relative", "rope-mixed"])
def test_pp_training_matches_dp(pe):
    """A dp=2 × stages=4 PP step must reproduce the plain 1-device DP step's
    params — embed/head/PE grads ride the stage-axis psum, block grads stay
    local to their owning stage."""
    cfg = small_cfg(pe)
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=64, n_test=8, seed=2)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
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

    mesh = make_mesh(num_devices=8, model_parallel=4)
    stacked, specs = place_pp(mesh, vit.init_params(jax.random.PRNGKey(0),
                                                    cfg), cfg)
    o2 = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, tx.init(stacked)),
        jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            ts.opt_specs_like(tx.init(stacked), specs),
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
    fn_pp = ts.make_pp_train_step(cfg, tcfg, mesh, tx, pre, n_micro=2)
    rep = NamedSharding(mesh, P())
    dx2 = jax.device_put(bundle.train_x, rep)
    dy2 = jax.device_put(bundle.train_y, rep)
    ei2 = jax.device_put(ei, NamedSharding(mesh, P(None, DATA_AXIS)))
    p2 = stacked
    losses_pp = []
    for s in range(3):
        p2, o2, m = fn_pp(p2, o2, jnp.asarray([s], jnp.int32), dx2, dy2, ei2)
        m.block_until_ready()
        losses_pp.append(float(np.asarray(m)[0]))
    np.testing.assert_allclose(losses_pp, losses_ref, rtol=1e-4)
    g2 = vit.unstack_block_params(jax.device_get(p2), cfg)
    for kk in p_ref:
        np.testing.assert_allclose(np.asarray(g2[kk]), np.asarray(p_ref[kk]),
                                   rtol=1e-4, atol=1e-5, err_msg=kk)


def test_fit_pipeline_parallel_cli(tmp_path):
    """PP is reachable from the product surface: --pipeline_parallel 2 on the
    virtual 8-device mesh (dp=4 × stages=2) trains, evals, checkpoints with
    the reference key contract, and resumes."""
    from vit_rpe_rope_tpu.cli import train as cli_train

    base = ["--dataset", "mnist", "--pos_encoding", "rope-axial",
            "--img_size", "16", "--patch_size", "4", "--embed_dim", "64",
            "--depth", "2", "--num_heads", "4",
            "--batch_size", "64", "--synthetic",
            "--log_dir", str(tmp_path / "logs"),
            "--ckpt_dir", str(tmp_path / "ckpts"),
            "--attention_impl", "reference",
            "--pipeline_parallel", "2"]
    summary = cli_train.main(base + ["--epochs", "1"])
    assert summary["num_devices"] == 8
    assert summary["best_acc"] > 15.0
    ckpt = tmp_path / "ckpts" / "mnist_rope-axial_best.npz"
    assert ckpt.exists()
    with np.load(ckpt) as z:
        keys = set(z.files)
    assert "pos_embed.inv_freq" in keys  # Q9 contract survives the PP layout
    assert "blocks.0.attn.qkv.weight" in keys
    with np.load(ckpt) as z:
        assert z["blocks.0.attn.qkv.weight"].shape == (192, 64)

    summary2 = cli_train.main(base + ["--epochs", "2", "--resume"])
    assert len(summary2["history"]) == 1
    assert summary2["history"][0]["epoch"] == 2


def test_pipeline_parallel_config_validation():
    # PP × TP composes (parallel/pp_tp.py — tests/test_pp_tp.py); since
    # round 4 PP × SP composes too (4-axis mesh — tests/test_pp_tp_cp.py).
    TrainConfig(dataset="mnist", pipeline_parallel=2, sequence_parallel=2)
    TrainConfig(dataset="mnist", pipeline_parallel=2, model_parallel=2)
    with pytest.raises(ValueError, match="pp_microbatches"):
        TrainConfig(dataset="mnist", pipeline_parallel=2, pp_microbatches=-1)


@pytest.mark.parametrize("pe", ["polynomial", "relative"])
def test_apply_pp_streaming_generated_bias_marker(monkeypatch, pe):
    """Above the (patched-down) streaming threshold with a bias-mode PE, the
    PP forward routes through the in-kernel-generated bias marker
    (_logits_bias) and must still match the replicated reference forward."""
    from vit_rpe_rope_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "STREAMING_THRESHOLD", 128)
    cfg = small_cfg(pe, depth=2, img_size=48,  # grid 12 -> N=145
                    attention_impl="flash")
    cfg_ref = small_cfg(pe, depth=2, img_size=48,
                        attention_impl="reference")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 48, 1))
    ref = vit.apply(params, x, cfg_ref)

    mesh = make_mesh(num_devices=4, model_parallel=2)  # dp=2 x stages=2
    stacked, specs = place_pp(mesh, params, cfg)
    fwd = shard_map(
        lambda p, xx: pp.apply_pp(p, xx, cfg, n_micro=2), mesh,
        in_specs=(specs, P(DATA_AXIS)), out_specs=P(DATA_AXIS))
    out = jax.jit(fwd)(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3,
                               atol=5e-4 if pe == "polynomial" else 2e-3)
