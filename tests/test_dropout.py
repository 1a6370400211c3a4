"""Dropout / drop-path knobs (constructor parity with
/root/reference/models/vit.py:28,110-115; the reference accepts drop_rate /
attn_drop_rate and instantiates DropPath but never forwards them into blocks
(vit.py:200), so its effective rates are 0 — here they are functional
extensions, default 0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.models.vit import _drop_path, _dropout


def small_cfg(**kw):
    d = dict(img_size=16, patch_size=4, in_chans=1, embed_dim=64, depth=2,
             num_heads=4, pos_encoding="rope-axial",
             attention_impl="reference")
    d.update(kw)
    return ViTConfig(**d)


def test_rate_validation():
    with pytest.raises(ValueError):
        small_cfg(drop_rate=1.0)
    with pytest.raises(ValueError):
        small_cfg(attn_drop_rate=-0.1)


def test_dropout_unit_semantics():
    """Inverted dropout: outputs are exactly 0 or x/keep; mean preserved in
    expectation."""
    x = jnp.ones((1000, 16))
    y = np.asarray(_dropout(x, 0.3, jax.random.PRNGKey(0)))
    vals = np.unique(np.round(y, 6))
    np.testing.assert_allclose(sorted(vals), [0.0, 1.0 / 0.7], rtol=1e-5)
    assert abs(y.mean() - 1.0) < 0.05


def test_drop_path_zeroes_whole_samples():
    x = jnp.ones((64, 5, 8))
    y = np.asarray(_drop_path(x, 0.5, jax.random.PRNGKey(1)))
    per_sample = y.reshape(64, -1)
    # every sample is either all-zero or all-2.0 (1/keep)
    for row in per_sample:
        assert np.all(row == 0.0) or np.allclose(row, 2.0)
    assert 0 < (per_sample[:, 0] == 0).sum() < 64


def test_zero_rates_identical_with_or_without_rng():
    """rng supplied but all rates 0 -> byte-identical to the rng-less path."""
    cfg = small_cfg()
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    a = vit.apply(params, x, cfg)
    b = vit.apply(params, x, cfg, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonzero_rates_stochastic_in_train_deterministic_in_eval():
    cfg = small_cfg(drop_rate=0.2, attn_drop_rate=0.2, drop_path_rate=0.2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    t1 = vit.apply(params, x, cfg, rng=jax.random.PRNGKey(2))
    t2 = vit.apply(params, x, cfg, rng=jax.random.PRNGKey(3))
    t1b = vit.apply(params, x, cfg, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    # Eval (rng=None) ignores the rates entirely.
    e1 = vit.apply(params, x, cfg)
    e0 = vit.apply(params, x, small_cfg())
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
    assert np.isfinite(np.asarray(t1)).all()


def test_stacked_apply_matches_dropout_contract():
    """apply_stacked with rng: stochastic train, deterministic eval, same
    zero-rate guarantee as apply."""
    cfg = small_cfg(drop_rate=0.3)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    stacked = vit.stack_block_params(params, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    e = vit.apply_stacked(stacked, x, cfg)
    np.testing.assert_array_equal(np.asarray(e),
                                  np.asarray(vit.apply(params, x, cfg)))
    t1 = vit.apply_stacked(stacked, x, cfg, rng=jax.random.PRNGKey(5))
    assert not np.array_equal(np.asarray(t1), np.asarray(e))


def test_train_step_with_dropout_runs():
    """End-to-end: the DP train step consumes the dropout rng and trains
    (finite loss, params move)."""
    import optax

    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    cfg = small_cfg(drop_rate=0.1, drop_path_rate=0.1)
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=1)
    bundle = datasets.synthetic("mnist", n_train=32, n_test=8, seed=0)
    mesh = make_mesh(batch_size=16, num_devices=2)
    rep = NamedSharding(mesh, P())
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    opt = jax.device_put(tx.init(params), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(1), 32, 16, True),
        NamedSharding(mesh, P(None, DATA_AXIS)))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    p0 = np.asarray(params["head.weight"])
    params, opt, m = fn(params, opt, jnp.asarray([0], jnp.int32), dx, dy, ei)
    m = np.asarray(m)
    assert np.isfinite(m[0])
    assert not np.array_equal(np.asarray(params["head.weight"]), p0)


def test_dropout_masks_differ_across_epochs():
    """The per-step PRNG key folds in the epoch (step_arr[1]), so dropout
    masks/augment crops do NOT recur at step s of every epoch; same
    (epoch, step) stays reproducible."""
    import optax

    from vit_rpe_rope_tpu.data import datasets
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)
    from vit_rpe_rope_tpu.train import train_step as ts

    cfg = small_cfg(drop_rate=0.5)
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=1)
    bundle = datasets.synthetic("mnist", n_train=8, n_test=8, seed=0)
    mesh = make_mesh(batch_size=8, num_devices=1)
    rep = NamedSharding(mesh, P())
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.1)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    ei = jax.device_put(jnp.zeros((1, 8), jnp.int32),
                        NamedSharding(mesh, P(None, DATA_AXIS)))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)

    def one(step_arr):
        params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg),
                                rep)
        opt = jax.device_put(tx.init(params), rep)
        _, _, m = fn(params, opt, jnp.asarray(step_arr, jnp.int32),
                     dx, dy, ei)
        return float(np.asarray(m)[0])

    l_e0 = one([0, 0])
    l_e1 = one([0, 1])
    l_e0_again = one([0, 0])
    assert l_e0 == l_e0_again          # reproducible per (epoch, step)
    assert l_e0 != l_e1                # different masks across epochs
    assert one([0]) == l_e0            # legacy [s] form == epoch 0
