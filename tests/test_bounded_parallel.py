"""Bounded-program stepping composed with data and sequence parallelism
(train/bounded.py mesh=/seq_parallel=): gradient and loss parity with the
monolithic jax.grad oracle on multi-device CPU meshes.

The composition claim under test: the host schedule (q-chunk starts, buffer
scatter, gradient accumulation) is mesh-agnostic — under a mesh every
attention program becomes a shard_map'd KV ring (data parallelism being the
degenerate 1-hop ring), and the step still reproduces the oracle's loss and
every gradient, including the in-kernel dcoeff/dtable partials psum'd over
both mesh axes. This is what makes the 1M-2M-token single-chip envelope
(VALIDATION.md) a multi-chip capability: bounded stepping bounds program
duration, the ring bounds per-chip residency, both at once."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel.mesh import (
    DATA_AXIS, NamedSharding, P, make_mesh)
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.train.bounded import make_bounded_step


def _setup(pe, img=64, batch=4, depth=2):
    cfg = ViTConfig(img_size=img, patch_size=4, in_chans=3, embed_dim=64,
                    depth=depth, num_heads=2, pos_encoding=pe,
                    attention_impl="reference")
    tcfg = TrainConfig(dataset="cifar10", batch_size=batch, epochs=2)
    pre = ts.make_preprocess(cfg, *datasets.NORMALIZATION["cifar10"], img)
    tx = ts.make_optimizer(tcfg, steps_per_epoch=2)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, img, img, 3),
                                    dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 10, (batch,), dtype=np.int32))
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, tcfg, pre, tx, imgs, labels, params


def _oracle(params, cfg, pre, imgs, labels):
    def loss_fn(p):
        logits = vit.apply(p, pre(imgs), cfg)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return jnp.sum(losses) / labels.shape[0]

    return jax.value_and_grad(loss_fn)(params)


def _shard_inputs(mesh, imgs, labels):
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(imgs, dsh), jax.device_put(labels, dsh)


def _replicate(mesh, tree):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), tree)


def _run_and_compare(pe, mesh, seq_parallel, img=64, depth=2, batch=4,
                     q_chunk=512, rtol=2e-4, atol=3e-6, force_ring=False):
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(
        pe, img=img, batch=batch, depth=depth)
    ref_loss, ref_grads = _oracle(params, cfg, pre, imgs, labels)

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=q_chunk,
                             mm_dtype=jnp.float32, debug_grads=True,
                             mesh=mesh, seq_parallel=seq_parallel,
                             force_ring=force_ring)
    opt = tx.init(params)
    params_r = _replicate(mesh, dict(params))
    opt_r = _replicate(mesh, opt)
    imgs_s, labels_s = _shard_inputs(mesh, imgs, labels)
    _, _, metrics, grads = step(params_r, opt_r,
                                jnp.asarray([0], jnp.int32), imgs_s,
                                labels_s)
    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    assert float(metrics[2]) == labels.shape[0]
    assert set(grads) == set(ref_grads)
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=rtol, atol=atol, err_msg=f"{pe}: {key}")
    return step


@pytest.mark.parametrize("pe", ["rope-axial", "polynomial", "relative",
                                "absolute"])
def test_bounded_dp_matches_oracle(pe):
    """Pure data parallelism: 4-way batch shard, 1-hop ring."""
    mesh = make_mesh(batch_size=4)
    assert mesh.devices.size >= 4
    _run_and_compare(pe, mesh, seq_parallel=1)


@pytest.mark.parametrize("pe", ["rope-axial", "polynomial", "relative"])
def test_bounded_ring_one_chunk(pe):
    """dp2 x seq4: img=128 -> N=1025 -> n_pad=2048, nl=512 = one chunk per
    shard; the ring merge and the riding dk/dv accumulators do the work."""
    mesh = make_mesh(batch_size=2, model_parallel=4)
    step = _run_and_compare(pe, mesh, seq_parallel=4, img=128, depth=1,
                            batch=2)
    assert step.n_chunks == 1
    assert step.n_pad == 2048


@pytest.mark.parametrize("pe", ["rope-axial", "relative"])
def test_bounded_ring_multi_chunk(pe):
    """dp2 x seq4 with nl=1024 > q_chunk=512: the host time loop (2 chunks)
    nests around the in-program ring scan (4 hops) — 8 partial programs per
    block direction, scattered at LOCAL shard offsets."""
    mesh = make_mesh(batch_size=2, model_parallel=4)
    step = _run_and_compare(pe, mesh, seq_parallel=4, img=192, depth=1,
                            batch=2)
    assert step.n_chunks == 2
    assert step.n_pad == 4096


def test_bounded_force_ring_single_device():
    """force_ring on a 1-device mesh runs the exact ring code path (scan,
    merge, identity ppermute, psum) without a second device — the knob the
    hardware validation uses on the one real chip."""
    mesh = make_mesh(batch_size=2, num_devices=1)
    _run_and_compare("polynomial", mesh, seq_parallel=1, batch=2,
                     force_ring=True)


def test_bounded_dp_partial_batch_mask():
    """Padding examples of a final partial batch contribute nothing, with
    the batch sharded over 'data'."""
    pe = "rope-axial"
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(pe)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)

    def loss_fn(p):
        logits = vit.apply(p, pre(imgs), cfg)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return jnp.sum(losses * mask) / jnp.sum(mask)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(batch_size=4)
    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32, debug_grads=True,
                             mesh=mesh, seq_parallel=1)
    opt = tx.init(params)
    params_r = _replicate(mesh, dict(params))
    opt_r = _replicate(mesh, opt)
    imgs_s, labels_s = _shard_inputs(mesh, imgs, labels)
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(DATA_AXIS)))
    _, _, metrics, grads = step(params_r, opt_r,
                                jnp.asarray([0], jnp.int32), imgs_s,
                                labels_s, mask=mask_s)
    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    assert float(metrics[2]) == 3.0
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=2e-4, atol=3e-6, err_msg=key)


def test_bounded_evaluate_mesh():
    """Forward-only bounded evaluation under dp2 x seq2 matches the
    single-device bounded evaluate."""
    pe = "polynomial"
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(pe, img=128, depth=1,
                                                      batch=2)
    single = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                               mm_dtype=jnp.float32)
    ref = single.evaluate(dict(params), jnp.asarray([0], jnp.int32),
                          imgs, labels)

    mesh = make_mesh(batch_size=2, model_parallel=2)
    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32, mesh=mesh,
                             seq_parallel=2)
    params_r = _replicate(mesh, dict(params))
    imgs_s, labels_s = _shard_inputs(mesh, imgs, labels)
    got = step.evaluate(params_r, jnp.asarray([0], jnp.int32), imgs_s,
                        labels_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_fit_routes_bounded_seq_parallel(tmp_path, monkeypatch):
    """--q_chunk --sequence_parallel from the product surface: fit() builds
    the ('data', 'model') mesh, shards the gathered batch over 'data', and
    trains end-to-end through the bounded KV-ring driver."""
    import functools
    import os

    from vit_rpe_rope_tpu.data import datasets as ds
    from vit_rpe_rope_tpu.train.loop import fit

    monkeypatch.setattr(ds, "synthetic",
                        functools.partial(ds.synthetic, n_train=16,
                                          n_test=8))
    cfg = ViTConfig(img_size=28, patch_size=4, in_chans=1, embed_dim=32,
                    depth=1, num_heads=2, pos_encoding="relative")
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=1,
                       synthetic_data=True, q_chunk=512,
                       sequence_parallel=2, save_last=False,
                       log_dir=str(tmp_path), ckpt_dir=str(tmp_path))
    summary = fit(cfg, tcfg, verbose=False)
    assert summary["num_devices"] == 8  # dp4 x seq2
    hist = summary["history"]
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])
    assert 0.0 <= hist[0]["test_acc"] <= 100.0
    assert os.path.exists(summary["log_file"])


def test_bounded_mesh_rejects_kv_chunk():
    cfg, tcfg, pre, tx, *_ = _setup("rope-axial")
    mesh = make_mesh(batch_size=4)
    with pytest.raises(ValueError, match="kv_chunk"):
        make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512, kv_chunk=512,
                          mesh=mesh)


def test_bounded_seq_parallel_requires_mesh():
    cfg, tcfg, pre, tx, *_ = _setup("rope-axial")
    with pytest.raises(ValueError, match="mesh"):
        make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512, seq_parallel=2)
