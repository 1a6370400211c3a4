"""Bounded-program train step (train/bounded.py): gradient and loss parity
with the monolithic jax.grad step in every PE mode, multi-chunk attention
correctness, and the two-step donation/update path.

The bounded driver re-expresses one optimizer step as many short programs
(host-scheduled per-piece vjp + per-q-chunk streaming attention kernels);
these tests pin it to the oracle: same loss, same gradients, to f32
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.train.bounded import make_bounded_step


def _setup(pe, img=64, batch=2, depth=2):
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
    """Monolithic loss + grads on the XLA reference-attention path."""

    def loss_fn(p):
        logits = vit.apply(p, pre(imgs), cfg)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return jnp.sum(losses) / labels.shape[0]

    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("pe", ["none", "absolute", "relative", "polynomial",
                                "rope-axial", "rope-mixed"])
def test_bounded_step_matches_monolithic_grads(pe):
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(pe)
    ref_loss, ref_grads = _oracle(params, cfg, pre, imgs, labels)

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32, debug_grads=True)
    opt = tx.init(params)
    _, _, metrics, grads = step(dict(params), opt,
                                jnp.asarray([0], jnp.int32), imgs, labels)

    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    assert float(metrics[2]) == labels.shape[0]
    assert set(grads) == set(ref_grads)
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=2e-4, atol=2e-6, err_msg=f"{pe}: {key}")


@pytest.mark.parametrize("pe", ["rope-axial", "relative"])
def test_bounded_step_multi_chunk(pe):
    """img=128 -> N=1025 -> n_pad=1536 = 3 q-chunks of 512: the attention
    really runs as multiple programs at global row offsets."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(pe, img=128, depth=1)
    ref_loss, ref_grads = _oracle(params, cfg, pre, imgs, labels)

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32, debug_grads=True)
    assert step.n_chunks == 3
    opt = tx.init(params)
    _, _, metrics, grads = step(dict(params), opt,
                                jnp.asarray([0], jnp.int32), imgs, labels)
    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=2e-4, atol=2e-6, err_msg=f"{pe}: {key}")


def test_bounded_step_trajectory_matches_train_step():
    """Two bounded optimizer steps == two monolithic make_train_step steps
    (same optimizer state evolution, same params), rope-axial."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup("rope-axial")
    from vit_rpe_rope_tpu.parallel.mesh import (
        DATA_AXIS, NamedSharding, P, make_mesh)

    mesh = make_mesh(batch_size=tcfg.batch_size, num_devices=1)
    rep = NamedSharding(mesh, P())
    mono = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    idx = jnp.arange(tcfg.batch_size, dtype=jnp.int32)[None, :]
    # Fresh leaf buffers per driver: both steps DONATE their params.
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)  # noqa: E731
    p_b, o_b = copy(params), tx.init(copy(params))
    p_m = jax.device_put(copy(params), rep)
    o_m = jax.device_put(tx.init(copy(params)), rep)
    data_x, data_y = (jax.device_put(imgs, rep),
                      jax.device_put(labels, rep))
    ms = []
    for s in range(2):
        p_m, o_m, m = mono(p_m, o_m, jnp.asarray([0, 0], jnp.int32),
                           data_x, data_y, idx)
        ms.append(np.asarray(m))

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32)
    for s in range(2):
        p_b, o_b, m_b = step(p_b, o_b, jnp.asarray([s], jnp.int32),
                             imgs, labels)
        np.testing.assert_allclose(np.asarray(m_b), ms[s], rtol=3e-5,
                                   atol=1e-6)
    for key in sorted(p_m):
        np.testing.assert_allclose(
            np.asarray(p_b[key]), np.asarray(p_m[key]), rtol=5e-4,
            atol=5e-6, err_msg=key)


def test_fit_routes_through_bounded_driver(tmp_path, monkeypatch):
    """--q_chunk from the CLI surface: fit() trains end-to-end through the
    bounded-program driver (gather -> bounded step -> metrics/CSV/ckpt)."""
    import functools

    from vit_rpe_rope_tpu.data import datasets as ds
    from vit_rpe_rope_tpu.train.loop import fit

    monkeypatch.setattr(ds, "synthetic",
                        functools.partial(ds.synthetic, n_train=24,
                                          n_test=16))
    cfg = ViTConfig(img_size=28, patch_size=4, in_chans=1, embed_dim=32,
                    depth=1, num_heads=2, pos_encoding="rope-axial")
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=1,
                       synthetic_data=True, q_chunk=512, save_last=False,
                       log_dir=str(tmp_path), ckpt_dir=str(tmp_path))
    summary = fit(cfg, tcfg, verbose=False)
    # Round 4: q_chunk composes with data parallelism — on the 8-device
    # test mesh the bounded driver now runs dp8 (1-hop KV ring per chunk).
    assert summary["num_devices"] == 8
    hist = summary["history"]
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])
    assert 0.0 <= hist[0]["test_acc"] <= 100.0
    import os
    assert os.path.exists(summary["log_file"])


def test_q_chunk_rejects_parallelism():
    with pytest.raises(ValueError, match="bounded-program"):
        TrainConfig(dataset="mnist", batch_size=8, epochs=1, q_chunk=512,
                    model_parallel=2)


def test_bounded_evaluate_matches_forward():
    cfg, tcfg, pre, tx, imgs, labels, params = _setup("polynomial")
    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32)
    m = np.asarray(step.evaluate(params, jnp.asarray([0], jnp.int32),
                                 imgs, labels))
    logits = vit.apply(params, pre(imgs), cfg)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    np.testing.assert_allclose(m[0], float(losses.mean()), rtol=2e-5,
                               atol=1e-6)
    want_correct = float((np.argmax(np.asarray(logits), -1)
                          == np.asarray(labels)).sum())
    assert m[1] == want_correct and m[2] == labels.shape[0]


def test_bounded_step_partial_batch_mask():
    """Masked examples (a final partial batch) contribute nothing to the
    gradient and the metrics count only real examples — same contract as
    train_step._gather_batch."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup("rope-axial", batch=4)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])

    def loss_fn(p):
        logits = vit.apply(p, pre(imgs), cfg)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return jnp.sum(losses * mask) / 2.0

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                             mm_dtype=jnp.float32, debug_grads=True)
    _, _, metrics, grads = step(dict(params), tx.init(params),
                                jnp.asarray([0], jnp.int32), imgs, labels,
                                mask)
    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    assert float(metrics[2]) == 2.0
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=2e-4, atol=2e-6, err_msg=key)


@pytest.mark.parametrize("pe", ["rope-axial", "polynomial", "relative"])
def test_bounded_step_kv_segmented(pe):
    """kv_chunk > 0: the backward also segments the key axis at the host
    level (3 q-chunks x 3 kv-segments of 512) — same gradients. Covers
    relative too: its windowed dtable path must stay exact under BOTH a
    nonzero q offset and a nonzero kv offset."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup(pe, img=128, depth=1)
    ref_loss, ref_grads = _oracle(params, cfg, pre, imgs, labels)

    step = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512, kv_chunk=512,
                             mm_dtype=jnp.float32, debug_grads=True)
    assert step.n_chunks == 3
    opt = tx.init(params)
    _, _, metrics, grads = step(dict(params), opt,
                                jnp.asarray([0], jnp.int32), imgs, labels)
    np.testing.assert_allclose(float(metrics[0]), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    for key in sorted(ref_grads):
        np.testing.assert_allclose(
            np.asarray(grads[key]), np.asarray(ref_grads[key]),
            rtol=2e-4, atol=2e-6, err_msg=f"{pe}: {key}")


def test_bounded_grad_accum_matches_concat_batch():
    """grad_accum=2 on two micro-batches of 2 == one bounded step on the
    concatenated batch of 4: same loss/metrics, same count-normalized
    gradients, same updated params (the count-weighted accumulation makes
    the update the concatenated batch's)."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup("rope-axial", batch=4)

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    concat = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                               mm_dtype=jnp.float32, debug_grads=True)
    p1, _, m1, g1 = concat(copy(params), tx.init(params),
                           jnp.asarray([0], jnp.int32), imgs, labels)

    accum = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                              mm_dtype=jnp.float32, debug_grads=True,
                              grad_accum=2)
    p2, _, m2, g2 = accum(copy(params), tx.init(params),
                          jnp.asarray([0], jnp.int32),
                          imgs.reshape(2, 2, *imgs.shape[1:]),
                          labels.reshape(2, 2))

    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=2e-5,
                               atol=1e-6)
    assert float(m2[2]) == 4.0
    for key in sorted(g1):
        np.testing.assert_allclose(np.asarray(g2[key]), np.asarray(g1[key]),
                                   rtol=2e-4, atol=2e-6, err_msg=key)
    for key in sorted(p1):
        np.testing.assert_allclose(np.asarray(p2[key]), np.asarray(p1[key]),
                                   rtol=5e-4, atol=5e-6, err_msg=key)


def test_bounded_grad_accum_masked_micro():
    """A padded example inside one micro-row: the count weighting keeps the
    accumulated update identical to the concat batch with the same mask."""
    cfg, tcfg, pre, tx, imgs, labels, params = _setup("rope-axial", batch=4)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    concat = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                               mm_dtype=jnp.float32, debug_grads=True)
    p1, _, m1, g1 = concat(copy(params), tx.init(params),
                           jnp.asarray([0], jnp.int32), imgs, labels, mask)

    accum = make_bounded_step(cfg, tcfg, tx, pre, q_chunk=512,
                              mm_dtype=jnp.float32, debug_grads=True,
                              grad_accum=2)
    p2, _, m2, g2 = accum(copy(params), tx.init(params),
                          jnp.asarray([0], jnp.int32),
                          imgs.reshape(2, 2, *imgs.shape[1:]),
                          labels.reshape(2, 2), mask.reshape(2, 2))

    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=2e-5,
                               atol=1e-6)
    assert float(m2[2]) == 3.0
    for key in sorted(g1):
        np.testing.assert_allclose(np.asarray(g2[key]), np.asarray(g1[key]),
                                   rtol=2e-4, atol=2e-6, err_msg=key)
    for key in sorted(p1):
        # Adam amplifies f32 accumulation-order noise where grads ~ 0:
        # the trajectory-test tolerance, not the raw-grad one.
        np.testing.assert_allclose(np.asarray(p2[key]), np.asarray(p1[key]),
                                   rtol=5e-4, atol=5e-6, err_msg=key)


def test_q_chunk_accepts_grad_accum():
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=1, q_chunk=512,
                       grad_accum=2)
    assert tcfg.q_chunk == 512 and tcfg.grad_accum == 2


def test_fit_bounded_grad_accum(tmp_path, monkeypatch):
    """--q_chunk --grad_accum 2 end-to-end: fit() pads the epoch to an
    accum multiple, gathers accum index rows per dispatch, and the bounded
    step accumulates them into one optimizer update."""
    import functools

    from vit_rpe_rope_tpu.data import datasets as ds
    from vit_rpe_rope_tpu.train.loop import fit

    monkeypatch.setattr(ds, "synthetic",
                        functools.partial(ds.synthetic, n_train=24,
                                          n_test=16))
    cfg = ViTConfig(img_size=28, patch_size=4, in_chans=1, embed_dim=32,
                    depth=1, num_heads=2, pos_encoding="rope-axial")
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=1,
                       synthetic_data=True, q_chunk=512, grad_accum=2,
                       save_last=False, log_dir=str(tmp_path),
                       ckpt_dir=str(tmp_path))
    summary = fit(cfg, tcfg, verbose=False)
    hist = summary["history"]
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])
    assert 0.0 <= hist[0]["test_acc"] <= 100.0
