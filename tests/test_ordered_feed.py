"""Ordered-feed parity: the epoch-ordered contiguous-slice feed (bench.py /
train/loop.py default for the fused flat driver) must produce trajectories
bit-comparable to the masked row gather it replaces.

Why it exists: the r4/r5 device traces attribute 13-17% of stretch device
time to the per-step in-scan row gather's async DMA chain; epoch_order_data
+ _fetch_batch_ordered replace it with one epoch-sized gather plus one
dynamic slice per step. Same rows, same masks, same augment keys — only the
fetch op differs, so params/metrics must match to float-fusion noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, NamedSharding, P, make_mesh
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.utils.flatten import Flattener


def small_cfg(**kw):
    d = dict(img_size=16, patch_size=4, in_chans=1, embed_dim=64, depth=2,
             num_heads=4, pos_encoding="rope-axial",
             attention_impl="reference")
    d.update(kw)
    return ViTConfig(**d)


def test_fetch_ordered_unit():
    """_fetch_batch_ordered over epoch_order_data output reproduces the
    gather exactly, per shard, including the -1-padded final batch."""
    batch, n = 32, 72  # final batch has 8 real rows + 24 padding
    rng = np.random.default_rng(0)
    data_x = jnp.asarray(rng.integers(0, 256, (n, 8, 8, 1), dtype=np.uint8))
    data_y = jnp.asarray((np.arange(n) % 10).astype(np.int32))
    epoch_idx = ts.pad_epoch_indices(
        ts.epoch_indices(jax.random.PRNGKey(1), n, batch, True), 2)
    ox, oy = ts.epoch_order_data(data_x, data_y, epoch_idx)

    mesh = make_mesh(batch_size=batch, num_devices=8)
    n_shards = mesh.shape[DATA_AXIS]
    idx_sh = jax.device_put(epoch_idx, NamedSharding(mesh, P(None, DATA_AXIS)))
    rep = NamedSharding(mesh, P())

    from vit_rpe_rope_tpu.parallel.mesh import shard_map

    def fetch_all(ox, oy, idx_mat, dx, dy):
        def one(row):
            idx = jax.lax.dynamic_index_in_dim(idx_mat, row, 0,
                                               keepdims=False)
            a = ts._fetch_batch_ordered(ox, oy, idx, row, n_shards)
            b = ts._gather_batch(dx, dy, idx)
            return a, b

        return jax.vmap(one)(jnp.arange(idx_mat.shape[0]))

    f = jax.jit(shard_map(
        fetch_all, mesh,
        in_specs=(P(), P(), P(None, DATA_AXIS), P(), P()),
        out_specs=((P(None, DATA_AXIS), P(None, DATA_AXIS),
                    P(None, DATA_AXIS)),) * 2))
    (ix, iy, im), (gx, gy, gm) = f(
        jax.device_put(ox, rep), jax.device_put(oy, rep), idx_sh,
        jax.device_put(data_x, rep), jax.device_put(data_y, rep))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(gm))
    m = np.asarray(gm).astype(bool)
    np.testing.assert_array_equal(np.asarray(ix)[m], np.asarray(gx)[m])
    np.testing.assert_array_equal(np.asarray(iy)[m], np.asarray(gy)[m])


def _run_flat(feed: str, accum: int = 1, n_steps: int = 4, batch: int = 32):
    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=batch, epochs=2)
    # Non-multiple train size: exercises the masked partial batch AND (via
    # pad_epoch_indices) fully-padded guard rows under the ordered feed.
    bundle = datasets.synthetic("mnist", n_train=batch * n_steps - 12,
                                n_test=16, seed=3)
    mesh = make_mesh(batch_size=batch, num_devices=8)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = ts.make_optimizer(tcfg, n_steps)
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    fl = Flattener(vit.stack_block_params(params0, cfg))
    flat = jax.device_put(
        jax.jit(lambda q: fl.flatten(vit.stack_block_params(q, cfg)))(params0),
        rep)
    opt = jax.device_put(tx.init(flat), rep)
    k = 2
    epoch_idx = jax.device_put(
        ts.pad_epoch_indices(
            ts.epoch_indices(jax.random.PRNGKey(9), len(bundle.train_y),
                             batch, True), k * accum), idx_sh)
    fn = ts.make_flat_train_multi_step(
        cfg, tcfg, mesh, tx, pre, k, fl, apply_fn=vit.apply_stacked,
        guard_padded_steps=True, accum=accum, feed=feed)
    if feed == "ordered":
        dx, dy = jax.jit(ts.epoch_order_data,
                         out_shardings=(rep, rep))(dx, dy, epoch_idx)
        dy.block_until_ready()
    metrics = []
    for s in range(0, epoch_idx.shape[0], k * accum):
        flat, opt, m = fn(flat, opt, jnp.asarray([s, 0], jnp.int32),
                          dx, dy, epoch_idx)
        m.block_until_ready()
        metrics.append(np.asarray(m))
    return np.asarray(jax.device_get(flat)), np.concatenate(metrics)


def test_ordered_matches_gather_flat():
    p_g, m_g = _run_flat("gather")
    p_o, m_o = _run_flat("ordered")
    np.testing.assert_array_equal(m_o[:, 2], m_g[:, 2])  # counts exact
    np.testing.assert_allclose(m_o[:, 0], m_g[:, 0], rtol=1e-6)
    np.testing.assert_allclose(p_o, p_g, rtol=1e-6, atol=1e-7)


def test_ordered_matches_gather_accum():
    """feed='ordered' composes with gradient accumulation (each micro-row
    is its own contiguous slice of the ordered buffer)."""
    p_g, m_g = _run_flat("gather", accum=2)
    p_o, m_o = _run_flat("ordered", accum=2)
    np.testing.assert_array_equal(m_o[:, 2], m_g[:, 2])
    np.testing.assert_allclose(m_o[:, 0], m_g[:, 0], rtol=1e-6)
    np.testing.assert_allclose(p_o, p_g, rtol=1e-6, atol=1e-7)
