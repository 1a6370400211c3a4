"""Training-loop tests: SPMD data-parallel equivalence on a virtual 8-device
mesh (SURVEY.md §4.4), integration smoke (§4.5), CSV/checkpoint side-effect
contracts, and optimizer/schedule semantics."""

import csv
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig, cosine_lr_by_epoch
from vit_rpe_rope_tpu.data import datasets
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, NamedSharding, P, make_mesh
from vit_rpe_rope_tpu.train import train_step as ts
from vit_rpe_rope_tpu.train.loop import fit


def small_cfg(**kw):
    d = dict(img_size=16, patch_size=4, in_chans=1, embed_dim=64, depth=2,
             num_heads=4, pos_encoding="rope-axial", attention_impl="reference")
    d.update(kw)
    return ViTConfig(**d)


def run_steps(num_devices, n_steps=4, batch=32, optimizer="sgd"):
    """Run n_steps of training on a mesh of `num_devices`; return params."""
    import optax

    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=batch, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=batch * n_steps + 8,
                                n_test=16, seed=3)
    mesh = make_mesh(batch_size=batch, num_devices=num_devices)
    assert mesh.devices.size == num_devices
    replicated = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx = jax.device_put(bundle.train_x, replicated)
    dy = jax.device_put(bundle.train_y, replicated)
    steps_per_epoch = -(-len(bundle.train_y) // batch)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    if optimizer == "sgd":
        # SGD is linear in the gradient, so 1-dev vs 8-dev differences stay at
        # float reduction-order level; AdamW would amplify near-zero grads to
        # ±lr (update ≈ lr·sign(g) while v̂ is tiny).
        tx = optax.sgd(0.05)
    else:
        tx = ts.make_optimizer(tcfg, steps_per_epoch)
    params = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg),
                            replicated)
    opt_state = jax.device_put(tx.init(params), replicated)
    step_fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    epoch_idx = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(9), len(bundle.train_y), batch,
                         True), idx_sh)
    metrics = []
    for s in range(n_steps):
        params, opt_state, m = step_fn(
            params, opt_state, jnp.asarray([s], jnp.int32), dx, dy, epoch_idx)
        metrics.append(np.asarray(m))
    return jax.device_get(params), np.stack(metrics)


def test_dp8_matches_single_device():
    """8-way shard_map DP must produce identical params to 1 device
    (same global batches, psum'd grads == full-batch grads)."""
    p1, m1 = run_steps(1)
    p8, m8 = run_steps(8)
    np.testing.assert_allclose(m8[:, 0], m1[:, 0], rtol=1e-5)  # losses
    np.testing.assert_array_equal(m8[:, 2], m1[:, 2])          # counts
    # `correct` can wiggle by a few at init: logits are near-tied across
    # classes, so fusion-order float noise flips argmax on tied examples.
    assert np.abs(m8[:, 1] - m1[:, 1]).max() <= 3
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_dp8_adamw_close_to_single_device():
    """With AdamW the comparison is necessarily looser (reduction-order noise
    through m/√v̂), but trajectories must stay within ~lr of each other."""
    p1, _ = run_steps(1, optimizer="adamw")
    p8, _ = run_steps(8, optimizer="adamw")
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   atol=2e-3, err_msg=k)


def test_partial_final_batch_masked():
    """The padded final batch must count only real examples."""
    cfg = small_cfg()
    bundle = datasets.synthetic("mnist", n_train=40, n_test=16, seed=1)
    mesh = make_mesh(batch_size=32, num_devices=8)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    eval_fn = ts.make_eval_step(cfg, mesh, pre)
    idx = ts.epoch_indices(jax.random.PRNGKey(0), 40, 32, False)
    assert idx.shape == (2, 32) and int((idx >= 0).sum()) == 40
    replicated = NamedSharding(mesh, P())
    idx_sh = jax.device_put(idx, NamedSharding(mesh, P(None, DATA_AXIS)))
    dx = jax.device_put(bundle.train_x, replicated)
    dy = jax.device_put(bundle.train_y, replicated)
    m0 = np.asarray(eval_fn(params, jnp.asarray([0], jnp.int32), dx, dy, idx_sh))[0]
    m1 = np.asarray(eval_fn(params, jnp.asarray([1], jnp.int32), dx, dy, idx_sh))[0]
    assert m0[2] == 32 and m1[2] == 8  # counts = real examples only


def test_cosine_schedule_matches_torch_semantics():
    sched = cosine_lr_by_epoch(1e-3, epochs=10, steps_per_epoch=7)
    # LR is constant within an epoch and follows 0.5·lr·(1+cos(pi·e/T)).
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(6)) == pytest.approx(1e-3)  # still epoch 0
    e5 = 0.5e-3 * (1 + np.cos(np.pi * 5 / 10))
    assert float(sched(5 * 7)) == pytest.approx(e5)
    assert float(sched(10 * 7)) == pytest.approx(0.0, abs=1e-12)


def test_fit_side_effects(tmp_path):
    """Integration smoke (SURVEY.md §4.5): CSV schema + naming, best
    checkpoint naming, learnability above chance."""
    cfg = small_cfg(pos_encoding="polynomial")
    tcfg = TrainConfig(dataset="mnist", batch_size=64, epochs=1,
                       synthetic_data=True, log_dir=str(tmp_path / "logs"),
                       ckpt_dir=str(tmp_path / "ckpts"), seed=0)
    summary = fit(cfg, tcfg, verbose=False)
    assert summary["best_acc"] > 30.0  # well above 10% chance
    csvs = glob.glob(str(tmp_path / "logs" / "mnist_polynomial_*.csv"))
    assert len(csvs) == 1
    with open(csvs[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["epoch", "train_loss", "train_acc", "test_loss",
                       "test_acc", "best_acc"]
    assert len(rows) == 2 and rows[1][0] == "1"
    ckpt = tmp_path / "ckpts" / "mnist_polynomial_best.npz"
    assert os.path.exists(ckpt)
    # Checkpoint carries the reference key contract incl. alias keys (Q9).
    with np.load(ckpt) as z:
        keys = set(z.files)
    assert "pos_embed.coefficients" in keys
    assert "blocks.0.attn.pos_encoding.coefficients" in keys
    assert "patch_embed.weight" in keys


def test_adamw_decays_all_params_like_torch():
    """torch AdamW with one param group decays every tensor incl. LayerNorm
    weights; optax.adamw with no mask must match that choice."""
    tcfg = TrainConfig(dataset="mnist", batch_size=4, epochs=1)
    tx = ts.make_optimizer(tcfg, steps_per_epoch=1)
    params = {"norm.weight": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"norm.weight": jnp.zeros((4,))}
    updates, _ = tx.update(grads, state, params)
    # zero grad → update is pure weight decay: -lr · wd · w ≠ 0
    assert float(jnp.abs(updates["norm.weight"]).max()) > 0


def test_resume_continues_training(tmp_path):
    """--resume restores params + optimizer + epoch and continues to the
    target epoch count; the resumed run's trajectory matches an uninterrupted
    run's CSV row count."""
    cfg = small_cfg(pos_encoding="absolute")
    common = dict(dataset="mnist", batch_size=64, synthetic_data=True,
                  log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "c"),
                  seed=0)
    s1 = fit(cfg, TrainConfig(epochs=1, **common), verbose=False)
    last = tmp_path / "c" / "mnist_absolute_last.npz"
    assert os.path.exists(last)
    s2 = fit(cfg, TrainConfig(epochs=2, resume=True, **common), verbose=False)
    # resumed run trains only epoch 2 (history holds exactly 1 new epoch)
    assert len(s2["history"]) == 1 and s2["history"][0]["epoch"] == 2
    assert s2["best_acc"] >= s1["best_acc"]


def test_train_state_roundtrip(tmp_path):
    import optax

    from vit_rpe_rope_tpu.utils import checkpoint as ck

    cfg = small_cfg()
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    p = ck.save_train_state(str(tmp_path / "s"), params, opt, epoch=4,
                            best_acc=77.5)
    params2, opt2, next_epoch, best = ck.load_train_state(p, tx.init(params))
    assert next_epoch == 5 and best == 77.5
    for k in params:
        np.testing.assert_array_equal(np.asarray(params2[k]),
                                      np.asarray(params[k]))
    l1 = jax.tree_util.tree_leaves(opt)
    l2 = jax.tree_util.tree_leaves(opt2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_scan_matches_per_step():
    """K-step fused scan (with a padded no-op step) must reproduce the
    per-step driver's params exactly — including frozen optimizer state on
    padded steps."""
    import optax

    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=3 * 32 + 8, n_test=8, seed=4)
    mesh = make_mesh(batch_size=32, num_devices=4)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = ts.make_optimizer(tcfg, 4)
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    ei = ts.epoch_indices(jax.random.PRNGKey(5), len(bundle.train_y), 32, True)
    assert ei.shape[0] == 4  # 3 full + 1 partial batch

    # per-step driver
    p = jax.device_put(params0, rep)
    o = jax.device_put(tx.init(params0), rep)
    step_fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    ei_d = jax.device_put(ei, idx_sh)
    ms = []
    for s in range(4):
        p, o, m = step_fn(p, o, jnp.asarray([s], jnp.int32), dx, dy, ei_d)
        m.block_until_ready()
        ms.append(np.asarray(m))

    # K=3 fused driver: 4 steps pad to 6 (2 fully-padded no-op steps)
    k = 3
    ei_pad = jax.device_put(ts.pad_epoch_indices(ei, k), idx_sh)
    assert ei_pad.shape[0] == 6
    # fresh init: params0's buffers were donated into the per-step driver
    params0b = vit.init_params(jax.random.PRNGKey(0), cfg)
    p2 = jax.device_put(params0b, rep)
    o2 = jax.device_put(tx.init(params0b), rep)
    multi = ts.make_train_multi_step(cfg, tcfg, mesh, tx, pre, k)
    all_m = []
    for s in range(0, 6, k):
        p2, o2, m = multi(p2, o2, jnp.asarray([s], jnp.int32), dx, dy, ei_pad)
        m.block_until_ready()
        all_m.append(np.asarray(m))
    stacked = np.concatenate(all_m)
    assert (stacked[4:, 2] == 0).all()  # padded steps counted nothing
    np.testing.assert_allclose(stacked[:4, 0], [m[0] for m in ms], rtol=1e-5)
    p = jax.device_get(p)
    p2 = jax.device_get(p2)
    for key_ in p:
        np.testing.assert_allclose(np.asarray(p2[key_]), np.asarray(p[key_]),
                                   rtol=1e-5, atol=1e-6, err_msg=key_)


def test_profile_dir_writes_trace(tmp_path):
    """--profile_dir wraps the run in jax.profiler.trace (SURVEY.md §5.1)."""
    cfg = small_cfg(pos_encoding="none")
    tcfg = TrainConfig(dataset="mnist", batch_size=64, epochs=1,
                       synthetic_data=True, log_dir=str(tmp_path / "l"),
                       ckpt_dir=str(tmp_path / "c"),
                       profile_dir=str(tmp_path / "prof"))
    fit(cfg, tcfg, verbose=False)
    import glob as g

    files = g.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)
    assert any("xplane" in f or f.endswith(".trace.json.gz") for f in files), \
        files


def test_flat_driver_matches_dict_driver(tmp_path):
    """The flat-vector fused driver must produce the same training trajectory
    as the dict driver (same seed, same data) — identical CSV metrics."""
    cfg = small_cfg(pos_encoding="relative")
    common = dict(dataset="mnist", batch_size=64, epochs=1,
                  synthetic_data=True, seed=0)
    s_dict = fit(cfg, TrainConfig(log_dir=str(tmp_path / "l1"),
                                  ckpt_dir=str(tmp_path / "c1"),
                                  steps_per_dispatch=1, **common),
                 verbose=False)
    s_flat = fit(cfg, TrainConfig(log_dir=str(tmp_path / "l2"),
                                  ckpt_dir=str(tmp_path / "c2"),
                                  steps_per_dispatch=8, **common),
                 verbose=False)
    h1, h2 = s_dict["history"][0], s_flat["history"][0]
    # The stacked-scan program fuses differently than the unrolled one, so
    # float reduction noise (amplified per-step by AdamW's m/sqrt(v)) makes
    # full AdamW trajectories close-but-not-identical; exact equivalence is
    # proven under SGD in test_flat_driver_exact_under_sgd. Here just check
    # both runs train comparably and emit identical artifacts.
    assert abs(h1["train_loss"] - h2["train_loss"]) < 0.1
    assert h2["test_acc"] > 12.0 and h1["test_acc"] > 12.0  # above chance
    # checkpoints byte-comparable keys; params near-identical
    import numpy as _np

    z1 = _np.load(tmp_path / "c1" / "mnist_relative_best.npz")
    z2 = _np.load(tmp_path / "c2" / "mnist_relative_best.npz")
    assert set(z1.files) == set(z2.files)


def test_flat_driver_exact_under_sgd():
    """Decisive equivalence: the flat stacked-scan driver reproduces the
    per-step dict driver's params to float noise under SGD (linear in the
    gradient; AdamW would amplify fusion-order noise)."""
    import optax

    from vit_rpe_rope_tpu.utils.flatten import Flattener

    cfg = small_cfg(pos_encoding="relative")
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=2)
    b = datasets.synthetic("mnist", n_train=128, n_test=8, seed=4)
    mesh = make_mesh(batch_size=32, num_devices=4)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx, dy = jax.device_put(b.train_x, rep), jax.device_put(b.train_y, rep)
    pre = ts.make_preprocess(cfg, b.mean, b.std, 28)
    tx = optax.sgd(0.05)
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(3), 128, 32, True), idx_sh)

    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    p = jax.device_put(params0, rep)
    o = jax.device_put(tx.init(params0), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    for s in range(4):
        p, o, m = fn(p, o, jnp.asarray([s], jnp.int32), dx, dy, ei)
        m.block_until_ready()
    p_ref = jax.device_get(p)

    params0b = vit.init_params(jax.random.PRNGKey(0), cfg)
    fl = Flattener(vit.stack_block_params(params0b, cfg))
    flat = jax.device_put(
        jax.jit(lambda q: fl.flatten(vit.stack_block_params(q, cfg)))(params0b),
        rep)
    o2 = jax.device_put(tx.init(flat), rep)
    fnf = ts.make_flat_train_multi_step(cfg, tcfg, mesh, tx, pre, 4, fl,
                                        apply_fn=vit.apply_stacked)
    flat, o2, m = fnf(flat, o2, jnp.asarray([0], jnp.int32), dx, dy, ei)
    m.block_until_ready()
    p_flat = jax.device_get(
        jax.jit(lambda v: vit.unstack_block_params(fl.unflatten(v), cfg))(flat))
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_flat[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_augmentation():
    """On-device augmentation: flip/crop changes pixels deterministically per
    key, preserves shape and (mean-ish) statistics, and eval never augments."""
    cfg = small_cfg()
    pre_aug = ts.make_preprocess(cfg, np.array([0.0]), np.array([1.0]), 16,
                                 augment=True)
    pre_plain = ts.make_preprocess(cfg, np.array([0.0]), np.array([1.0]), 16)
    x = (np.arange(4 * 16 * 16 * 1) % 255).astype(np.uint8).reshape(4, 16, 16, 1)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a1 = np.asarray(pre_aug(x, k1))
    a1b = np.asarray(pre_aug(x, k1))
    a2 = np.asarray(pre_aug(x, k2))
    plain = np.asarray(pre_plain(x))
    assert a1.shape == plain.shape
    np.testing.assert_array_equal(a1, a1b)        # deterministic per key
    assert not np.array_equal(a1, a2)             # key changes the transform
    assert not np.array_equal(a1, plain)          # something actually moved
    # augment=False ignores the key entirely
    np.testing.assert_array_equal(np.asarray(pre_plain(x, k1)), plain)


def test_fit_with_augment(tmp_path):
    cfg = small_cfg(pos_encoding="absolute")
    tcfg = TrainConfig(dataset="mnist", batch_size=64, epochs=1,
                       synthetic_data=True, augment=True,
                       log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "c"))
    s = fit(cfg, tcfg, verbose=False)
    assert s["best_acc"] > 12.0


def test_fit_with_real_format_files(tmp_path):
    """End-to-end fit() reading standard MNIST IDX files from --data_dir (the
    non-synthetic path users hit on machines with real data)."""
    from tests.test_data import write_idx

    raw = tmp_path / "data" / "MNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    n_tr, n_te = 96, 32
    write_idx(raw / "train-images-idx3-ubyte",
              rng.integers(0, 256, (n_tr, 28, 28), dtype=np.uint8))
    write_idx(raw / "train-labels-idx1-ubyte",
              (np.arange(n_tr) % 10).astype(np.uint8))
    write_idx(raw / "t10k-images-idx3-ubyte",
              rng.integers(0, 256, (n_te, 28, 28), dtype=np.uint8))
    write_idx(raw / "t10k-labels-idx1-ubyte",
              (np.arange(n_te) % 10).astype(np.uint8))
    cfg = small_cfg(pos_encoding="absolute")
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=1,
                       data_dir=str(tmp_path / "data"),
                       log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "c"))
    s = fit(cfg, tcfg, verbose=False)
    # random pixels are unlearnable; the contract here is the pipeline runs
    # (resize 28->16 on device, partial batches masked) and emits artifacts.
    assert os.path.exists(tmp_path / "c" / "mnist_absolute_best.npz")
    assert len(s["history"]) == 1


def test_fused_adamw_driver_matches_optax_driver():
    """Dict-carry driver with the fused multi-tensor AdamW Pallas kernel
    must reproduce the optax per-step driver's trajectory (same math)."""
    cfg = small_cfg(pos_encoding="rope-axial")
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=2)
    b = datasets.synthetic("mnist", n_train=128, n_test=8, seed=4)
    mesh = make_mesh(batch_size=32, num_devices=4)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx, dy = jax.device_put(b.train_x, rep), jax.device_put(b.train_y, rep)
    pre = ts.make_preprocess(cfg, b.mean, b.std, 28)
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(3), 128, 32, True), idx_sh)

    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    tx = ts.make_optimizer(tcfg, 4)
    p = jax.device_put(params0, rep)
    o = jax.device_put(tx.init(params0), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre)
    for s in range(4):
        p, o, m = fn(p, o, jnp.asarray([s], jnp.int32), dx, dy, ei)
        m.block_until_ready()
    p_ref = jax.device_get(p)

    params0b = vit.init_params(jax.random.PRNGKey(0), cfg)
    opt_init, fnf = ts.make_fused_adamw_multi_step(
        cfg, tcfg, mesh, pre, 4, 4, guard_padded_steps=False)
    p2 = jax.device_put(params0b, rep)
    o2 = jax.device_put(opt_init(params0b), rep)
    p2, o2, m = fnf(p2, o2, jnp.asarray([0], jnp.int32), dx, dy, ei)
    m.block_until_ready()
    p2 = jax.device_get(p2)
    for key_ in p_ref:
        np.testing.assert_allclose(np.asarray(p2[key_]),
                                   np.asarray(p_ref[key_]),
                                   rtol=1e-4, atol=2e-6, err_msg=key_)


def test_dispatch_helpers():
    assert ts.pick_steps_per_dispatch(469) == 7    # 469 = 7 x 67
    assert ts.pick_steps_per_dispatch(391) == 23   # 391 = 17 x 23
    assert ts.pick_steps_per_dispatch(400) == 32 or \
        400 % ts.pick_steps_per_dispatch(400) == 0
    assert ts.pick_steps_per_dispatch(7) == 7
    assert ts.pick_steps_per_dispatch(1) == 1
    ei = ts.epoch_indices(jax.random.PRNGKey(0), 100, 32, False)
    assert ei.shape == (4, 32)
    padded = ts.pad_epoch_indices(ei, 3)
    assert padded.shape == (6, 32)
    assert int((padded[4:] == -1).all())
    np.testing.assert_array_equal(np.asarray(ts.pad_epoch_indices(ei, 4)),
                                  np.asarray(ei))  # already a multiple


def test_zero1_matches_replicated_optimizer():
    """ZeRO-1 (optimizer moments sharded over 'data', params all_gathered
    after the update) must reproduce the replicated flat driver's trajectory
    elementwise."""
    import optax

    from vit_rpe_rope_tpu.utils.flatten import Flattener

    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=32, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=64, n_test=8, seed=5)
    mesh = make_mesh(batch_size=32, num_devices=8)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = ts.make_optimizer(tcfg, 2)
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    ei = jax.device_put(
        ts.epoch_indices(jax.random.PRNGKey(3), 64, 32, True), idx_sh)

    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    flattener = Flattener(vit.stack_block_params(params, cfg))
    flat0 = jax.device_put(
        jax.jit(lambda p: flattener.flatten(vit.stack_block_params(p, cfg))
                )(params), rep)

    def run(zero1):
        flat = jax.device_put(jnp.array(flat0), rep)  # fresh: fn donates it
        if zero1:
            opt, _ = ts.init_zero1_opt_state(tx, flattener, mesh)
        else:
            opt = jax.device_put(tx.init(flat), rep)
        fn = ts.make_flat_train_multi_step(
            cfg, tcfg, mesh, tx, pre, 2, flattener,
            apply_fn=vit.apply_stacked, guard_padded_steps=False,
            zero1=zero1)
        p, o, m = fn(flat, opt, jnp.asarray([0], jnp.int32), dx, dy, ei)
        m.block_until_ready()
        return jax.device_get(p), np.asarray(m)

    p_ref, m_ref = run(zero1=False)
    p_z, m_z = run(zero1=True)
    np.testing.assert_allclose(m_z, m_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_z), np.asarray(p_ref),
                               rtol=1e-6, atol=1e-7)


def test_fit_with_zero1(tmp_path):
    """--zero1 end to end through fit(): trains, checkpoints, resumes."""
    cfg = small_cfg(pos_encoding="absolute")
    common = dict(dataset="mnist", batch_size=64, synthetic_data=True,
                  log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "c"),
                  seed=0, zero1=True)
    s1 = fit(cfg, TrainConfig(epochs=1, **common), verbose=False)
    assert s1["best_acc"] > 30.0
    assert os.path.exists(tmp_path / "c" / "mnist_absolute_best.npz")
    s2 = fit(cfg, TrainConfig(epochs=2, resume=True, **common), verbose=False)
    assert len(s2["history"]) == 1 and s2["history"][0]["epoch"] == 2


def test_resume_across_drivers(tmp_path):
    """The on-disk optimizer state is canonical (flat-vector moments), so a
    run can be resumed under a different driver: here a ZeRO-1 flat-driver
    run is resumed by the plain per-step dict driver and vice versa."""
    cfg = small_cfg(pos_encoding="absolute")
    common = dict(dataset="mnist", batch_size=64, synthetic_data=True,
                  log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "c"),
                  seed=0)
    fit(cfg, TrainConfig(epochs=1, zero1=True, **common), verbose=False)
    s2 = fit(cfg, TrainConfig(epochs=2, resume=True, zero1=False, **common),
             verbose=False)
    assert len(s2["history"]) == 1 and s2["history"][0]["epoch"] == 2
    s3 = fit(cfg, TrainConfig(epochs=3, resume=True, zero1=True, **common),
             verbose=False)
    assert len(s3["history"]) == 1 and s3["history"][0]["epoch"] == 3
    assert s3["best_acc"] >= s2["best_acc"] - 5.0  # trajectory continues


def test_grad_accum_matches_large_batch():
    """accum=2 over two bs-8 rows must produce the same optimizer step as one
    bs-16 row on the SAME 16 examples (normalization by the total real count
    makes the accumulated update bit-comparable)."""
    import optax

    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=32, n_test=8, seed=5)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    params0 = vit.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(num_devices=1)
    rep = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    order = np.arange(32, dtype=np.int32)

    # Reference: two bs-16 steps.
    p1 = jax.device_put(params0, rep)
    o1 = jax.device_put(tx.init(params0), rep)
    fn16 = ts.make_train_step(cfg, TrainConfig(dataset="mnist", batch_size=16,
                                               epochs=2), mesh, tx, pre)
    ei16 = jax.device_put(order.reshape(2, 16), idx_sh)
    losses16 = []
    for s in range(2):
        p1, o1, m = fn16(p1, o1, jnp.asarray([s], jnp.int32), dx, dy, ei16)
        m = np.asarray(m)
        losses16.append(float(m[0]))
        assert m[2] == 16
    # Accumulated: four bs-8 rows, accum=2 (row starts 0 and 2).
    p2 = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    o2 = jax.device_put(tx.init(params0), rep)
    fn8 = ts.make_train_step(cfg, tcfg, mesh, tx, pre, accum=2)
    ei8 = jax.device_put(order.reshape(4, 8), idx_sh)
    losses8 = []
    for s in (0, 2):
        p2, o2, m = fn8(p2, o2, jnp.asarray([s], jnp.int32), dx, dy, ei8)
        m = np.asarray(m)
        losses8.append(float(m[0]))
        assert m[2] == 16  # count = total REAL examples across the group
    np.testing.assert_allclose(losses8, losses16, rtol=1e-6)
    g1, g2 = jax.device_get(p1), jax.device_get(p2)
    for kk in g1:
        np.testing.assert_allclose(np.asarray(g2[kk]), np.asarray(g1[kk]),
                                   rtol=1e-5, atol=1e-7, err_msg=kk)


def test_grad_accum_partial_group_masks_padding():
    """An accumulation group whose second row is all padding (-1) must count
    only the real examples and still take a finite step."""
    import optax

    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=8, epochs=2)
    bundle = datasets.synthetic("mnist", n_train=12, n_test=8, seed=6)
    pre = ts.make_preprocess(cfg, bundle.mean, bundle.std, 28)
    tx = optax.sgd(0.05)
    mesh = make_mesh(num_devices=1)
    rep = NamedSharding(mesh, P())
    p = jax.device_put(vit.init_params(jax.random.PRNGKey(0), cfg), rep)
    o = jax.device_put(tx.init(jax.device_get(p)), rep)
    fn = ts.make_train_step(cfg, tcfg, mesh, tx, pre, accum=2)
    ei = ts.pad_epoch_indices(
        ts.epoch_indices(jax.random.PRNGKey(0), 12, 8, False), 2)
    assert ei.shape == (2, 8) and (np.asarray(ei)[1] == -1).sum() == 4
    ei = jax.device_put(ei, NamedSharding(mesh, P(None, DATA_AXIS)))
    dx = jax.device_put(bundle.train_x, rep)
    dy = jax.device_put(bundle.train_y, rep)
    p, o, m = fn(p, o, jnp.asarray([0], jnp.int32), dx, dy, ei)
    m = np.asarray(m)
    assert m[2] == 12 and np.isfinite(m[0])


def test_fit_with_grad_accum(tmp_path):
    """fit() with grad_accum=2: trains through the flat fused driver (rows
    strided by k*accum), logs per-optimizer-step metrics, checkpoints."""
    cfg = small_cfg()
    tcfg = TrainConfig(dataset="mnist", batch_size=16, epochs=1,
                       synthetic_data=True, grad_accum=2,
                       log_dir=str(tmp_path / "logs"),
                       ckpt_dir=str(tmp_path / "ckpts"))
    summary = fit(cfg, tcfg, verbose=False)
    assert summary["best_acc"] > 15.0
    assert os.path.exists(f"{tmp_path}/ckpts/mnist_rope-axial_best.npz")
