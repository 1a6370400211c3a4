"""SPMD training/eval steps: everything from host→device copy through
optimizer update collapses into ONE jitted, shard_mapped function
(SURVEY.md §3.1 "TPU mapping").

Design:
* The whole dataset is staged on device as uint8 NHWC once per run; each step
  gathers its batch by indices, converts, (bilinearly) resizes, normalizes —
  all fused into the step program. No per-batch host→device copies.
* Epochs are driven by an on-device permutation reshaped to [steps, batch];
  the final partial batch is padded with index -1 and masked (the reference
  trains on the partial batch; masking reproduces its batch-mean semantics
  exactly instead of dropping or wrapping).
* shard_map over the ('data', 'model') mesh: batch indices are sharded along
  'data'; params/optimizer state are replicated; gradients and metric sums
  are lax.psum'd over 'data' (ICI all-reduce). The optimizer update is then
  computed identically on every shard.
* Loss is CrossEntropy (mean over real examples in the global batch) matching
  torch nn.CrossEntropyLoss + the reference loop (/root/reference/train.py:94-125).
* Optimizer: optax.adamw(b1=.9, b2=.999, eps=1e-8) with decoupled weight decay
  applied to ALL params (torch AdamW with a single param group does the same,
  /root/reference/train.py:195), LR = cosine-per-epoch schedule
  (/root/reference/train.py:196,205).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig, cosine_lr_by_epoch
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, P, shard_map
from vit_rpe_rope_tpu.utils.flatten import Flattener


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int):
    schedule = cosine_lr_by_epoch(tcfg.lr, tcfg.epochs, steps_per_epoch)
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=tcfg.weight_decay)


def make_preprocess(cfg: ViTConfig, mean, std, native_size: int,
                    augment: bool = False):
    """uint8 [B, h, w, C] -> normalized float [B, img, img, C], fused into
    the jitted step (no host-side transforms — the TPU-native replacement for
    the torchvision pipeline).

    augment=True adds on-device random horizontal flip + 4px pad-and-crop,
    keyed per (step, example). OFF by default: the reference trains with NO
    augmentation (SURVEY.md Q11) and its published accuracies reflect that.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def preprocess(images_u8, key=None):
        x = images_u8.astype(jnp.float32) / 255.0
        if native_size != cfg.img_size:
            b, _, _, c = x.shape
            x = jax.image.resize(
                x, (b, cfg.img_size, cfg.img_size, c), method="bilinear"
            )
        if augment and key is not None:
            x = _augment(x, key)
        return (x - mean) / std

    return preprocess


def _augment(x, key, pad: int = 4):
    """Random horizontal flip + pad-and-random-crop, vectorized over the
    batch (gather-based shifts; everything stays on device)."""
    b, hgt, wid, c = x.shape
    kf, ky, kx = jax.random.split(key, 3)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    oy = jax.random.randint(ky, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(kx, (b,), 0, 2 * pad + 1)
    rows = oy[:, None] + jnp.arange(hgt)[None, :]          # [B, H]
    cols = ox[:, None] + jnp.arange(wid)[None, :]          # [B, W]
    xp = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(xp, cols[:, None, :, None], axis=2)


def _gather_batch(data_x, data_y, idx):
    """Masked gather: idx == -1 marks padding of the final partial batch."""
    mask = (idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(idx, 0)
    return data_x[safe], data_y[safe], mask


def _fetch_batch_ordered(data_x, data_y, idx, row, n_shards: int):
    """Per-step batch fetch from EPOCH-ORDERED buffers (epoch_order_data):
    one contiguous dynamic slice instead of a row gather over the full
    dataset. The r4/r5 device traces attribute 13-17% of stretch device
    time to the in-scan row gather's per-row async DMA chain (~29k
    copy-start/done pairs per trace window); a contiguous slice is one
    DMA. idx (this shard's column block of the [steps, batch] index
    matrix) is kept only as the padding-mask source. Row `row` of the
    GLOBAL epoch order starts at row·(b_local·n_shards); this shard's
    block sits axis_index·b_local further in."""
    mask = (idx >= 0).astype(jnp.float32)
    b_local = idx.shape[0]
    off = (row * (b_local * n_shards)
           + jax.lax.axis_index(DATA_AXIS) * b_local)
    imgs = jax.lax.dynamic_slice_in_dim(data_x, off, b_local)
    labels = jax.lax.dynamic_slice_in_dim(data_y, off, b_local)
    return imgs, labels, mask


def epoch_order_data(data_x, data_y, epoch_idx):
    """Materialize one epoch's batches CONTIGUOUSLY (feed variant E,
    scripts/exp_feed.py): one big gather per EPOCH, amortized over all its
    steps, so the fused k-step scan fetches each batch as a single
    contiguous slice (_fetch_batch_ordered). Padded index entries (-1)
    duplicate row 0; they stay masked by epoch_idx exactly as in gather
    mode, so trajectories are bit-identical. jit this with replicated
    out_shardings (the per-shard offset math lives in the fetch).
    epoch_idx is the GLOBAL [steps, batch] matrix."""
    perm = jnp.maximum(epoch_idx.reshape(-1), 0)
    return data_x[perm], data_y[perm]


def _make_fetch(mesh, feed: str):
    """feed='gather' -> None (default masked row gather); feed='ordered' ->
    the contiguous-slice fetch over epoch-ordered buffers (callers must
    pass data through epoch_order_data for the current epoch_idx)."""
    if feed == "gather":
        return None
    if feed == "ordered":
        return functools.partial(_fetch_batch_ordered,
                                 n_shards=mesh.shape[DATA_AXIS])
    raise ValueError(f"unknown feed mode: {feed!r}")


def _loss_and_metrics(params, imgs, labels, mask, cfg, preprocess,
                      apply_fn=None, key=None):
    """Per-shard loss/metric SUMS (no data-axis collectives here: psum over
    'data' must stay OUTSIDE any function being differentiated — inside
    shard_map without replication checking, grad-of-psum transposes to
    another psum and over-counts gradients by the axis size). apply_fn
    defaults to the replicated model; tensor-parallel steps pass apply_tp
    (whose internal 'model'-axis psums are differentiated correctly because
    activations there are genuinely partial sums, not replicas)."""
    apply_fn = apply_fn or vit.apply
    if key is not None:
        # Train mode: one subkey for augmentation, one for dropout (the
        # latter only consumed when cfg has nonzero rates).
        aug_key, drop_key = jax.random.split(key)
        x = preprocess(imgs, aug_key)
        rng = drop_key if cfg.has_dropout else None
    else:
        x = preprocess(imgs)
        rng = None
    logits = (apply_fn(params, x, cfg) if rng is None
              else apply_fn(params, x, cfg, rng=rng))
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_sum = jnp.sum(losses * mask)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels).astype(jnp.float32) * mask)
    return loss_sum, correct


def _epoch_of(step_vec):
    """Epoch component of a driver step vector — [s, epoch] from the
    training loop, or legacy [s] (epoch 0) from direct callers/tests."""
    return step_vec[1] if step_vec.shape[0] > 1 else jnp.int32(0)


def _dp_step(p, o, step, data_x, data_y, epoch_idx, *, cfg, preprocess, tx,
             apply_fn, guard, seed=0, update_fn=None, epoch=0, accum=1,
             fetch=None):
    """One data-parallel optimizer step (runs inside shard_map). Shared by
    the per-step, fused-multi-step, and flat-vector drivers.

    guard=True freezes params AND optimizer state on fully-padded steps
    (count == 0, only possible when the epoch was padded to a dispatch
    multiple), keeping fused trajectories identical to per-step ones.

    update_fn(grads, opt_state, params) -> (new_params, new_opt_state)
    overrides the plain tx.update/apply_updates pair (ZeRO-1 sharded
    optimizer).

    accum > 1 = gradient accumulation: this optimizer step consumes the
    `accum` consecutive index rows step..step+accum-1, running forward AND
    backward per micro-row inside a lax.scan (activation memory stays one
    microbatch) and summing raw gradients; the final normalization by the
    total real-example count makes the update bit-comparable to a single
    step on the concatenated batch (augmentation keys differ per row).

    fetch(data_x, data_y, idx, row) -> (imgs, labels, mask) overrides the
    default masked row gather (the ordered-feed contiguous slice,
    _fetch_batch_ordered, when the caller passes epoch-ordered buffers).
    """
    def micro(pp, row):
        idx = jax.lax.dynamic_index_in_dim(epoch_idx, row, axis=0,
                                           keepdims=False)  # [local_bs]
        if fetch is None:
            imgs, labels, mask = _gather_batch(data_x, data_y, idx)
        else:
            imgs, labels, mask = fetch(data_x, data_y, idx, row)
        # Per-(epoch, row, shard) key for augmentation and dropout (dead code
        # eliminated by XLA when neither is enabled). The epoch fold matters:
        # without it the same masks/crops would recur at step s of EVERY
        # epoch.
        key = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), epoch), row),
            jax.lax.axis_index(DATA_AXIS))
        loss_sum, correct = _loss_and_metrics(
            pp, imgs, labels, mask, cfg, preprocess, apply_fn=apply_fn,
            key=key)
        return loss_sum, (correct, jnp.sum(mask))

    if accum == 1:
        # Global real-example count (constant w.r.t. params).
        m0 = (jax.lax.dynamic_index_in_dim(epoch_idx, step, axis=0,
                                           keepdims=False) >= 0)
        count = jax.lax.psum(jnp.sum(m0.astype(jnp.float32)), DATA_AXIS)
        safe_count = jnp.maximum(count, 1.0)

        def loss_fn(pp):
            loss_sum, aux = micro(pp, step)
            # Local share of the GLOBAL batch-mean loss; psum'ing its grads
            # below yields exactly the full-batch gradient.
            return loss_sum / safe_count, aux

        (local_loss, (correct, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        grads = jax.lax.psum(grads, DATA_AXIS)  # ICI all-reduce
        loss = jax.lax.psum(local_loss, DATA_AXIS)
    else:
        grad_fn = jax.value_and_grad(micro, has_aux=True)

        def body(carry, a):
            g_acc, l_acc, c_acc, m_acc = carry
            (ls, (cor, ms)), g = grad_fn(p, step + a)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            return (g_acc, l_acc + ls, c_acc + cor, m_acc + ms), None

        zeros = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), p)
        (grads, loss_sum, correct, msum), _ = jax.lax.scan(
            body, (zeros, 0.0, 0.0, 0.0), jnp.arange(accum))
        count = jax.lax.psum(msum, DATA_AXIS)
        safe_count = jnp.maximum(count, 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, DATA_AXIS) / safe_count, grads)
        loss = jax.lax.psum(loss_sum, DATA_AXIS) / safe_count
    correct = jax.lax.psum(correct, DATA_AXIS)
    if update_fn is not None:
        p_new, o_new = update_fn(grads, o, p)
    else:
        updates, o_new = tx.update(grads, o, p)
        p_new = optax.apply_updates(p, updates)
    if guard:
        live = count > 0
        p_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(live, new, old), p_new, p)
        o_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(live, new, old), o_new, o)
    return p_new, o_new, jnp.stack([loss, correct, count])


def _shard_train_fn(local_fn, mesh, opt_spec=None):
    """opt_spec: spec (or spec pytree) for the optimizer state — P() for the
    replicated drivers, a data-axis-sharded tree under ZeRO-1."""
    if opt_spec is None:
        opt_spec = P()
    sharded = shard_map(
        local_fn, mesh,
        in_specs=(P(), opt_spec, P(), P(), P(), P(None, DATA_AXIS)),
        out_specs=(P(), opt_spec, P()),
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx, preprocess,
                    accum: int = 1):
    """Returns jitted train_step(params, opt_state, step, data_x, data_y,
    epoch_idx) -> (params, opt_state, metrics[loss, correct, count]).
    `step[0]` is an index ROW; accum > 1 consumes rows step..step+accum-1
    as one accumulated optimizer step (see _dp_step)."""

    def local_step(params, opt_state, step, data_x, data_y, epoch_idx):
        return _dp_step(params, opt_state, step[0], data_x, data_y, epoch_idx,
                        cfg=cfg, preprocess=preprocess, tx=tx, apply_fn=None,
                        guard=False, seed=tcfg.seed, epoch=_epoch_of(step),
                        accum=accum)

    return _shard_train_fn(local_step, mesh)


def make_train_multi_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                          preprocess, k: int, accum: int = 1,
                          feed: str = "gather"):
    """K train steps fused into ONE dispatch via lax.scan inside shard_map —
    removes per-step host dispatch overhead (significant when the device sits
    behind a network tunnel; measured ~0.9 ms/step on this setup).

    Returns jitted fn(params, opt_state, start, data_x, data_y, epoch_idx) ->
    (params, opt_state, metrics [K, 3]). Fully-padded steps are guarded
    no-ops (see _dp_step). accum > 1 = each of the K optimizer steps
    accumulates `accum` consecutive index rows (start[0] is a row index;
    one dispatch spans k·accum rows)."""

    fetch = _make_fetch(mesh, feed)

    def local_multi(params, opt_state, start, data_x, data_y, epoch_idx):
        epoch = _epoch_of(start)

        def body(carry, step):
            p, o, m = _dp_step(*carry, step, data_x, data_y, epoch_idx,
                               cfg=cfg, preprocess=preprocess, tx=tx,
                               apply_fn=None, guard=True, seed=tcfg.seed,
                               epoch=epoch, accum=accum, fetch=fetch)
            return (p, o), m

        steps = start[0] + jnp.arange(k, dtype=jnp.int32) * accum
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), steps)
        return params, opt_state, metrics

    return _shard_train_fn(local_multi, mesh)


def pad_epoch_indices(epoch_idx, k: int):
    """Pad the [steps, batch] index matrix with -1 rows to a multiple of k
    (padded steps are no-ops in make_train_multi_step)."""
    steps = epoch_idx.shape[0]
    pad = (-steps) % k
    if pad == 0:
        return epoch_idx
    filler = jnp.full((pad, epoch_idx.shape[1]), -1, epoch_idx.dtype)
    return jnp.concatenate([epoch_idx, filler], axis=0)


def pick_steps_per_dispatch(steps_per_epoch: int, cap: int = 32) -> int:
    """Largest divisor of steps_per_epoch ≤ cap: no padded no-op steps, so
    the fused driver can skip the live-guard (three full-state selects)."""
    best = 1
    for k in range(2, min(cap, steps_per_epoch) + 1):
        if steps_per_epoch % k == 0:
            best = k
    return best


def zero1_shard_size(total: int, n_data: int) -> int:
    """Per-shard length of the padded flat vector under ZeRO-1."""
    return -(-total // n_data)


def _pad_vec(vec, n: int):
    pad = n - vec.shape[0]
    if pad == 0:
        return vec
    return jnp.concatenate([vec, jnp.zeros((pad,), vec.dtype)])


def _zero1_opt_specs(tx, padded: int):
    """(proto_state, spec_tree) for a ZeRO-1 optimizer over a padded flat
    vector: array leaves (moments) shard over 'data', scalars (the Adam step
    count) stay replicated."""
    proto = tx.init(jnp.zeros((padded,), jnp.float32))
    specs = jax.tree_util.tree_map(
        lambda leaf: P(DATA_AXIS) if getattr(leaf, "ndim", 0) >= 1 else P(),
        proto)
    return proto, specs


def init_zero1_opt_state(tx, flattener, mesh):
    """Optimizer state for ZeRO-1: moments exist only for THIS shard's slice
    of the (padded) flat parameter vector. Returns (opt_state, opt_specs)
    where opt_state is placed sharded over the data axis and opt_specs is
    the matching shard_map spec pytree (scalars like the Adam step count
    stay replicated)."""
    n_data = mesh.shape[DATA_AXIS]
    padded = zero1_shard_size(flattener.total, n_data) * n_data
    proto, specs = _zero1_opt_specs(tx, padded)
    from vit_rpe_rope_tpu.parallel.mesh import NamedSharding

    placed = jax.device_put(
        proto,
        jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
    return placed, specs


def tp_local_flattener(cfg, model_parallel: int):
    """Flattener over ONE model shard's local slice of the TP-prepared
    layout: global TP-prepared shapes with every MODEL_AXIS-sharded dim
    divided by the TP degree (what a device sees inside shard_map). The
    ZeRO-1 × TP composition flattens per (model shard); template arrays are
    metadata only."""
    import numpy as np

    from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS

    proto = tp.prepare_tp_params(vit.init_params(jax.random.PRNGKey(0), cfg),
                                 cfg)
    specs = tp.tp_param_specs(proto, cfg)
    local = {}
    for key, a in proto.items():
        shp = list(a.shape)
        for i, ax in enumerate(specs[key]):
            if ax == MODEL_AXIS:
                shp[i] //= model_parallel
        local[key] = np.zeros(shp, a.dtype)
    return Flattener(local)


def init_tp_zero1_opt_state(tx, cfg, mesh):
    """ZeRO-1 optimizer state for the TP driver: each (model, data) device
    holds Adam moments for 1/n_data of ITS model shard's padded flat param
    slice. Vector leaves are globally [T · padded], laid out model-major —
    spec P((MODEL_AXIS, DATA_AXIS)) on dim 0 — so the local view inside
    shard_map is exactly this device's [shard] slice; scalars (the Adam
    step count) stay replicated. Returns (opt_state, opt_specs,
    flattener)."""
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, NamedSharding

    t_par = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    flt = tp_local_flattener(cfg, t_par)
    padded = zero1_shard_size(flt.total, n_data) * n_data
    proto = tx.init(jnp.zeros((t_par * padded,), jnp.float32))
    specs = jax.tree_util.tree_map(
        lambda leaf: (P((MODEL_AXIS, DATA_AXIS))
                      if getattr(leaf, "ndim", 0) >= 1 else P()), proto)
    placed = jax.device_put(
        proto,
        jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
    return placed, specs, flt


def make_flat_train_multi_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                               preprocess, k: int, flattener, apply_fn=None,
                               guard_padded_steps: bool = True,
                               zero1: bool = False, accum: int = 1,
                               feed: str = "gather"):
    """make_train_multi_step on a FLAT parameter vector: the model unflattens
    inside the loss, gradients come back as one contiguous array, and the
    optimizer runs as a few large fused elementwise ops instead of hundreds
    of per-leaf kernels. Pair with vit.apply_stacked (depth-stacked params,
    lax.scan over blocks) so the unflatten/reflatten in fwd/bwd also stays at
    ~25 leaves. Mathematically identical to the dict driver (AdamW is
    elementwise; scan order matches the unrolled loop).

    zero1=True shards the OPTIMIZER STATE over the data axis (ZeRO stage 1,
    TPU-native): each shard holds moments for 1/n_data of the padded flat
    vector, updates its slice, and the new params ride one tiled all_gather
    over ICI back to replicated. Elementwise-identical to the replicated
    optimizer; memory for Adam moments drops from 2P per chip to 2P/n_data.
    Pass the opt state from init_zero1_opt_state."""

    base_apply = apply_fn or vit.apply

    def flat_apply(pf, imgs, cfg_, rng=None):
        return base_apply(flattener.unflatten(pf), imgs, cfg_, rng)

    n_data = mesh.shape[DATA_AXIS]
    shard = zero1_shard_size(flattener.total, n_data)
    padded = shard * n_data

    def zero1_update(grads, o, p):
        my = jax.lax.axis_index(DATA_AXIS)
        g_sh = jax.lax.dynamic_slice_in_dim(
            _pad_vec(grads, padded), my * shard, shard)
        p_sh = jax.lax.dynamic_slice_in_dim(
            _pad_vec(p, padded), my * shard, shard)
        updates, o_new = tx.update(g_sh, o, p_sh)
        p_sh = optax.apply_updates(p_sh, updates)
        p_full = jax.lax.all_gather(p_sh, DATA_AXIS, tiled=True)
        return p_full[:flattener.total], o_new

    fetch = _make_fetch(mesh, feed)

    def local_multi(flat, opt_state, start, data_x, data_y, epoch_idx):
        epoch = _epoch_of(start)

        def body(carry, step):
            p, o, m = _dp_step(*carry, step, data_x, data_y, epoch_idx,
                               cfg=cfg, preprocess=preprocess, tx=tx,
                               apply_fn=flat_apply,
                               guard=guard_padded_steps, seed=tcfg.seed,
                               update_fn=zero1_update if zero1 else None,
                               epoch=epoch, accum=accum, fetch=fetch)
            return (p, o), m

        steps = start[0] + jnp.arange(k, dtype=jnp.int32) * accum
        (flat, opt_state), metrics = jax.lax.scan(
            body, (flat, opt_state), steps)
        return flat, opt_state, metrics

    opt_spec = _zero1_opt_specs(tx, padded)[1] if zero1 else P()
    return _shard_train_fn(local_multi, mesh, opt_spec=opt_spec)


def make_fused_adamw_multi_step(cfg: ViTConfig, tcfg: TrainConfig, mesh,
                                preprocess, k: int, steps_per_epoch: int,
                                guard_padded_steps: bool = True):
    """K-step fused driver over DICT params with the fused multi-tensor
    AdamW Pallas kernel (ops/fused_adamw): no flat/stacked layout conversions
    anywhere — the model runs unrolled on the reference-keyed dict and the
    whole optimizer is a handful of Pallas programs.

    Returns (init_opt_state, jitted step_fn) where step_fn(params, opt_state,
    start, data_x, data_y, epoch_idx) -> (params, opt_state, metrics [k, 3]).
    """
    from vit_rpe_rope_tpu.configs import cosine_lr_by_epoch
    from vit_rpe_rope_tpu.models import vit as vit_mod
    from vit_rpe_rope_tpu.ops.fused_adamw import make_fused_adamw

    schedule = cosine_lr_by_epoch(tcfg.lr, tcfg.epochs, steps_per_epoch)
    template = vit_mod.init_params(jax.random.PRNGKey(0), cfg)
    opt_init, opt_update = make_fused_adamw(
        template, schedule, weight_decay=tcfg.weight_decay)

    def local_multi(params, opt_state, start, data_x, data_y, epoch_idx):
        epoch = _epoch_of(start)

        def body(carry, step):
            p, o = carry
            idx = jax.lax.dynamic_index_in_dim(
                epoch_idx, step, axis=0, keepdims=False)
            imgs, labels, mask = _gather_batch(data_x, data_y, idx)
            count = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
            safe_count = jnp.maximum(count, 1.0)
            key = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(tcfg.seed), epoch),
                    step),
                jax.lax.axis_index(DATA_AXIS))

            def loss_fn(pp):
                loss_sum, correct = _loss_and_metrics(
                    pp, imgs, labels, mask, cfg, preprocess, key=key)
                return loss_sum / safe_count, correct

            (local_loss, correct), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            grads = jax.lax.psum(grads, DATA_AXIS)
            loss = jax.lax.psum(local_loss, DATA_AXIS)
            correct = jax.lax.psum(correct, DATA_AXIS)
            p_new, o_new = opt_update(grads, o, p)
            if guard_padded_steps:
                live = count > 0
                p_new = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(live, new, old), p_new, p)
                o_new = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(live, new, old), o_new, o)
            return (p_new, o_new), jnp.stack([loss, correct, count])

        steps = start[0] + jnp.arange(k, dtype=jnp.int32)
        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), steps)
        return params, opt_state, metrics

    return opt_init, _shard_train_fn(local_multi, mesh)


def opt_specs_like(opt_state, param_specs):
    """PartitionSpec pytree matching an optimizer state: leaves living under
    a param-named dict key (adam mu/nu) inherit that param's spec; scalars
    (step counts) are replicated."""
    def spec_for(path, leaf):
        del leaf
        for p in path:
            if isinstance(p, jax.tree_util.DictKey) and p.key in param_specs:
                return param_specs[p.key]
        return jax.sharding.PartitionSpec()

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)


def _make_model_axis_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                                preprocess, apply_fn, reduce_grads,
                                proto_params, param_specs, k: int,
                                guard_padded_steps: bool, accum: int = 1,
                                update_fn=None, opt_specs_override=None):
    """Shared skeleton of the model-axis drivers (TP / CP / PP / TP×CP):
    one DP×axis optimizer step with the augment/dropout key replicated
    across the second mesh axis (activations there must stay consistent),
    loss/metric psums over 'data', and a strategy-specific
    `reduce_grads(grads) -> grads` (this is the ONLY point where the
    strategies differ besides the forward). k-step fusion, padded-step
    guarding and accum follow make_train_multi_step — accum > 1 sums raw
    micro-row gradients in a lax.scan (one reduce_grads collective per
    OPTIMIZER step, not per microbatch) and normalizes by the global real
    count, bit-comparable to one step on the concatenated batch;
    params/optimizer are placed per `param_specs` / opt_specs_like."""
    guard = guard_padded_steps and k > 1

    def one_step(params, opt_state, step, data_x, data_y, epoch_idx,
                 epoch=0):
        def micro(p, row, key_src):
            idx = jax.lax.dynamic_index_in_dim(
                epoch_idx, row, axis=0, keepdims=False)
            imgs, labels, mask = _gather_batch(data_x, data_y, idx)
            key = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(tcfg.seed),
                                       epoch), key_src),
                jax.lax.axis_index(DATA_AXIS))
            loss_sum, correct = _loss_and_metrics(
                p, imgs, labels, mask, cfg, preprocess, apply_fn=apply_fn,
                key=key)
            return loss_sum, (correct, jnp.sum(mask))

        if accum == 1:
            idx = jax.lax.dynamic_index_in_dim(
                epoch_idx, step, axis=0, keepdims=False)
            count = jax.lax.psum(
                jnp.sum((idx >= 0).astype(jnp.float32)), DATA_AXIS)
            safe_count = jnp.maximum(count, 1.0)

            def loss_fn(p):
                loss_sum, (correct, _) = micro(p, step, step)
                return loss_sum / safe_count, correct

            (local_loss, correct), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = reduce_grads(grads)
            loss = jax.lax.psum(local_loss, DATA_AXIS)
        else:
            grad_fn = jax.value_and_grad(
                lambda p, row: micro(p, row, row), has_aux=True)

            def body(carry, a):
                g_acc, l_acc, c_acc, m_acc = carry
                (ls, (cor, ms)), g = grad_fn(params, step + a)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + ls, c_acc + cor, m_acc + ms), None

            zeros = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, x.dtype), params)
            (g_sum, loss_sum, correct, msum), _ = jax.lax.scan(
                body, (zeros, 0.0, 0.0, 0.0), jnp.arange(accum))
            count = jax.lax.psum(msum, DATA_AXIS)
            safe_count = jnp.maximum(count, 1.0)
            grads = jax.tree_util.tree_map(
                lambda g: g / safe_count, reduce_grads(g_sum))
            loss = jax.lax.psum(loss_sum, DATA_AXIS) / safe_count
        correct = jax.lax.psum(correct, DATA_AXIS)
        if update_fn is not None:  # e.g. the ZeRO-1 sharded optimizer
            p_new, o_new = update_fn(grads, opt_state, params)
        else:
            updates, o_new = tx.update(grads, opt_state, params)
            p_new = optax.apply_updates(params, updates)
        if guard:
            live = count > 0
            p_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), p_new, params)
            o_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), o_new, opt_state)
        return p_new, o_new, jnp.stack([loss, correct, count])

    if k == 1:
        def local_step(params, opt_state, step, data_x, data_y, epoch_idx):
            return one_step(params, opt_state, step[0], data_x, data_y,
                            epoch_idx, epoch=_epoch_of(step))
    else:
        def local_step(params, opt_state, start, data_x, data_y, epoch_idx):
            epoch = _epoch_of(start)

            def body(carry, step):
                p, o, m = one_step(*carry, step, data_x, data_y, epoch_idx,
                                   epoch=epoch)
                return (p, o), m

            steps = start[0] + jnp.arange(k, dtype=jnp.int32) * accum
            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), steps)
            return params, opt_state, metrics

    # Spec pytree from the optimizer-state STRUCTURE only (eval_shape — no
    # real moment arrays are allocated here).
    if opt_specs_override is not None:
        opt_specs = opt_specs_override
    else:
        opt_specs = opt_specs_like(jax.eval_shape(tx.init, proto_params),
                                   param_specs)
    sharded = shard_map(
        local_step, mesh,
        in_specs=(param_specs, opt_specs, P(), P(), P(), P(None, DATA_AXIS)),
        out_specs=(param_specs, opt_specs, P()),
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_tp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                       preprocess, k: int = 1,
                       guard_padded_steps: bool = True, accum: int = 1,
                       zero1: bool = False):
    """Data-parallel + tensor-parallel training step over the full
    ('data', 'model') mesh. Params must be TP-prepared
    (tensor_parallel.prepare_tp_params) and placed with tp_param_specs
    shardings; the optimizer state mirrors them (opt_specs_like).

    k > 1 fuses k steps into one dispatch via lax.scan (same contract as
    make_train_multi_step: epoch_idx padded to a multiple of k; fully-padded
    steps are guarded no-ops when guard_padded_steps).

    Gradient synchronization:
      * all grads psum over 'data' (standard DP);
      * grads of per-head PE params (relative table, polynomial coefficients,
        rope-mixed freqs) additionally psum over 'model' — each model shard
        only saw its own heads' contributions. Grads of replicated-use params
        (LN, patch embed, head, APE) are identical across 'model' and of
        sharded params are local-only; neither gets a model-axis reduction.

    zero1=True composes ZeRO-1 with TP: the flat-vector trick generalizes
    per MODEL SHARD — each device flattens its local TP slice of
    params/grads, updates only its 1/n_data stripe of the Adam moments
    (tp_local_flattener order), and the new local params ride one tiled
    all_gather over 'data' back to shard-replicated. Elementwise-identical
    to the replicated-optimizer TP step; moment memory drops from 2P/T per
    chip to 2P/(T·n_data). Pass the opt state from init_tp_zero1_opt_state.
    """
    from vit_rpe_rope_tpu import pe as pe_registry
    from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
    from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS

    pe_mod = pe_registry.get(cfg.pos_encoding)
    needs_model_sync = (pe_mod.KIND == PE_KIND_LOGITS_BIAS
                        or cfg.pos_encoding == "rope-mixed")
    pe_keys = set(pe_mod.init_params(jax.random.PRNGKey(0), cfg))

    def reduce_grads(grads):
        grads = jax.lax.psum(grads, DATA_AXIS)
        if needs_model_sync:
            grads = dict(grads)
            for pk in pe_keys:
                grads[pk] = jax.lax.psum(grads[pk], MODEL_AXIS)
        return grads

    update_fn = None
    opt_specs_override = None
    if zero1:
        n_data = mesh.shape[DATA_AXIS]
        flt = tp_local_flattener(cfg, mesh.shape[MODEL_AXIS])
        shard = zero1_shard_size(flt.total, n_data)
        padded = shard * n_data
        opt_specs_override = jax.tree_util.tree_map(
            lambda leaf: (P((MODEL_AXIS, DATA_AXIS))
                          if getattr(leaf, "ndim", 0) >= 1 else P()),
            jax.eval_shape(tx.init,
                           jax.ShapeDtypeStruct((shard,), jnp.float32)))

        def update_fn(grads, o, p):  # noqa: F811 — the ZeRO-1 × TP update
            my = jax.lax.axis_index(DATA_AXIS)
            g_sh = jax.lax.dynamic_slice_in_dim(
                _pad_vec(flt.flatten(grads), padded), my * shard, shard)
            p_sh = jax.lax.dynamic_slice_in_dim(
                _pad_vec(flt.flatten(p), padded), my * shard, shard)
            updates, o_new = tx.update(g_sh, o, p_sh)
            p_sh = optax.apply_updates(p_sh, updates)
            p_full = jax.lax.all_gather(p_sh, DATA_AXIS, tiled=True)
            return flt.unflatten(p_full[:flt.total]), o_new

    proto = tp.prepare_tp_params(vit.init_params(jax.random.PRNGKey(0), cfg),
                                 cfg)
    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess, apply_fn=tp.apply_tp,
        reduce_grads=reduce_grads, proto_params=proto,
        param_specs=tp.tp_param_specs(proto, cfg),
        k=k, guard_padded_steps=guard_padded_steps, accum=accum,
        update_fn=update_fn, opt_specs_override=opt_specs_override)


def cp_zero1_flattener(cfg):
    """Flattener over the CP driver's reference-keyed param dict (CP params
    are fully replicated — no local-slice reshaping like the TP twin)."""
    return Flattener(vit.init_params(jax.random.PRNGKey(0), cfg))


def init_cp_zero1_opt_state(tx, cfg, mesh):
    """ZeRO-1 optimizer state for the CP (sequence-parallel) driver: CP
    grads are fully psum'd over BOTH mesh axes before the update and params
    are replicated, so the flat moment vector can shard over the WHOLE
    ('data', 'model') device product — 2P/(n_data·R) moment bytes per chip
    (the 'model' axis carries token shards, not parameters, so it is free
    real estate for optimizer state). Vector leaves are globally [padded]
    with spec P((DATA_AXIS, MODEL_AXIS)), matching the data-major
    linearization of axis_index(('data','model')); scalars (the Adam step
    count) stay replicated. Returns (opt_state, opt_specs, flattener)."""
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, NamedSharding

    n_sh = mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
    flt = cp_zero1_flattener(cfg)
    padded = zero1_shard_size(flt.total, n_sh) * n_sh
    proto = tx.init(jnp.zeros((padded,), jnp.float32))
    specs = jax.tree_util.tree_map(
        lambda leaf: (P((DATA_AXIS, MODEL_AXIS))
                      if getattr(leaf, "ndim", 0) >= 1 else P()), proto)
    placed = jax.device_put(
        proto,
        jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)))
    return placed, specs, flt


def make_cp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                       preprocess, k: int = 1,
                       guard_padded_steps: bool = True, accum: int = 1,
                       zero1: bool = False):
    """Data-parallel × sequence-parallel (ring attention) training step over
    the ('data', 'model') mesh — the 'model' axis carries token shards
    (parallel/context_parallel.py). Params and optimizer state stay fully
    REPLICATED (checkpoint/eval interop is unchanged); what differs from the
    plain DP step is only the forward (apply_cp) and the gradient reduction:
    every shard's grads are partial over BOTH axes (each sequence shard
    back-propagates its own tokens' contributions), so grads psum over
    ('data', 'model') together — one fused ICI all-reduce across the whole
    mesh.

    Same k-step fusion contract as make_tp_train_step.

    zero1=True shards the Adam moments over the FULL device product (see
    init_cp_zero1_opt_state — pass its opt state): each device updates its
    stripe of the padded flat vector and the new params ride one tiled
    all_gather over ('data', 'model') back to replicated. Elementwise-
    identical to the replicated-optimizer CP step (grads reach the update
    fully reduced either way)."""
    from vit_rpe_rope_tpu.parallel import context_parallel as cp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS

    proto = vit.init_params(jax.random.PRNGKey(0), cfg)
    update_fn = None
    opt_specs_override = None
    if zero1:
        axes = (DATA_AXIS, MODEL_AXIS)
        n_sh = mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
        flt = cp_zero1_flattener(cfg)
        shard = zero1_shard_size(flt.total, n_sh)
        padded = shard * n_sh
        opt_specs_override = jax.tree_util.tree_map(
            lambda leaf: (P((DATA_AXIS, MODEL_AXIS))
                          if getattr(leaf, "ndim", 0) >= 1 else P()),
            jax.eval_shape(tx.init,
                           jax.ShapeDtypeStruct((shard,), jnp.float32)))

        def update_fn(grads, o, p):  # the ZeRO-1 × CP update
            my = jax.lax.axis_index(axes)
            g_sh = jax.lax.dynamic_slice_in_dim(
                _pad_vec(flt.flatten(grads), padded), my * shard, shard)
            p_sh = jax.lax.dynamic_slice_in_dim(
                _pad_vec(flt.flatten(p), padded), my * shard, shard)
            updates, o_new = tx.update(g_sh, o, p_sh)
            p_sh = optax.apply_updates(p_sh, updates)
            p_full = jax.lax.all_gather(p_sh, axes, tiled=True)
            return flt.unflatten(p_full[:flt.total]), o_new

    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess, apply_fn=cp.apply_cp,
        reduce_grads=lambda g: jax.lax.psum(g, (DATA_AXIS, MODEL_AXIS)),
        proto_params=proto, param_specs={kk: P() for kk in proto},
        k=k, guard_padded_steps=guard_padded_steps, accum=accum,
        update_fn=update_fn, opt_specs_override=opt_specs_override)


def make_tp_cp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                          preprocess, k: int = 1,
                          guard_padded_steps: bool = True, accum: int = 1):
    """Composed 3-axis training step over the ('data', 'seq', 'model') mesh:
    data parallelism × sequence parallelism (KV ring over 'seq') × tensor
    parallelism (head/MLP sharding over 'model') — parallel/tp_cp.py.
    Params must be TP-prepared (tensor_parallel.prepare_tp_params) and
    placed with tp_param_specs shardings ('seq' unmentioned → replicated
    across it); the optimizer state mirrors them.

    Gradient synchronization: every grad psums over ('data', 'seq') — each
    sequence shard back-propagates only its tokens — and the per-head PE
    params additionally psum over 'model' (each model shard saw only its
    heads; same rule as make_tp_train_step). Same k-step fusion contract as
    the other model-axis drivers."""
    from vit_rpe_rope_tpu import pe as pe_registry
    from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
    from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
    from vit_rpe_rope_tpu.parallel import tp_cp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, SEQ_AXIS

    pe_mod = pe_registry.get(cfg.pos_encoding)
    needs_model_sync = (pe_mod.KIND == PE_KIND_LOGITS_BIAS
                        or cfg.pos_encoding == "rope-mixed")
    pe_keys = set(pe_mod.init_params(jax.random.PRNGKey(0), cfg))

    def reduce_grads(grads):
        grads = jax.lax.psum(grads, (DATA_AXIS, SEQ_AXIS))
        if needs_model_sync:
            grads = dict(grads)
            for pk in pe_keys:
                grads[pk] = jax.lax.psum(grads[pk], MODEL_AXIS)
        return grads

    proto = tp.prepare_tp_params(vit.init_params(jax.random.PRNGKey(0), cfg),
                                 cfg)
    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess, apply_fn=tp_cp.apply_tp_cp,
        reduce_grads=reduce_grads, proto_params=proto,
        param_specs=tp.tp_param_specs(proto, cfg),
        k=k, guard_padded_steps=guard_padded_steps, accum=accum)


def make_pp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                       preprocess, n_micro: int, k: int = 1,
                       guard_padded_steps: bool = True):
    """Data-parallel × pipeline-parallel training step over the
    ('data', 'model') mesh — the 'model' axis carries pipeline STAGES
    (parallel/pipeline_parallel.py). Params are the depth-stacked dict
    (models.vit.stack_block_params) with "blocks.X" leaves sharded over the
    stage axis (pp_param_specs); the optimizer state mirrors them
    (opt_specs_like), so per-device parameter + Adam memory for the blocks
    drops by the stage count.

    Gradient synchronization: everything psums over 'data'; replicated-use
    params (patch embed, cls, PE tables, final norm, head) additionally psum
    over the stage axis (their per-stage grads are partial — see
    pipeline_parallel's module docstring); sharded block params stay local
    to their stage.

    Same k-step fusion contract as make_tp_train_step."""
    from vit_rpe_rope_tpu.parallel import pipeline_parallel as pp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS

    def reduce_grads(grads):
        grads = jax.lax.psum(grads, DATA_AXIS)
        # Staged block params are sharded -> grads stay local to their
        # stage; replicated-use params carry partial per-stage grads.
        return {kk: (g if kk.startswith("blocks.")
                     else jax.lax.psum(g, MODEL_AXIS))
                for kk, g in grads.items()}

    proto = vit.stack_block_params(
        vit.init_params(jax.random.PRNGKey(0), cfg), cfg)
    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess,
        apply_fn=lambda p, x, c: pp.apply_pp(p, x, c, n_micro=n_micro),
        reduce_grads=reduce_grads, proto_params=proto,
        param_specs=pp.pp_param_specs(proto),
        k=k, guard_padded_steps=guard_padded_steps)


def make_pp_tp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                          preprocess, n_micro: int, k: int = 1,
                          guard_padded_steps: bool = True):
    """Composed 3-axis training step over the ('data', 'pipe', 'model')
    mesh: data parallelism × pipeline parallelism (GPipe stages over
    'pipe') × tensor parallelism (head/MLP sharding over 'model') —
    parallel/pp_tp.py. Params are the depth-stacked dict of the TP-prepared
    layout (stack_block_params ∘ prepare_tp_params) placed with
    pp_tp_param_specs shardings; the optimizer state mirrors them
    (opt_specs_like), so per-device block parameter + Adam memory drops by
    the stage count × the TP degree.

    Gradient synchronization: everything psums over 'data'; replicated-use
    params (patch embed, cls, PE tables, final norm, head) additionally
    psum over 'pipe' (per-stage partial grads — see pp_tp's module
    docstring); per-head PE params additionally psum over 'model' (same
    rule as make_tp_train_step); sharded block params stay local to their
    (stage, model) shard. Same k-step fusion contract as the other
    model-axis drivers."""
    from vit_rpe_rope_tpu import pe as pe_registry
    from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
    from vit_rpe_rope_tpu.parallel import pp_tp
    from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
    from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS

    pe_mod = pe_registry.get(cfg.pos_encoding)
    needs_model_sync = (pe_mod.KIND == PE_KIND_LOGITS_BIAS
                        or cfg.pos_encoding == "rope-mixed")
    pe_keys = set(pe_mod.init_params(jax.random.PRNGKey(0), cfg))

    def reduce_grads(grads):
        grads = jax.lax.psum(grads, DATA_AXIS)
        grads = {kk: (g if kk.startswith("blocks.")
                      else jax.lax.psum(g, PIPE_AXIS))
                 for kk, g in grads.items()}
        if needs_model_sync:
            for pk in pe_keys:
                grads[pk] = jax.lax.psum(grads[pk], MODEL_AXIS)
        return grads

    proto = vit.stack_block_params(
        tp.prepare_tp_params(vit.init_params(jax.random.PRNGKey(0), cfg),
                             cfg), cfg)
    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess,
        apply_fn=lambda p, x, c: pp_tp.apply_pp_tp(p, x, c, n_micro=n_micro),
        reduce_grads=reduce_grads, proto_params=proto,
        param_specs=pp_tp.pp_tp_param_specs(proto),
        k=k, guard_padded_steps=guard_padded_steps)


def make_pp_tp_cp_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx,
                             preprocess, n_micro: int, k: int = 1,
                             guard_padded_steps: bool = True):
    """Composed 4-axis training step over the ('data', 'pipe', 'seq',
    'model') mesh: data × pipeline × sequence × tensor parallelism
    (parallel/pp_tp_cp.py) — with 'model' possibly size 1, in which case
    this is the lone PP×CP driver. Params are the depth-stacked dict of the
    TP-prepared layout placed with pp_tp_param_specs shardings ('seq'
    unmentioned → replicated across it); the optimizer state mirrors them.

    Gradient synchronization: every grad psums over ('data', 'seq') — each
    sequence shard back-propagates only its tokens; non-block params
    additionally psum over 'pipe' (per-stage partials); per-head PE params
    additionally psum over 'model'. Same k-step fusion contract as the
    other model-axis drivers."""
    from vit_rpe_rope_tpu import pe as pe_registry
    from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
    from vit_rpe_rope_tpu.parallel import pp_tp, pp_tp_cp
    from vit_rpe_rope_tpu.parallel import tensor_parallel as tp
    from vit_rpe_rope_tpu.parallel.mesh import (
        MODEL_AXIS, PIPE_AXIS, SEQ_AXIS)

    pe_mod = pe_registry.get(cfg.pos_encoding)
    needs_model_sync = (pe_mod.KIND == PE_KIND_LOGITS_BIAS
                        or cfg.pos_encoding == "rope-mixed")
    pe_keys = set(pe_mod.init_params(jax.random.PRNGKey(0), cfg))

    def reduce_grads(grads):
        grads = jax.lax.psum(grads, (DATA_AXIS, SEQ_AXIS))
        grads = {kk: (g if kk.startswith("blocks.")
                      else jax.lax.psum(g, PIPE_AXIS))
                 for kk, g in grads.items()}
        if needs_model_sync:
            for pk in pe_keys:
                grads[pk] = jax.lax.psum(grads[pk], MODEL_AXIS)
        return grads

    proto = vit.stack_block_params(
        tp.prepare_tp_params(vit.init_params(jax.random.PRNGKey(0), cfg),
                             cfg), cfg)
    return _make_model_axis_train_step(
        cfg, tcfg, mesh, tx, preprocess,
        apply_fn=lambda p, x, c: pp_tp_cp.apply_pp_tp_cp(
            p, x, c, n_micro=n_micro),
        reduce_grads=reduce_grads, proto_params=proto,
        param_specs=pp_tp.pp_tp_param_specs(proto),
        k=k, guard_padded_steps=guard_padded_steps)


def make_eval_step(cfg: ViTConfig, mesh, preprocess, k: int = 1,
                   apply_fn=None):
    """Returns jitted eval_step(params, step, data_x, data_y, epoch_idx) ->
    metrics [k, 3] of [loss, correct, count] for steps step..step+k-1
    (k > 1 fuses the whole slice into one dispatch via lax.scan; padded
    steps report count 0 and loss 0 and are dropped by the caller).
    apply_fn overrides the replicated forward (context_parallel.apply_cp for
    sequence-parallel eval — loss/correct stay replicated across 'model', so
    the data-axis-only reductions below are unchanged)."""

    def one(params, step, data_x, data_y, epoch_idx):
        idx = jax.lax.dynamic_index_in_dim(
            epoch_idx, step, axis=0, keepdims=False)
        imgs, labels, mask = _gather_batch(data_x, data_y, idx)
        loss_sum, correct = _loss_and_metrics(
            params, imgs, labels, mask, cfg, preprocess, apply_fn=apply_fn)
        count = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
        loss = jax.lax.psum(loss_sum, DATA_AXIS) / jnp.maximum(count, 1.0)
        correct = jax.lax.psum(correct, DATA_AXIS)
        return jnp.stack([loss, correct, count])

    def local_step(params, step, data_x, data_y, epoch_idx):
        steps = step[0] + jnp.arange(k, dtype=jnp.int32)
        return jax.lax.map(
            lambda s: one(params, s, data_x, data_y, epoch_idx), steps)

    sharded = shard_map(
        local_step, mesh,
        in_specs=(P(), P(), P(), P(), P(None, DATA_AXIS)),
        out_specs=P(),
    )
    return jax.jit(sharded)


def epoch_indices(key, n_examples: int, batch_size: int, shuffle: bool):
    """[steps, batch_size] int32 index matrix covering all examples once;
    final partial batch padded with -1 (masked). Shuffle on device."""
    steps = -(-n_examples // batch_size)
    if shuffle:
        perm = jax.random.permutation(key, n_examples).astype(jnp.int32)
    else:
        perm = jnp.arange(n_examples, dtype=jnp.int32)
    pad = steps * batch_size - n_examples
    perm = jnp.concatenate([perm, jnp.full((pad,), -1, jnp.int32)])
    return perm.reshape(steps, batch_size)
