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

import jax
import jax.numpy as jnp
import optax

from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig, cosine_lr_by_epoch
from vit_rpe_rope_tpu.models import vit
from vit_rpe_rope_tpu.parallel.mesh import DATA_AXIS, P, shard_map


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int):
    schedule = cosine_lr_by_epoch(tcfg.lr, tcfg.epochs, steps_per_epoch)
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=tcfg.weight_decay)


def make_preprocess(cfg: ViTConfig, mean, std, native_size: int):
    """uint8 [B, h, w, C] -> normalized float [B, img, img, C], on device."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def preprocess(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        if native_size != cfg.img_size:
            b, _, _, c = x.shape
            x = jax.image.resize(
                x, (b, cfg.img_size, cfg.img_size, c), method="bilinear"
            )
        return (x - mean) / std

    return preprocess


def _gather_batch(data_x, data_y, idx):
    """Masked gather: idx == -1 marks padding of the final partial batch."""
    mask = (idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(idx, 0)
    return data_x[safe], data_y[safe], mask


def _loss_and_metrics(params, imgs, labels, mask, cfg, preprocess):
    """Per-shard loss/metric SUMS (no collectives here: psum must stay
    OUTSIDE any function being differentiated — inside shard_map without
    replication checking, grad-of-psum transposes to another psum and
    over-counts gradients by the axis size)."""
    logits = vit.apply(params, preprocess(imgs), cfg)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_sum = jnp.sum(losses * mask)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels).astype(jnp.float32) * mask)
    return loss_sum, correct


def make_train_step(cfg: ViTConfig, tcfg: TrainConfig, mesh, tx, preprocess):
    """Returns jitted train_step(params, opt_state, step, data_x, data_y,
    epoch_idx) -> (params, opt_state, metrics[loss, correct, count])."""

    def local_step(params, opt_state, step, data_x, data_y, epoch_idx):
        idx = jax.lax.dynamic_index_in_dim(
            epoch_idx, step[0], axis=0, keepdims=False
        )  # [local_bs]
        imgs, labels, mask = _gather_batch(data_x, data_y, idx)
        # Global real-example count (constant w.r.t. params).
        count = jax.lax.psum(jnp.sum(mask), DATA_AXIS)

        def loss_fn(p):
            loss_sum, correct = _loss_and_metrics(
                p, imgs, labels, mask, cfg, preprocess)
            # Local share of the GLOBAL batch-mean loss; psum'ing its grads
            # below yields exactly the full-batch gradient.
            return loss_sum / count, correct

        (local_loss, correct), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.psum(grads, DATA_AXIS)  # ICI all-reduce
        loss = jax.lax.psum(local_loss, DATA_AXIS)
        correct = jax.lax.psum(correct, DATA_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.stack([loss, correct, count])

    sharded = shard_map(
        local_step, mesh,
        in_specs=(P(), P(), P(), P(), P(), P(None, DATA_AXIS)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_eval_step(cfg: ViTConfig, mesh, preprocess):
    """Returns jitted eval_step(params, step, data_x, data_y, epoch_idx) ->
    metrics[loss, correct, count]."""

    def local_step(params, step, data_x, data_y, epoch_idx):
        idx = jax.lax.dynamic_index_in_dim(
            epoch_idx, step[0], axis=0, keepdims=False
        )
        imgs, labels, mask = _gather_batch(data_x, data_y, idx)
        loss_sum, correct = _loss_and_metrics(
            params, imgs, labels, mask, cfg, preprocess
        )
        count = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
        loss = jax.lax.psum(loss_sum, DATA_AXIS) / count
        correct = jax.lax.psum(correct, DATA_AXIS)
        return jnp.stack([loss, correct, count])

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
