"""Tensor parallelism over the mesh's 'model' axis (Megatron-style).

The reference has no parallelism at all (SURVEY.md §2 #20); data parallelism
is this framework's production strategy (the models are tiny). TP is provided
as a first-class capability of the distribution layer so larger ViT variants
shard cleanly: attention heads and the MLP hidden dimension are partitioned
column/row-wise with one psum per block half.

Sharding recipe per block (TP = model-axis size, H % TP == 0):
  qkv     — reshaped [3, H, Dh, E], heads sharded       -> local [3, H/TP, Dh, E]
  proj    — weight [E, E] input(column)-sharded by head -> local [E, H/TP·Dh];
            partial outputs psum'd over 'model', bias added once after psum
  fc1     — row-sharded [Hid/TP, E] (+ bias shard)
  fc2     — column-sharded [E, Hid/TP]; partial psum + replicated bias
  PE bias / per-head rope freqs — computed replicated, local heads sliced by
            axis_index (cheap: [H, L, L] at L ≤ 197)
  everything else (LN, patch embed, cls, head, PE tables) — replicated

All activations stay replicated across 'model'; collectives are two psums per
block over ICI. Runs inside shard_map next to the 'data'-axis gradient psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_rpe_rope_tpu import pe as pe_registry
from vit_rpe_rope_tpu.configs import (
    PE_KIND_EMBED_ADDITIVE,
    PE_KIND_LOGITS_BIAS,
    PE_KIND_QK_ROTATION,
    ViTConfig,
)
from vit_rpe_rope_tpu.models.vit import (
    _attention_impl, _drop_path, _dropout, _layer_norm, _linear, patch_embed,
    remat_block_fn)
from vit_rpe_rope_tpu.ops import flash_attention, reference_attention
from vit_rpe_rope_tpu.parallel.mesh import (
    MODEL_AXIS, P, identity_fwd_psum_bwd, psum_identity_bwd)


def prepare_tp_params(params: dict, cfg: ViTConfig) -> dict:
    """Re-layout attention weights for head sharding: qkv.weight [3E, E] ->
    [3, H, Dh, E] (torch packs rows as [q; k; v], each [E, E] with head h on
    rows h·Dh..(h+1)·Dh). Other tensors keep their reference layout."""
    out = dict(params)
    h, dh, e = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    for i in range(cfg.depth):
        key = f"blocks.{i}.attn.qkv.weight"
        out[key] = params[key].reshape(3, h, dh, e)
    return out


def restore_reference_params(tp_params: dict, cfg: ViTConfig) -> dict:
    """Inverse of prepare_tp_params (back to checkpointable layout)."""
    out = dict(tp_params)
    e = cfg.embed_dim
    for i in range(cfg.depth):
        key = f"blocks.{i}.attn.qkv.weight"
        out[key] = tp_params[key].reshape(3 * e, e)
    return out


def _map_qkv_leaves(tree, fn):
    """Apply fn to every pytree leaf nested under a dict key ending in
    '.attn.qkv.weight' (i.e. the qkv param itself or its optimizer moments)."""
    def visit(path, leaf):
        for p in path:
            if (isinstance(p, jax.tree_util.DictKey)
                    and p.key.endswith(".attn.qkv.weight")):
                return fn(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, tree)


def prepare_tp_opt_state(opt_state, cfg: ViTConfig):
    """Reshape an optimizer state's qkv moments from reference layout
    [3E, E] to the TP layout [3, H, Dh, E] (checkpoints stay reference
    layout on disk; see loop.fit's resume path)."""
    h, dh, e = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    return _map_qkv_leaves(
        opt_state,
        lambda x: x.reshape(3, h, dh, e) if getattr(x, "ndim", 0) == 2 else x)


def restore_reference_opt_state(opt_state, cfg: ViTConfig):
    """Inverse of prepare_tp_opt_state."""
    e = cfg.embed_dim
    return _map_qkv_leaves(
        opt_state,
        lambda x: x.reshape(3 * e, e) if getattr(x, "ndim", 0) == 4 else x)


def tp_param_specs(params: dict, cfg: ViTConfig) -> dict:
    """PartitionSpec per (TP-prepared) param key for shard_map in_specs."""
    specs = {}
    for key in params:
        if key.endswith(".attn.qkv.weight"):
            specs[key] = P(None, MODEL_AXIS, None, None)  # [3, H, Dh, E]
        elif key.endswith(".attn.proj.weight"):
            specs[key] = P(None, MODEL_AXIS)  # [E, E] input/head-sharded
        elif key.endswith(".mlp.fc1.weight"):
            specs[key] = P(MODEL_AXIS, None)  # [Hid, E] row-sharded
        elif key.endswith(".mlp.fc1.bias"):
            specs[key] = P(MODEL_AXIS)
        elif key.endswith(".mlp.fc2.weight"):
            specs[key] = P(None, MODEL_AXIS)  # [E, Hid] column-sharded
        else:
            specs[key] = P()
    return specs


def _local_heads(arr, axis_index, local_h):
    """Slice this shard's heads from a leading-H array ([H, ...])."""
    return jax.lax.dynamic_slice_in_dim(arr, axis_index * local_h, local_h, 0)


def _tp_block(params, prefix, x, cfg, bias, freqs_cis, impl, tp, rng=None):
    eps = cfg.layer_norm_eps
    # Dropout keys: masks on model-axis-SHARDED tensors (attn probs over
    # local heads, MLP hidden rows) fold in the shard index; masks on
    # REPLICATED activations (post-psum proj/fc2 outputs, drop-path) must be
    # identical on every shard or replication breaks.
    drop = rng is not None and cfg.has_dropout
    keys = list(jax.random.split(rng, 6)) if drop else [None] * 6
    h = _layer_norm(x, params[f"{prefix}.norm1.weight"],
                    params[f"{prefix}.norm1.bias"], eps)
    # Megatron "f": identity fwd / psum bwd — the attention backward on this
    # shard only carries its local heads' contribution to h's cotangent.
    h = identity_fwd_psum_bwd(h, MODEL_AXIS)
    bsz, n, e = h.shape
    qkv_w = params[f"{prefix}.attn.qkv.weight"]  # [3, Hl, Dh, E] local heads
    local_h, dh = qkv_w.shape[1], qkv_w.shape[2]
    my = jax.lax.axis_index(MODEL_AXIS)

    qkv = jnp.einsum("bne,thde->tbhnd", h, qkv_w.astype(h.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, Hl, N, Dh]
    scale = dh ** -0.5

    local_bias = None
    local_freqs = None
    if bias is not None:
        local_bias = _local_heads(bias, my, local_h)
    if freqs_cis is not None:
        cos, sin = freqs_cis
        if cos.ndim == 3:  # per-head (rope-mixed): slice local heads
            cos = _local_heads(cos, my, local_h)
            sin = _local_heads(sin, my, local_h)
        local_freqs = (cos, sin)

    attn_dropping = drop and cfg.attn_drop_rate > 0
    if impl == "flash" and not attn_dropping:
        attn_out = flash_attention.flash_attention(
            q, k, v, scale, bias=local_bias, freqs_cis=local_freqs)
    else:
        attn_out = reference_attention.attention(
            q, k, v, scale, bias=local_bias, freqs_cis=local_freqs,
            dropout_rate=cfg.attn_drop_rate if attn_dropping else 0.0,
            dropout_key=(jax.random.fold_in(keys[0], my)
                         if attn_dropping else None))
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(bsz, n, local_h * dh)

    # proj: local input columns (this shard's heads) -> partial sum -> psum.
    proj_w = params[f"{prefix}.attn.proj.weight"]  # [E, Hl·Dh] local columns
    partial = jnp.einsum("bnk,ok->bno", attn_out, proj_w.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
    attn_out = psum_identity_bwd(partial, MODEL_AXIS) \
        + params[f"{prefix}.attn.proj.bias"].astype(x.dtype)
    if drop and cfg.drop_rate > 0:
        attn_out = _dropout(attn_out, cfg.drop_rate, keys[1])
    if drop and cfg.drop_path_rate > 0:
        attn_out = _drop_path(attn_out, cfg.drop_path_rate, keys[2])
    x = x + attn_out

    h = _layer_norm(x, params[f"{prefix}.norm2.weight"],
                    params[f"{prefix}.norm2.bias"], eps)
    h = identity_fwd_psum_bwd(h, MODEL_AXIS)  # Megatron "f" for the MLP half
    h = _linear(h, params[f"{prefix}.mlp.fc1.weight"],
                params[f"{prefix}.mlp.fc1.bias"])  # local rows of Hid
    h = jax.nn.gelu(h, approximate=False)
    if drop and cfg.drop_rate > 0:
        h = _dropout(h, cfg.drop_rate, jax.random.fold_in(keys[3], my))
    partial = jnp.einsum("bnk,ok->bno", h,
                         params[f"{prefix}.mlp.fc2.weight"].astype(h.dtype),
                         preferred_element_type=jnp.float32).astype(h.dtype)
    mlp_out = psum_identity_bwd(partial, MODEL_AXIS) \
        + params[f"{prefix}.mlp.fc2.bias"].astype(x.dtype)
    if drop and cfg.drop_rate > 0:
        mlp_out = _dropout(mlp_out, cfg.drop_rate, keys[4])
    if drop and cfg.drop_path_rate > 0:
        mlp_out = _drop_path(mlp_out, cfg.drop_path_rate, keys[5])
    return x + mlp_out


def apply_tp(params: dict, images, cfg: ViTConfig, rng=None):
    """TP forward: same contract as models.vit.apply, but expects TP-prepared,
    'model'-axis-sharded params and MUST run inside shard_map over a mesh with
    MODEL_AXIS. Activations are replicated across 'model'. rng enables
    train-mode dropout (pass the SAME key on every model shard)."""
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    x = patch_embed(params, images.astype(dtype), cfg)
    bsz = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)

    bias = None
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(params, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        bias = pe_mod.attn_bias(params, cfg)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(params, cfg)

    impl = _attention_impl(cfg)
    # Remat per cfg.remat/remat_policy (replays the block's two activation
    # psums in the backward — deterministic, just extra ICI traffic).
    block_fn = remat_block_fn(cfg, _tp_block, static_argnums=(1, 3, 6, 7))
    for i in range(cfg.depth):
        block_rng = None if rng is None else jax.random.fold_in(rng, i)
        x = block_fn(params, f"blocks.{i}", x, cfg, bias, freqs_cis, impl,
                     True, block_rng)
    x = _layer_norm(x, params["norm.weight"], params["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], params["head.weight"], params["head.bias"])
    return logits.astype(jnp.float32)
