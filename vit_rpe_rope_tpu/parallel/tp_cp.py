"""Composed 3-axis parallelism: data × sequence × tensor on a
('data', 'seq', 'model') mesh.

The reference is single-device (SURVEY.md §2 #20); round 2 built TP and CP
as ALTERNATIVE uses of one 'model' axis. This module composes them: tokens
shard over 'seq' (KV ring attention — parallel/context_parallel.py) while
heads and the MLP hidden dimension shard over 'model' (Megatron-style —
parallel/tensor_parallel.py), under the usual 'data'-axis batch split. Each
device holds N/S tokens × H/T heads: the attention working set drops by
S·T, activations by S, and parameters by T — the composition large models
need, not either strategy alone.

Layout per block (x [B, Nl, E] token-sharded over 'seq', replicated over
'model'):
  * LN → Megatron "f" (identity fwd / model-psum bwd) → qkv with LOCAL
    heads [3, Hl, Dh, E] → q, k, v [B, Hl, Nl, Dh];
  * PE: rope cos/sin sliced to local heads AND local tokens; learnable-bias
    modes ship their raw parameters head-sliced — each ring step generates
    its [Hl, Nl, Nl] tile at this shard's global (row, col) offsets (no
    [H, N, N] anywhere);
  * ring attention over 'seq' (jnp ring, or the Pallas streaming-kernel
    ring when the config selects the flash path);
  * proj partial over local heads → psum over 'model'; MLP fc1 row- / fc2
    column-sharded over 'model' with the second psum.

Gradients: every param grad is partial over ('data', 'seq') (token splits);
per-head PE params are additionally partial over 'model' (head slicing).
make_tp_cp_train_step (train/train_step.py) does those reductions.

Dropout is unsupported (CP constraint; the reference's effective regime is
all rates 0 — SURVEY.md Q11).
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
    _attention_impl, _layer_norm, _linear, patch_embed, remat_block_fn)
from vit_rpe_rope_tpu.ops.flash_attention import _pad_seq, _prep_freqs
from vit_rpe_rope_tpu.ops.rotary import rotate_half_split
from vit_rpe_rope_tpu.parallel.context_parallel import ring_dispatch
from vit_rpe_rope_tpu.parallel.mesh import (
    MODEL_AXIS, SEQ_AXIS, identity_fwd_psum_bwd, psum_identity_bwd)
from vit_rpe_rope_tpu.parallel.tensor_parallel import _local_heads


def _tp_cp_block(params, prefix, x, cfg: ViTConfig, bias_arg, local_freqs,
                 n_valid, bias_kind, bias_grid):
    """One pre-LN block on a (token-shard × head-shard) tile: TP's Megatron
    operators around CP's ring attention."""
    eps = cfg.layer_norm_eps
    h = _layer_norm(x, params[f"{prefix}.norm1.weight"],
                    params[f"{prefix}.norm1.bias"], eps)
    h = identity_fwd_psum_bwd(h, MODEL_AXIS)  # Megatron "f"
    bsz, nl, e = h.shape
    qkv_w = params[f"{prefix}.attn.qkv.weight"]  # [3, Hl, Dh, E]
    local_h, dh = qkv_w.shape[1], qkv_w.shape[2]
    my_m = jax.lax.axis_index(MODEL_AXIS)

    qkv = jnp.einsum("bne,thde->tbhnd", h, qkv_w.astype(h.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, Hl, Nl, Dh]

    head_bias_arg = None
    if bias_arg is not None:
        # Raw PE params head-sliced: the ring generates only this shard's
        # heads' tiles. The slice transpose scatters grads back → partial
        # over 'model', psummed by the train step.
        head_bias_arg = _local_heads(bias_arg, my_m, local_h)
    if local_freqs is not None:
        cos, sin = local_freqs  # [H, Nl, Dh/2] (identity cls/pad rows)
        cos = _local_heads(cos, my_m, local_h)
        sin = _local_heads(sin, my_m, local_h)
        q = rotate_half_split(q, cos[None], sin[None])
        k = rotate_half_split(k, cos[None], sin[None])

    attn_out = ring_dispatch(cfg, SEQ_AXIS, n_valid, bias_kind,
                             head_bias_arg, bias_grid, q, k, v, dh ** -0.5)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(bsz, nl, local_h * dh)

    proj_w = params[f"{prefix}.attn.proj.weight"]  # [E, Hl·Dh] local cols
    partial = jnp.einsum("bnk,ok->bno", attn_out, proj_w.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
    attn_out = psum_identity_bwd(partial, MODEL_AXIS) \
        + params[f"{prefix}.attn.proj.bias"].astype(x.dtype)
    x = x + attn_out

    h = _layer_norm(x, params[f"{prefix}.norm2.weight"],
                    params[f"{prefix}.norm2.bias"], eps)
    h = identity_fwd_psum_bwd(h, MODEL_AXIS)  # Megatron "f", MLP half
    h = _linear(h, params[f"{prefix}.mlp.fc1.weight"],
                params[f"{prefix}.mlp.fc1.bias"])  # local rows of Hid
    h = jax.nn.gelu(h, approximate=False)
    partial = jnp.einsum("bnk,ok->bno", h,
                         params[f"{prefix}.mlp.fc2.weight"].astype(h.dtype),
                         preferred_element_type=jnp.float32).astype(h.dtype)
    mlp_out = psum_identity_bwd(partial, MODEL_AXIS) \
        + params[f"{prefix}.mlp.fc2.bias"].astype(x.dtype)
    return x + mlp_out


def apply_tp_cp(params: dict, images, cfg: ViTConfig):
    """3-axis forward: same contract as models.vit.apply, but expects
    TP-prepared, 'model'-axis-sharded params (tensor_parallel.
    prepare_tp_params / tp_param_specs) and MUST run inside shard_map over a
    ('data', 'seq', 'model') mesh with images sharded over 'data' only.

    Token layout follows apply_cp (shard-major over 'seq', cls at global
    row 0, tail padding masked); the embedding runs redundantly on every
    (seq, model) shard then slices its token range. The classifier head
    reads the cls row on seq-shard 0; a seq-axis partial psum re-replicates
    the logits (they are already replicated over 'model' after each block's
    psum pair)."""
    if cfg.has_dropout:
        raise ValueError("tp×cp does not support dropout")
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    s_total = jax.lax.psum(1, SEQ_AXIS)
    my_s = jax.lax.axis_index(SEQ_AXIS)

    x = patch_embed(params, images.astype(dtype), cfg)
    bsz = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)  # [B, N, E]
    n = x.shape[1]
    n_pad = -(-n // s_total) * s_total
    nl = n_pad // s_total

    bias_kind = None
    bias_arg = None
    bias_grid = 0
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(params, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        if cfg.pos_encoding == "polynomial":
            bias_kind = "poly"
            bias_arg = pe_mod.coeff_per_head(params, cfg)
            bias_grid = cfg.grid_size
        elif cfg.pos_encoding == "relative":
            bias_kind = "rel"
            bias_arg = pe_mod.table_per_head(params, cfg)
        else:
            raise ValueError(
                f"tp×cp requires a generator for logits-bias PE "
                f"{cfg.pos_encoding!r} (relative / polynomial)")
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(params, cfg)

    x = jax.lax.dynamic_slice_in_dim(_pad_seq(x, n_pad, axis=1), my_s * nl,
                                     nl, axis=1)

    local_freqs = None
    if freqs_cis is not None:
        cos, sin = _prep_freqs(freqs_cis, cfg.num_heads, n_pad, jnp.float32)
        local_freqs = (
            jax.lax.dynamic_slice_in_dim(cos, my_s * nl, nl, axis=1),
            jax.lax.dynamic_slice_in_dim(sin, my_s * nl, nl, axis=1))

    block_fn = remat_block_fn(cfg, _tp_cp_block,
                              static_argnums=(1, 3, 6, 7, 8))
    for i in range(cfg.depth):
        x = block_fn(params, f"blocks.{i}", x, cfg, bias_arg, local_freqs,
                     n, bias_kind, bias_grid)
    x = _layer_norm(x, params["norm.weight"], params["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], params["head.weight"], params["head.bias"])
    logits = logits * (my_s == 0).astype(logits.dtype)
    return psum_identity_bwd(logits, SEQ_AXIS).astype(jnp.float32)
