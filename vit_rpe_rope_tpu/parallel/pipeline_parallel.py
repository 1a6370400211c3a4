"""Pipeline parallelism: transformer blocks staged over the mesh's 'model'
axis with a GPipe microbatch schedule.

The reference is single-device (SURVEY.md §2 #20 — nothing to mirror); this
is the depth-scaling member of the distribution layer: DP shards the batch,
TP shards within a layer, CP shards the tokens, PP shards the LAYERS. Stage s
owns blocks [s·depth/S, (s+1)·depth/S) as its slice of the depth-stacked
params ("blocks.X" arrays [depth, ...] sharded on dim 0 — the stacked layout
models/vit.py already maintains for the fused driver turns out to be exactly
the PP sharding unit), so parameter memory per device drops by the stage
count.

Schedule (GPipe, all-forward-then-all-backward via AD through the scan): the
per-device batch splits into M microbatches; one lax.scan over
T = M + S - 1 ticks runs SPMD on every stage. At tick t, stage 0 embeds
microbatch t while stage s applies its blocks to the activation received
from stage s-1 (a non-cyclic lax.ppermute shift — one ICI neighbor hop per
tick); the last stage collects its outputs and, after the scan, runs the
classifier head, re-replicated by a masked partial-sum psum. Pipeline bubble
fraction is the textbook (S-1)/(M+S-1).

Gradient layout (consumed by train_step.make_pp_train_step): sharded block
params get LOCAL grads (each stage owns its blocks — no stage-axis
reduction); replicated params (patch embed, cls, PE tables, final norm,
head) get PARTIAL grads — the embedding is computed redundantly on every
stage but jnp.where routes the cotangent to stage 0 only, the head's to the
last stage, the PE generators' to every stage that consumed them — so they
psum over the stage axis, each contribution counted exactly once.
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
    BLOCK_PARAM_NAMES, _attention_impl, _block_body, _layer_norm, _linear,
    _logits_bias, patch_embed, remat_block_fn)
from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, P, psum_identity_bwd


def pp_param_specs(stacked: dict) -> dict:
    """PartitionSpec per depth-stacked param key: "blocks.X" arrays [depth,
    ...] shard their leading (depth) dim over the stage axis; everything else
    is replicated."""
    return {k: P(MODEL_AXIS) if k.startswith("blocks.") else P()
            for k in stacked}


def pipeline_schedule(x_emb, stage_blocks, n_micro: int, axis_name: str,
                      gate_bubbles: bool = True):
    """The GPipe tick scan, shared by apply_pp, pp_tp.apply_pp_tp, and
    pp_tp_cp.apply_pp_tp_cp.

    x_emb [B, N, E]: the full-batch embedding, computed redundantly on every
    stage (only stage 0's slice enters the pipeline, so only stage 0
    back-propagates into the embedding params). stage_blocks(x) applies this
    stage's blocks to one microbatch activation [mb, N, E]. Returns the last
    stage's collected outputs [B, N, E] (garbage on other stages — the
    caller masks + psums its head logits over `axis_name`).

    gate_bubbles: skip the block stack on bubble ticks via lax.cond (the
    (S-1)/(M+S-1) GPipe bubble costs ~no MXU work). MUST be False when
    stage_blocks contains a collective-permute (the CP ring): a gated-off
    stage skips a ppermute instruction whose source-target pairs still list
    its devices, and the ring misroutes (measured: psum subgroups tolerate
    partial attendance, collective-permute does not). psum-only stage
    bodies (TP's Megatron pairs) gate safely."""
    n_stages = jax.lax.psum(1, axis_name)  # static axis size
    my = jax.lax.axis_index(axis_name)
    bsz, n_tokens, embed_dim = x_emb.shape
    assert bsz % n_micro == 0, (bsz, n_micro)
    mb = bsz // n_micro
    dtype = x_emb.dtype

    t_total = n_micro + n_stages - 1
    # Non-cyclic shift: stage s sends to s+1; stage 0 receives zeros (unused —
    # jnp.where picks the fresh embedding there).
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        recv, out_buf = carry
        # Microbatch entering stage 0 this tick (clipped re-reads during
        # warm-down ticks produce outputs that fall outside the last stage's
        # keep window — zero cotangent, no double-counting).
        m_in = jnp.clip(t, 0, n_micro - 1)
        emb_t = jax.lax.dynamic_slice_in_dim(x_emb, m_in * mb, mb, axis=0)
        x_in = jnp.where(my == 0, emb_t, recv)
        # Stage s is ACTIVE only for ticks [s, s + n_micro): outside that
        # window it would process bubble garbage (clipped re-reads /
        # uninitialized recv) whose outputs nothing keeps. Gate the block
        # stack with lax.cond so the GPipe bubble costs ~no MXU work —
        # safe because an inactive tick's output feeds only the next
        # stage's inactive tick (t+1 ∉ [s+1, s+1+n_micro)) and carries zero
        # cotangent (ADVICE r2: (S-1) wasted stage-forwards per step).
        if gate_bubbles:
            active = (t >= my) & (t < my + n_micro)
            y = jax.lax.cond(active, stage_blocks, jnp.zeros_like, x_in)
        else:
            y = stage_blocks(x_in)
        # Last stage collects microbatch t-(S-1) once it has traversed every
        # stage; earlier ticks re-write slot 0 with a discarded value.
        m_out = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        slot = jax.lax.dynamic_slice_in_dim(out_buf, m_out, 1, axis=0)
        keep = (t >= n_stages - 1) & (my == n_stages - 1)
        out_buf = jax.lax.dynamic_update_slice_in_dim(
            out_buf, jnp.where(keep, y[None], slot), m_out, axis=0)
        if perm:
            recv = jax.lax.ppermute(y, axis_name, perm)
        return (recv, out_buf), None

    init = (jnp.zeros((mb, n_tokens, embed_dim), dtype),
            jnp.zeros((n_micro, mb, n_tokens, embed_dim), dtype))
    (_, out_buf), _ = jax.lax.scan(
        tick, init, jnp.arange(t_total), length=t_total)
    return out_buf.reshape(bsz, n_tokens, embed_dim)


def apply_pp(stacked: dict, images, cfg: ViTConfig, n_micro: int,
             axis_name: str = MODEL_AXIS):
    """Pipeline-parallel forward: same contract as models.vit.apply_stacked,
    but MUST run inside shard_map with the "blocks.X" leaves sharded over
    `axis_name` (pp_param_specs) and images sharded over 'data' only.

    n_micro: microbatches per device batch (B % n_micro == 0). Dropout is
    not supported under PP (reference effective regime is rate 0 —
    SURVEY.md Q11); fit() rejects the combination.
    """
    assert not cfg.has_dropout, "pipeline parallelism does not support dropout"
    n_stages = jax.lax.psum(1, axis_name)  # static axis size
    my = jax.lax.axis_index(axis_name)
    dtype = jnp.dtype(cfg.compute_dtype)
    pe_mod = pe_registry.get(cfg.pos_encoding)
    impl = _attention_impl(cfg)

    bsz = images.shape[0]
    blocks_local = stacked["blocks.norm1.weight"].shape[0]  # depth / S

    # PE generators: replicated params -> identical values on every stage;
    # computed once per forward (SURVEY.md Q5), consumed by local blocks.
    bias = None
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        # _logits_bias: materialized bias, or the in-kernel-generation
        # marker in the streaming-polynomial regime (PP is dropout-free, so
        # the marker is always safe here).
        bias = _logits_bias(pe_mod, stacked, cfg)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(stacked, cfg)

    # The full-batch embedding runs ONCE per device, outside the tick scan
    # (every stage redundantly — O(N·E), negligible); ticks dynamic-slice
    # their microbatch from it. Only stage 0's slice is selected below, so
    # only stage 0 back-propagates into the embedding params.
    x_emb = patch_embed(stacked, images.astype(dtype), cfg)
    cls = jnp.broadcast_to(stacked["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x_emb = jnp.concatenate([cls, x_emb], axis=1)
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x_emb = pe_mod.add_embedding(stacked, x_emb)

    block_fn = remat_block_fn(cfg, _block_body, static_argnums=(2, 5))

    def stage_blocks(x):
        for j in range(blocks_local):
            block_params = {name: stacked[f"blocks.{name}"][j]
                            for name in BLOCK_PARAM_NAMES}
            x = block_fn(block_params, x, cfg, bias, freqs_cis, impl)
        return x

    x = pipeline_schedule(x_emb, stage_blocks, n_micro, axis_name)

    # Classifier on the last stage's collected outputs; masked partial-sum
    # psum re-replicates the logits across stages.
    x = _layer_norm(x, stacked["norm.weight"], stacked["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], stacked["head.weight"], stacked["head.bias"])
    logits = logits * (my == n_stages - 1).astype(logits.dtype)
    return psum_identity_bwd(logits, axis_name).astype(jnp.float32)
