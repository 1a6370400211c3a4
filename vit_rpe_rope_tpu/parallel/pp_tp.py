"""Composed 3-axis parallelism: data × pipeline × tensor on a
('data', 'pipe', 'model') mesh.

The reference is single-device (SURVEY.md §2 #20); round 2 built PP and TP
as ALTERNATIVE uses of one 'model' axis, and round 3 composed TP with CP
(parallel/tp_cp.py — the width×tokens composition). This module adds the
depth×width composition: transformer blocks stage over 'pipe' (GPipe
microbatch schedule — parallel/pipeline_parallel.pipeline_schedule) while
heads and the MLP hidden dimension shard over 'model' (Megatron-style —
parallel/tensor_parallel._tp_block), under the usual 'data'-axis batch
split. Each device holds depth/P blocks × H/T heads: block parameter +
optimizer memory drops by P·T — the classic production recipe for deep,
wide models (PP's cheap point-to-point shifts cross the slow outer links,
TP's latency-sensitive psums stay on the fast inner ones; the mesh orders
the axes that way — parallel/mesh.make_mesh).

Layout: params are the depth-stacked dict of the TP-PREPARED layout —
stack_block_params(prepare_tp_params(params)) — so "blocks.X" leaves are
[depth, ...] arrays sharded over 'pipe' on dim 0 AND over 'model' on their
TP dim (pp_tp_param_specs). Activations are replicated across 'model'
within a stage; each tick's stage output crosses one 'pipe' ICI hop.

Gradient layout (consumed by train_step.make_pp_tp_train_step): sharded
block params get LOCAL grads (each (stage, model) shard owns its slice);
replicated params (patch embed, cls, PE tables, final norm, head) get
per-stage PARTIAL grads (the embedding's cotangent lands on stage 0 only,
the head's on the last stage, the PE generators' on every stage that
consumed them) → psum over 'pipe'; per-head PE params are additionally
partial over 'model' (each model shard saw only its heads) → psum over
'model' too. Over 'model', replicated-use params' grads are IDENTICAL (the
Megatron psum pairs re-replicate every cotangent that leaves a block) — no
reduction, same rule as make_tp_train_step.

Dropout is unsupported (PP constraint; the reference's effective regime is
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
    BLOCK_PARAM_NAMES, _attention_impl, _layer_norm, _linear, patch_embed,
    remat_block_fn)
from vit_rpe_rope_tpu.parallel.mesh import (
    MODEL_AXIS, PIPE_AXIS, P, psum_identity_bwd)
from vit_rpe_rope_tpu.parallel.pipeline_parallel import pipeline_schedule
from vit_rpe_rope_tpu.parallel.tensor_parallel import _tp_block


def pp_tp_param_specs(stacked: dict) -> dict:
    """PartitionSpec per depth-stacked TP-prepared param key: "blocks.X"
    leaves shard dim 0 (depth) over 'pipe' and their TP dim over 'model'
    (tensor_parallel.tp_param_specs shifted by the stacking dim); everything
    else is replicated."""
    specs = {}
    for key in stacked:
        if key == "blocks.attn.qkv.weight":      # [depth, 3, H, Dh, E]
            specs[key] = P(PIPE_AXIS, None, MODEL_AXIS, None, None)
        elif key == "blocks.attn.proj.weight":   # [depth, E, H·Dh]
            specs[key] = P(PIPE_AXIS, None, MODEL_AXIS)
        elif key == "blocks.mlp.fc1.weight":     # [depth, Hid, E]
            specs[key] = P(PIPE_AXIS, MODEL_AXIS, None)
        elif key == "blocks.mlp.fc1.bias":       # [depth, Hid]
            specs[key] = P(PIPE_AXIS, MODEL_AXIS)
        elif key == "blocks.mlp.fc2.weight":     # [depth, E, Hid]
            specs[key] = P(PIPE_AXIS, None, MODEL_AXIS)
        elif key.startswith("blocks."):
            specs[key] = P(PIPE_AXIS)
        else:
            specs[key] = P()
    return specs


def apply_pp_tp(stacked: dict, images, cfg: ViTConfig, n_micro: int):
    """dp×pp×tp forward: same contract as models.vit.apply, but expects the
    depth-stacked TP-prepared params (stack_block_params ∘ prepare_tp_params)
    placed with pp_tp_param_specs shardings, and MUST run inside shard_map
    over the ('data', 'pipe', 'model') mesh with images sharded over 'data'
    only. n_micro: microbatches per device batch (B % n_micro == 0).

    The PE bias (relative/polynomial) is materialized [H, N, N] here, like
    apply_tp — PP targets depth scaling at reference-class N; the long-N
    regime belongs to CP/tp_cp (generated tiles) and the bounded driver."""
    assert not cfg.has_dropout, "pp×tp does not support dropout"
    n_stages = jax.lax.psum(1, PIPE_AXIS)
    my_p = jax.lax.axis_index(PIPE_AXIS)
    dtype = jnp.dtype(cfg.compute_dtype)
    pe_mod = pe_registry.get(cfg.pos_encoding)
    impl = _attention_impl(cfg)
    bsz = images.shape[0]
    blocks_local = stacked["blocks.norm1.weight"].shape[0]  # depth / P

    # PE generators: replicated params -> identical values on every
    # (stage, model) shard; _tp_block slices local heads internally.
    bias = None
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        bias = pe_mod.attn_bias(stacked, cfg)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(stacked, cfg)

    # Full-batch embedding outside the tick scan (redundant on every shard,
    # O(N·E)); only stage 0's slice enters the pipeline (pipeline_schedule),
    # so embedding grads are stage-0 partials over 'pipe'.
    x_emb = patch_embed(stacked, images.astype(dtype), cfg)
    cls = jnp.broadcast_to(stacked["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x_emb = jnp.concatenate([cls, x_emb], axis=1)
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x_emb = pe_mod.add_embedding(stacked, x_emb)

    block_fn = remat_block_fn(cfg, _tp_block, static_argnums=(1, 3, 6, 7))

    def stage_blocks(x):
        for j in range(blocks_local):
            bp = {f"b.{name}": stacked[f"blocks.{name}"][j]
                  for name in BLOCK_PARAM_NAMES}
            x = block_fn(bp, "b", x, cfg, bias, freqs_cis, impl, True)
        return x

    x = pipeline_schedule(x_emb, stage_blocks, n_micro, PIPE_AXIS)

    # Classifier on the last stage's collected outputs (replicated over
    # 'model' — every cotangent left the blocks through a psum pair); the
    # masked partial-sum psum re-replicates the logits across stages.
    x = _layer_norm(x, stacked["norm.weight"], stacked["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], stacked["head.weight"], stacked["head.bias"])
    logits = logits * (my_p == n_stages - 1).astype(logits.dtype)
    return psum_identity_bwd(logits, PIPE_AXIS).astype(jnp.float32)
