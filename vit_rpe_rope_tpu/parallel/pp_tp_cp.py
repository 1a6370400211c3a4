"""Composed 4-axis parallelism: data × pipeline × sequence × tensor on a
('data', 'pipe', 'seq', 'model') mesh.

The reference is single-device (SURVEY.md §2 #20). Rounds 2-3 built the
pairwise compositions — TP×CP on ('data', 'seq', 'model') (tp_cp.py) and
PP×TP on ('data', 'pipe', 'model') (pp_tp.py) — leaving PP×CP rejected for
want of a mesh. This module closes the matrix with the full 4-axis
composition: transformer blocks stage over 'pipe' (GPipe microbatch tick
scan — pipeline_parallel.pipeline_schedule), tokens shard over 'seq' (KV
ring attention — context_parallel.ring_dispatch), heads and the MLP hidden
dimension shard over 'model' (Megatron operators — tensor_parallel), under
the 'data'-axis batch split. Each device holds depth/P blocks × N/S tokens
× H/T heads — depth × tokens × width sharding at once, the full production
recipe. A size-1 'model' axis degrades every Megatron operator to a no-op
(psum over a 1-device axis), so the same code is the lone PP×CP driver.

Mesh axis order is slow→fast ('data', 'pipe', 'seq', 'model'): TP's
two-psums-per-block ride adjacent ICI links, the seq ring hops at stride T,
and PP's once-per-tick point-to-point shift crosses the slowest links —
each collective's frequency matched to its link speed.

Layout: params are the depth-stacked dict of the TP-prepared layout
(stack_block_params ∘ prepare_tp_params) with pp_tp.pp_tp_param_specs
shardings — "blocks.X" leaves sharded over 'pipe' (dim 0) and their TP dim
over 'model'; 'seq' and 'data' unmentioned → replicated. Activations inside
a stage are [mb, N/S, E] token shards, replicated over 'model'.

Gradient layout (consumed by train_step.make_pp_tp_cp_train_step): every
grad is partial over ('data', 'seq') (batch/token splits — psum both);
sharded block params stay local to their (stage, model) shard; replicated
params additionally psum over 'pipe' (per-stage partials: embedding
cotangent lands on stage 0, the head's on the last stage, PE generators'
on every stage); per-head PE params additionally psum over 'model'.

Dropout is unsupported (PP and CP constraints; the reference's effective
regime is all rates 0 — SURVEY.md Q11).
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
    BLOCK_PARAM_NAMES, _layer_norm, _linear, patch_embed, remat_block_fn)
from vit_rpe_rope_tpu.ops.flash_attention import _pad_seq, _prep_freqs
from vit_rpe_rope_tpu.parallel.mesh import (
    PIPE_AXIS, SEQ_AXIS, psum_identity_bwd)
from vit_rpe_rope_tpu.parallel.pipeline_parallel import pipeline_schedule
from vit_rpe_rope_tpu.parallel.tp_cp import _tp_cp_block


def apply_pp_tp_cp(stacked: dict, images, cfg: ViTConfig, n_micro: int):
    """4-axis forward: same contract as models.vit.apply, but expects the
    depth-stacked TP-prepared params (stack_block_params ∘ prepare_tp_params)
    placed with pp_tp.pp_tp_param_specs shardings, and MUST run inside
    shard_map over the ('data', 'pipe', 'seq', 'model') mesh with images
    sharded over 'data' only. n_micro: microbatches per device batch.

    Token layout follows apply_tp_cp (shard-major over 'seq', cls at global
    row 0, tail padding masked); the per-stage compute is tp_cp._tp_cp_block
    (Megatron operators around the KV ring), so the PE bias is generated per
    (q-shard, kv-chunk) tile — no [H, N, N] tensor on any shard at any
    stage. The GPipe tick scan runs UNGATED (gate_bubbles=False): the
    ring's collective-permutes must execute on every device of a tick's
    program — a cond-gated bubble stage would skip a ppermute its seq
    peers rendezvous on, misrouting the ring (measured; psums tolerate
    partial attendance, collective-permute does not)."""
    if cfg.has_dropout:
        raise ValueError("pp×tp×cp does not support dropout")
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    n_stages = jax.lax.psum(1, PIPE_AXIS)
    my_p = jax.lax.axis_index(PIPE_AXIS)
    s_total = jax.lax.psum(1, SEQ_AXIS)
    my_s = jax.lax.axis_index(SEQ_AXIS)
    blocks_local = stacked["blocks.norm1.weight"].shape[0]  # depth / P

    # Full-batch embedding outside the tick scan, redundant on every
    # (pipe, seq, model) shard — only stage 0's microbatch slice enters the
    # pipeline, so embedding grads are stage-0 partials over 'pipe'.
    x = patch_embed(stacked, images.astype(dtype), cfg)
    bsz = x.shape[0]
    cls = jnp.broadcast_to(stacked["cls_token"].astype(dtype),
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
        x = pe_mod.add_embedding(stacked, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        if cfg.pos_encoding == "polynomial":
            bias_kind = "poly"
            bias_arg = pe_mod.coeff_per_head(stacked, cfg)
            bias_grid = cfg.grid_size
        elif cfg.pos_encoding == "relative":
            bias_kind = "rel"
            bias_arg = pe_mod.table_per_head(stacked, cfg)
        else:
            raise ValueError(
                f"pp×tp×cp requires a generator for logits-bias PE "
                f"{cfg.pos_encoding!r} (relative / polynomial)")
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(stacked, cfg)

    # This shard's token range (apply_tp_cp convention).
    x_emb = jax.lax.dynamic_slice_in_dim(_pad_seq(x, n_pad, axis=1),
                                         my_s * nl, nl, axis=1)
    local_freqs = None
    if freqs_cis is not None:
        cos, sin = _prep_freqs(freqs_cis, cfg.num_heads, n_pad, jnp.float32)
        local_freqs = (
            jax.lax.dynamic_slice_in_dim(cos, my_s * nl, nl, axis=1),
            jax.lax.dynamic_slice_in_dim(sin, my_s * nl, nl, axis=1))

    block_fn = remat_block_fn(cfg, _tp_cp_block,
                              static_argnums=(1, 3, 6, 7, 8))

    def stage_blocks(xm):
        for j in range(blocks_local):
            bp = {f"b.{name}": stacked[f"blocks.{name}"][j]
                  for name in BLOCK_PARAM_NAMES}
            xm = block_fn(bp, "b", xm, cfg, bias_arg, local_freqs,
                          n, bias_kind, bias_grid)
        return xm

    # gate_bubbles=False: the ring's collective-permutes must execute on
    # EVERY device of the tick's program — a lax.cond-gated stage would
    # skip a ppermute its seq peers rendezvous on (see pipeline_schedule).
    # The bubble compute is wasted but discarded; correctness first.
    x = pipeline_schedule(x_emb, stage_blocks, n_micro, PIPE_AXIS,
                          gate_bubbles=False)

    # Classifier: the cls row lives on seq-shard 0 of the LAST pipe stage;
    # the doubly-masked partial-sum psum re-replicates the logits across
    # both axes (they are already replicated over 'model' — every cotangent
    # left the blocks through a Megatron psum pair).
    x = _layer_norm(x, stacked["norm.weight"], stacked["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], stacked["head.weight"], stacked["head.bias"])
    keep = (my_s == 0) & (my_p == n_stages - 1)
    logits = logits * keep.astype(logits.dtype)
    return psum_identity_bwd(logits,
                             (PIPE_AXIS, SEQ_AXIS)).astype(jnp.float32)
