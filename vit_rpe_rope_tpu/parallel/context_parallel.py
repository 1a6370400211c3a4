"""Sequence / context parallelism: ring attention over the mesh's 'model' axis.

The reference is single-device with O(N²)-materialized attention
(/root/reference/models/vit.py:71; SURVEY.md §5.7 — no ring/context/sequence
parallelism exists to mirror). This module is the TPU-native extension the
survey's design note left room for ("keep the kernel's bias-tile loader
indexed by (q-block, kv-block) so a future CP split along KV is not
foreclosed"): tokens are sharded over a mesh axis, Q stays resident, and the
K/V shards rotate around the ring via lax.ppermute (one ICI neighbor hop per
step) while an online-softmax accumulator merges the partial attention — the
blockwise/flash formulation distributed across chips.

What it buys: per-device attention residency drops from O(N²) to O(N²/R) and
per-device activations from O(N) to O(N/R), so sequences that exceed one
chip's HBM train across the ring. Compute overlaps communication naturally:
each ppermute moves [B, H, N/R, D] tiles while the MXU consumes the previous
tile (XLA schedules the ppermute DMA concurrently with the matmuls).

Layout contract:
  * the global token order is shard-major: shard i owns tokens
    [i·Nl, (i+1)·Nl) of the padded sequence; the cls token (global index 0 —
    SURVEY.md Q2) therefore lives at local row 0 of shard 0;
  * padding tokens (to make N divisible by the ring size) sit at the tail of
    the LAST shard and are masked out of every softmax as keys; their q rows
    compute garbage that nothing reads (the head consumes only the cls row);
  * rotary cos/sin are expanded to one global table with identity rows for
    the cls token and the padding (ops/flash_attention._prep_freqs — rotation
    by phase 0 is the identity), so every shard rotates ALL its local tokens
    uniformly;
  * additive PE bias is GENERATED per (q-shard, kv-chunk) from the raw PE
    parameters (polynomial coefficients / relative Toeplitz table) inside
    each ring step — no [H, N, N] tensor is ever materialized, so the
    long-sequence capability of the streaming kernels carries across chips;
    a generic logits-bias PE without a generator falls back to
    materialize + pre-slice [H, Nl, Npad].

A lone CP run shards tokens over the 2-axis mesh's 'model' axis; combined
--sequence_parallel × --model_parallel runs compose on the 3-axis
('data', 'seq', 'model') mesh instead (parallel/tp_cp.py), reusing this
module's ring over the 'seq' axis with head-sharded shards.
"""

from __future__ import annotations

import functools

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
from vit_rpe_rope_tpu.ops.flash_attention import (
    _pad_seq, _poly_bias_cols, _prep_freqs, _rel_bias_cols,
    streaming_chunk_bwd, streaming_chunk_fwd)
from vit_rpe_rope_tpu.ops.rotary import rotate_half_split
from vit_rpe_rope_tpu.parallel.mesh import MODEL_AXIS, psum_identity_bwd

NEG_INF = -1e30


def ring_attention(q, k, v, scale, axis_name: str = MODEL_AXIS, bias=None,
                   n_valid: int | None = None, bias_kind: str | None = None,
                   bias_arg=None, bias_grid: int = 0):
    """Distributed scaled-dot-product attention with the KV ring rotating over
    `axis_name`. Must run inside shard_map.

    q, k, v: [B, H, Nl, D] — this shard's tokens (shard-major global order).
    bias: optional [H, Nl, Npad] additive logits bias — this shard's q rows
      against ALL (padded) key columns; each ring step slices its kv block.
      Mutually exclusive with bias_kind (and O(N·Npad) resident — prefer
      bias_kind for the learnable-bias PE modes).
    bias_kind/bias_arg/bias_grid: per-chunk GENERATED bias — no [H, N, N]
      (nor [H, Nl, Npad]) tensor ever exists; each ring step generates its
      [H, Nl, Nl] tile from the raw PE parameters at this shard's global row
      offset and the chunk's global column offset:
        "poly": bias_arg = [H, deg+1] coefficients, bias_grid = patch grid
                (flash_attention._poly_bias_cols — closed-form from coords);
        "rel":  bias_arg = [H, 2L-1] Toeplitz table
                (flash_attention._rel_bias_cols).
      Gradients flow through the generators (gather/einsum transposes), so
      d(coeff)/d(table) come out of AD with no materialized intermediate —
      this is what lets relative/polynomial long-N training scale across
      chips instead of stopping at one (the reference materializes the full
      O(N²) bias: /root/reference/models/vit.py:71).
    n_valid: number of globally valid tokens (static); keys with global index
      >= n_valid are masked to -inf. None = all Npad tokens valid.

    Online-softmax merge (the flash recurrence): running row-max m, running
    normalizer l, unnormalized accumulator acc; every incoming KV block
    rescales the carry by exp(m_old - m_new). Blocks seen before any valid
    key (m still -1e30) contribute exp(0)=1 junk that the first valid
    block's rescale multiplies by exp(-1e30 - m_valid) = 0 — correct as long
    as one valid key exists globally (the cls token always does).

    Differentiable by AD through the scan (ppermute transposes to the inverse
    permutation); the saved per-step residuals total O(N²/R) per device —
    that factor-R memory saving IS the point of the ring.

    Matches reference_attention.attention numerically (same f32 softmax
    statistics, associativity-level differences only).
    """
    if bias is not None and bias_kind is not None:
        raise ValueError("bias and bias_kind are mutually exclusive")
    r_total = jax.lax.psum(1, axis_name)  # static axis size
    my = jax.lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    n_pad = nl * r_total
    if n_valid is None:
        n_valid = n_pad
    row0 = my * nl  # global index of this shard's first q row
    # Each step sends the held KV block to the next shard, so at step r this
    # shard holds the block shard (my - r) % R originally owned.
    perm = [(i, (i + 1) % r_total) for i in range(r_total)]

    def body(carry, r):
        acc, m, l, k_cur, v_cur = carry
        col0 = ((my - r) % r_total) * nl  # global column of this kv block
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k_cur,
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            tile = jax.lax.dynamic_slice_in_dim(bias, col0, nl, axis=2)
            logits = logits + tile[None].astype(logits.dtype)
        elif bias_kind == "poly":
            tile = _poly_bias_cols(bias_arg, bias_grid, nl, col0, nl,
                                   bias_arg.shape[1] - 1, row_start=row0,
                                   n_valid=n_valid)
            logits = logits + tile[None].astype(logits.dtype)
        elif bias_kind == "rel":
            tile = _rel_bias_cols(bias_arg, nl, col0, nl, row_start=row0)
            logits = logits + tile[None].astype(logits.dtype)
        elif bias_kind is not None:
            raise ValueError(f"unknown bias_kind {bias_kind!r}")
        if n_valid < n_pad:
            key_idx = col0 + jnp.arange(nl)
            logits = jnp.where(key_idx[None, None, None, :] < n_valid,
                               logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)
        # The final hop is redundant work-wise but restores the original KV
        # placement and keeps the scan body uniform.
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_nxt, v_nxt), None

    init = (
        jnp.zeros((b, h, nl, d), jnp.float32),
        jnp.full((b, h, nl), NEG_INF, jnp.float32),
        jnp.zeros((b, h, nl), jnp.float32),
        k, v,
    )
    (acc, _, l, _, _), _ = jax.lax.scan(
        body, init, jnp.arange(r_total), length=r_total)
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(v.dtype)


def _ring_bias_args(bias_kind, bias_arg, bias_grid):
    poly = (bias_arg, bias_grid) if bias_kind == "poly" else None
    rel = bias_arg if bias_kind == "rel" else None
    return poly, rel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def ring_flash_attention(scale, axis_name, n_valid, bias_kind, bias_grid,
                         mm_dtype, q, k, v, bias_arg):
    """KV-ring attention whose per-chunk compute is the Pallas STREAMING
    kernel (not a materialized [Nl, Nl] jnp tile): forward saves only
    (out, lse) — O(N/R) residuals per device instead of the jnp ring's
    O(N²/R) AD-saved softmax state — and the hand-written backward re-rings
    the chunks through the streaming backward kernels with the globally
    merged logsumexp. Bias PE modes generate tiles in-kernel at global
    (row0, col0) offsets, with in-kernel dcoeff/dtable partials; RoPE modes
    pre-rotate q/k outside (identity cls/pad rows), so the kernels never
    see rope. Must run inside shard_map; per-shard PE-parameter gradients
    come out PARTIAL over `axis_name` (the train step's psum completes
    them — same contract as apply_cp's other param grads).

    q, k, v: [B, H, Nl, D] this shard's rows (shard-major global order);
    bias_kind/bias_arg/bias_grid as in ring_attention; n_valid static.
    """
    out, _ = _ring_flash_fwd_impl(scale, axis_name, n_valid, bias_kind,
                                  bias_grid, mm_dtype, q, k, v, bias_arg)
    return out


def _ring_flash_fwd_impl(scale, axis_name, n_valid, bias_kind, bias_grid,
                         mm_dtype, q, k, v, bias_arg):
    r_total = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    row0 = my * nl
    poly, rel = _ring_bias_args(bias_kind, bias_arg, bias_grid)
    perm = [(i, (i + 1) % r_total) for i in range(r_total)]

    def body(carry, r):
        out, lse, k_cur, v_cur = carry
        col0 = ((my - r) % r_total) * nl
        o_c, lse_c = streaming_chunk_fwd(q, k_cur, v_cur, scale, row0, col0,
                                         n_valid, poly=poly, rel=rel,
                                         mm_dtype=mm_dtype)
        # Online-softmax merge of chunk partials (o_c is normalized within
        # its chunk, so its weight is exp(lse_c - lse_new)).
        lse_new = jnp.logaddexp(lse, lse_c)
        out = (out * jnp.exp(lse - lse_new)[..., None]
               + o_c.astype(jnp.float32) * jnp.exp(lse_c - lse_new)[..., None])
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (out, lse_new, k_nxt, v_nxt), None

    init = (jnp.zeros((b, h, nl, d), jnp.float32),
            jnp.full((b, h, nl), NEG_INF, jnp.float32), k, v)
    (out, lse, _, _), _ = jax.lax.scan(body, init, jnp.arange(r_total),
                                       length=r_total)
    return out.astype(v.dtype), lse


def _ring_flash_fwd(scale, axis_name, n_valid, bias_kind, bias_grid,
                    mm_dtype, q, k, v, bias_arg):
    out, lse = _ring_flash_fwd_impl(scale, axis_name, n_valid, bias_kind,
                                    bias_grid, mm_dtype, q, k, v, bias_arg)
    return out, (q, k, v, bias_arg, out, lse)


def _ring_flash_bwd(scale, axis_name, n_valid, bias_kind, bias_grid,
                    mm_dtype, residuals, g):
    q, k, v, bias_arg, out, lse = residuals
    r_total = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    row0 = my * nl
    poly, rel = _ring_bias_args(bias_kind, bias_arg, bias_grid)
    perm = [(i, (i + 1) % r_total) for i in range(r_total)]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def body(carry, r):
        dq, dparam, k_cur, v_cur, dk_cur, dv_cur = carry
        col0 = ((my - r) % r_total) * nl
        dq_c, dk_c, dv_c, dp_c = streaming_chunk_bwd(
            q, k_cur, v_cur, g, lse, delta, scale, row0, col0, n_valid,
            poly=poly, rel=rel, mm_dtype=mm_dtype)
        dq = dq + dq_c
        if dparam is not None:
            dparam = dparam + dp_c
        # dk/dv partials ride the SAME ring as k/v: the accumulator for
        # chunk c, updated at step r on shard s = (c + r) mod R, travels the
        # remaining R - r hops and lands on shard c — the chunk's owner —
        # exactly when the scan ends.
        dk_cur = dk_cur + dk_c
        dv_cur = dv_cur + dv_c
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm)
        return (dq, dparam, k_nxt, v_nxt, dk_nxt, dv_nxt), None

    # bias_arg is always the per-head form ([H, deg+1] / [H, 2L-1]); shared
    # polynomial coefficients are broadcast BEFORE this function, and AD
    # outside transposes that broadcast back to a head-sum automatically.
    dparam0 = None if bias_arg is None else jnp.zeros(bias_arg.shape,
                                                      jnp.float32)
    init = (jnp.zeros((b, h, nl, d), jnp.float32), dparam0, k, v,
            jnp.zeros((b, h, nl, d), jnp.float32),
            jnp.zeros((b, h, nl, d), jnp.float32))
    (dq, dparam, _, _, dk, dv), _ = jax.lax.scan(
        body, init, jnp.arange(r_total), length=r_total)
    dbias_arg = None if bias_arg is None else dparam.astype(bias_arg.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias_arg)


ring_flash_attention.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_dispatch(cfg: ViTConfig, axis_name, n_valid, bias_kind, bias_arg,
                  bias_grid, q, k, v, scale):
    """Single home of the CP ring backend selection (shared by _cp_block and
    parallel/tp_cp.py): the Pallas streaming-kernel ring when the config
    selects the flash path AND the fused chunk backward's resident [Nl, D]
    blocks fit the VMEM budget (flash_attention._FUSED_BWD_VMEM_BUDGET —
    the chunk path has no separate-pass fallback); the jnp ring otherwise
    and for generic dense-bias PEs the kernels don't generate."""
    from vit_rpe_rope_tpu.ops.flash_attention import (
        _FUSED_BWD_VMEM_BUDGET, _round_up)

    nl, dh = q.shape[2], q.shape[3]
    nq = _round_up(nl, 256)
    nk = _round_up(nl, 512)
    chunk_fits = (nq + 2 * nk) * dh * 4 + 6 * 256 * 512 * 4         <= _FUSED_BWD_VMEM_BUDGET
    use_flash = (_attention_impl(cfg) == "flash" and chunk_fits
                 and (bias_kind is not None or bias_arg is None))
    if use_flash:
        return ring_flash_attention(scale, axis_name, n_valid, bias_kind,
                                    bias_grid, jnp.bfloat16, q, k, v,
                                    bias_arg)
    return ring_attention(q, k, v, scale, axis_name,
                          bias=bias_arg if bias_kind is None else None,
                          n_valid=n_valid,
                          bias_kind=bias_kind,
                          bias_arg=bias_arg if bias_kind else None,
                          bias_grid=bias_grid)


def _cp_block(params, prefix, x, cfg: ViTConfig, bias_arg, local_freqs,
              axis_name, n_valid, bias_kind, bias_grid):
    """Pre-LN block on a LOCAL token shard x [B, Nl, E]: every op is
    per-token except the attention, which runs the KV ring. bias_kind is the
    ring's per-chunk generation mode (None = bias_arg is a pre-sliced dense
    [H, Nl, Npad] tile or absent)."""
    eps = cfg.layer_norm_eps
    h = _layer_norm(x, params[f"{prefix}.norm1.weight"],
                    params[f"{prefix}.norm1.bias"], eps)
    bsz, nl, e = h.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    qkv = _linear(h, params[f"{prefix}.attn.qkv.weight"])
    qkv = qkv.reshape(bsz, nl, 3, nh, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, Nl, Dh]
    if local_freqs is not None:
        cos, sin = local_freqs  # [H, Nl, Dh/2] — identity rows cover cls/pad
        q = rotate_half_split(q, cos[None], sin[None])
        k = rotate_half_split(k, cos[None], sin[None])
    attn_out = ring_dispatch(cfg, axis_name, n_valid, bias_kind, bias_arg,
                             bias_grid, q, k, v, dh ** -0.5)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(bsz, nl, e)
    x = x + _linear(attn_out, params[f"{prefix}.attn.proj.weight"],
                    params[f"{prefix}.attn.proj.bias"])
    h = _layer_norm(x, params[f"{prefix}.norm2.weight"],
                    params[f"{prefix}.norm2.bias"], eps)
    h = _linear(h, params[f"{prefix}.mlp.fc1.weight"],
                params[f"{prefix}.mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, params[f"{prefix}.mlp.fc2.weight"],
                params[f"{prefix}.mlp.fc2.bias"])
    return x + h


def apply_cp(params, images, cfg: ViTConfig, axis_name: str = MODEL_AXIS):
    """Sequence-parallel forward: same contract as models.vit.apply, but MUST
    run inside shard_map over a mesh containing `axis_name`, with params
    replicated and images sharded over 'data' only.

    The embedding (patch matmul + cls + PE generators) runs redundantly on
    every sequence shard — O(N·E) work, negligible next to the O(N²/R + N·E²)
    blocks — then each shard slices its token range; under AD the slice
    transpose scatters each shard's cotangent back, so param grads come out
    PARTIAL over `axis_name` and the train step psums them (exactly one
    count per token). The classifier head reads the cls row on shard 0 and a
    partial-sum psum re-replicates the logits.

    Dropout is not supported under CP (the reference's effective regime is
    all rates 0 — SURVEY.md Q11); fit() rejects the combination.
    """
    assert not cfg.has_dropout, "context parallelism does not support dropout"
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    r_total = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    x = patch_embed(params, images.astype(dtype), cfg)
    bsz = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)  # [B, N, E]
    n = x.shape[1]
    n_pad = -(-n // r_total) * r_total
    nl = n_pad // r_total

    bias_kind = None
    bias_arg = None
    bias_grid = 0
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(params, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        # The learnable-bias modes ship their RAW parameters to the ring,
        # which generates each [H, Nl, Nl] tile per (q-shard, kv-chunk) —
        # per-device bias residency O(N²/R²) per step instead of the
        # O(N·Npad) a pre-sliced materialized bias would pin (at N=16,385
        # the full bias is ~17 GB; the generators make long-N CP reachable).
        if cfg.pos_encoding == "polynomial":
            bias_kind = "poly"
            bias_arg = pe_mod.coeff_per_head(params, cfg)
            bias_grid = cfg.grid_size
        elif cfg.pos_encoding == "relative":
            bias_kind = "rel"
            bias_arg = pe_mod.table_per_head(params, cfg)
        else:  # generic logits-bias PE: materialize + pre-slice (O(N²))
            full = pe_mod.attn_bias(params, cfg)  # [H, N, N]
            pad = n_pad - n
            full = jnp.pad(full, ((0, 0), (0, pad), (0, pad)))
            bias_arg = jax.lax.dynamic_slice_in_dim(full, my * nl, nl,
                                                    axis=1)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(params, cfg)

    # Slice this shard's tokens (shard-major order; zero-padding at the tail).
    x = jax.lax.dynamic_slice_in_dim(_pad_seq(x, n_pad, axis=1), my * nl, nl,
                                     axis=1)

    local_freqs = None
    if freqs_cis is not None:
        cos, sin = _prep_freqs(freqs_cis, cfg.num_heads, n_pad, jnp.float32)
        local_freqs = (
            jax.lax.dynamic_slice_in_dim(cos, my * nl, nl, axis=1),
            jax.lax.dynamic_slice_in_dim(sin, my * nl, nl, axis=1))

    block_fn = remat_block_fn(cfg, _cp_block,
                              static_argnums=(1, 3, 6, 7, 8, 9))
    for i in range(cfg.depth):
        x = block_fn(params, f"blocks.{i}", x, cfg, bias_arg, local_freqs,
                     axis_name, n, bias_kind, bias_grid)
    x = _layer_norm(x, params["norm.weight"], params["norm.bias"],
                    cfg.layer_norm_eps)
    # cls = global token 0 = local row 0 of shard 0; other shards contribute
    # zeros to the partial-sum psum that re-replicates the logits.
    logits = _linear(x[:, 0], params["head.weight"], params["head.bias"])
    logits = logits * (my == 0).astype(logits.dtype)
    return psum_identity_bwd(logits, axis_name).astype(jnp.float32)
