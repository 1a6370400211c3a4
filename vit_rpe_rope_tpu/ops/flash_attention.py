"""Pallas fused attention with in-kernel positional encoding (TPU).

The reference materializes [B, H, N, N] attention logits (and the [H, N, N]
bias) in HBM for every block (/root/reference/models/vit.py:71-88). Here one
Pallas kernel per (batch, head) program computes rotation → logits → softmax
→ weighted sum entirely in VMEM; the N×N matrix never touches HBM
(SURVEY.md §2 #19, §5.7).

PE handling (SURVEY.md §2.3 taxonomy):
* qk_rotation (rope-axial / rope-mixed): cos/sin tiles are loaded per head
  and the half-split rotation runs in-kernel. The cls token (index 0) must
  stay unrotated (SURVEY.md Q2) — instead of the reference's split/concat
  dance, cos/sin are prepended with an IDENTITY row (cos=1, sin=0): rotating
  by phase 0 is the identity, so one uniform rotation covers all tokens.
* logits_bias (relative / polynomial): the [H, N, N] bias is generated once
  per step (outside) and streamed per-head as a VMEM tile; gradients flow to
  the bias through the custom VJP, so the table/coefficients still train.
* Sequence padding is asymmetric: queries pad to the 8-sublane boundary,
  keys to the 128-lane boundary; padded KEY columns are masked to -inf before
  the softmax (padded query rows are garbage and sliced off by the caller).

Backward: custom_vjp, routed by the same VMEM footprint predicate as the
forward (_dense_attn_fits). In the dense regime a head-batched one-kernel
backward (_dense_bwd_kernel, round 3) recomputes the softmax in VMEM and
runs the five flash-identity matmuls in one program — no [B, H, N, N]
tensor leaves VMEM. Above it (long N, or mid-size shapes whose dense tiles
overflow) the tiled streaming backward runs for EVERY PE regime — normally
the ONE-pass fused kernel (dq/dk/dv/dparam from a single sweep with
resident [N, D] blocks), with separate dq/dkv/dbias/dcoeff/dtable passes
for the dense-bias and learnable-frequency modes; p is recomputed from the
forward-saved per-row logsumexp. Nothing larger than the caller's own
[H, N, N] bias ever materializes in either direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_rpe_rope_tpu.ops import reference_attention

LANE = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rotate(x, cos, sin):
    d2 = x.shape[-1] // 2
    x1, x2 = x[:, :d2], x[:, d2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _rotate_bh(x, cos, sin):
    """Half-split rotation over the last dim of x [BB, H, Np, D] with cos/sin
    [H, Np, D/2] broadcast over the batch block."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos, sin = cos[None], sin[None]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _attn_kernel(q_ref, k_ref, v_ref, *rest, out_ref, scale, n_valid,
                 has_bias, has_rope, mm_dtype=jnp.bfloat16):
    """One batch-block program: all heads, full attention tiles in VMEM.

    Grid is 1-D over batch blocks (heads are batched inside via MXU batched
    matmuls) — a (batch, head) grid of tiny programs is dominated by grid-step
    overhead at these shapes.
    """
    idx = 0
    bias_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_bias:
        bias_ref = rest[idx]
        idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]
        idx += 4

    q = q_ref[...].astype(jnp.float32)  # [BB, H, Nq, D]
    k = k_ref[...].astype(jnp.float32)  # [BB, H, Nk, D]
    bb, h, nq, d = q.shape
    nk = k.shape[2]
    if has_rope:
        q = _rotate_bh(q, cos_q_ref[...].astype(jnp.float32),
                       sin_q_ref[...].astype(jnp.float32))
        k = _rotate_bh(k, cos_k_ref[...].astype(jnp.float32),
                       sin_k_ref[...].astype(jnp.float32))

    # Mosaic matmul supports a single batch dim: fold (BB, H) for the dots,
    # unfold for the (rank-agnostic) elementwise softmax ops. Multiplies run
    # in bf16 with f32 accumulation — the same regime as XLA's DEFAULT
    # precision for f32 matmuls on TPU (full-f32 MXU passes are ~3x slower
    # and beyond what the surrounding XLA ops use anyway).
    qf = q.reshape(bb * h, nq, d).astype(mm_dtype)
    kf = k.reshape(bb * h, nk, d).astype(mm_dtype)
    logits = jax.lax.dot_general(
        qf, kf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bb, h, nq, nk) * scale
    if has_bias:
        logits = logits + bias_ref[...][None].astype(jnp.float32)

    if n_valid < nk:  # mask padded KEY columns (static condition)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        logits = jnp.where(col < n_valid, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.reshape(bb * h, nq, nk).astype(mm_dtype),
        v_ref[...].reshape(bb * h, nk, d).astype(mm_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bb, h, nq, d)
    # Normalize AFTER the matmul: divides [Nq, D] instead of [Nq, Nk].
    out_ref[...] = (out / denom).astype(out_ref.dtype)


def _dense_bwd_kernel(q_ref, k_ref, v_ref, g_ref, out_ref, *rest, dq_ref,
                      dk_ref, dv_ref, dbias_ref=None, dqr_ref=None,
                      dkr_ref=None, scale, n_valid, has_bias, has_rope,
                      mm_dtype=jnp.bfloat16):
    """Dense-regime backward, one batch-block program mirroring _attn_kernel:
    all heads head-batched on the MXU, the full [BB, H, Nq, Nk] softmax
    recomputed in VMEM (no lse residual needed — m/denom are a VPU epilogue
    of the s matmul), then the five flash-identity matmuls in one kernel.
    XLA's backward materializes p and ds through HBM between its fused
    GEMMs; here nothing [Nq, Nk]-shaped ever leaves VMEM.

    dbias_ref ([H, Nq, Nk], optional): Σ_batch ds, accumulated across the
    sequential 1-D batch grid (zeroed at block 0). The generated-bias modes
    (poly/rel) transpose this to dcoeff/dtable OUTSIDE via the generator's
    jnp vjp — at dense sizes the [H, N, N] tensor is small (that is what
    makes this regime dense).
    dqr/dkr ([BB, H, N, D], optional): rotated-space gradients for the
    learnable rope-mixed frequency reduction (_rot_grads_to_dfreqs)."""
    idx = 0
    bias_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_bias:
        bias_ref = rest[idx]
        idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]
        idx += 4

    q = q_ref[...].astype(jnp.float32)  # [BB, H, Nq, D]
    k = k_ref[...].astype(jnp.float32)  # [BB, H, Nk, D]
    bb, h, nq, d = q.shape
    nk = k.shape[2]
    if has_rope:
        q = _rotate_bh(q, cos_q_ref[...].astype(jnp.float32),
                       sin_q_ref[...].astype(jnp.float32))
        k = _rotate_bh(k, cos_k_ref[...].astype(jnp.float32),
                       sin_k_ref[...].astype(jnp.float32))

    qf = q.reshape(bb * h, nq, d).astype(mm_dtype)
    kf = k.reshape(bb * h, nk, d).astype(mm_dtype)
    s = jax.lax.dot_general(
        qf, kf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bb, h, nq, nk) * scale
    if has_bias:
        s = s + bias_ref[...][None].astype(jnp.float32)
    if n_valid < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    pd = p / jnp.sum(p, axis=-1, keepdims=True)  # normalized probabilities

    g = g_ref[...].astype(jnp.float32)
    gf = g.reshape(bb * h, nq, d).astype(mm_dtype)
    vf = v_ref[...].reshape(bb * h, nk, d).astype(mm_dtype)
    pf = pd.reshape(bb * h, nq, nk).astype(mm_dtype)
    # dv = pᵀ g   [Nk, D]
    dv = jax.lax.dot_general(
        pf, gf, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # gv = g vᵀ   [Nq, Nk];  delta = Σ_d g·out;  ds = p ⊙ (gv − delta)
    gv = jax.lax.dot_general(
        gf, vf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(bb, h, nq, nk)
    delta = jnp.sum(g * out_ref[...].astype(jnp.float32), axis=-1,
                    keepdims=True)
    ds = pd * (gv - delta)
    dsf = ds.reshape(bb * h, nq, nk).astype(mm_dtype)
    dq = scale * jax.lax.dot_general(
        dsf, kf, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(bb, h, nq, d)
    dk = scale * jax.lax.dot_general(
        dsf, qf, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(bb, h, nk, d)

    if dbias_ref is not None:
        bi = pl.program_id(0)

        @pl.when(bi == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        dbias_ref[...] += jnp.sum(ds, axis=0).astype(dbias_ref.dtype)

    if dqr_ref is not None:
        dqr_ref[...] = dq.astype(dqr_ref.dtype)
        dkr_ref[...] = dk.astype(dkr_ref.dtype)
    if has_rope:  # inverse rotation back to unrotated space
        dq = _rotate_bh(dq, cos_q_ref[...].astype(jnp.float32),
                        -sin_q_ref[...].astype(jnp.float32))
        dk = _rotate_bh(dk, cos_k_ref[...].astype(jnp.float32),
                        -sin_k_ref[...].astype(jnp.float32))
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(bb, h, nk, d).astype(dv_ref.dtype)


def _bwd_dense(scale, q, k, v, bias, freqs_cis, out, g, interpret,
               mm_dtype=jnp.bfloat16, want_dbias=False, want_dfreqs=False):
    """Driver for _dense_bwd_kernel: pad to the forward's asymmetric (8, 128)
    layout, pick the batch block so ~4 [H, Nq, Nk] f32 tiles stay in VMEM,
    run the 1-D batch grid. Returns (dq, dk, dv, dbias, dfreqs) with the
    same conventions as _bwd_streaming."""
    b, h, n, d = q.shape
    nq = _round_up(n, 8)
    nk = _round_up(n, LANE)
    qp = _pad_seq(q, nq, 2)
    kp = _pad_seq(k, nk, 2)
    vp = _pad_seq(v, nk, 2)
    gp = _pad_seq(g, nq, 2)
    op = _pad_seq(out, nq, 2)

    # Backward holds ~4 concurrent [BB, H, Nq, Nk] f32 tiles (s/p, gv, ds
    # live ranges overlap) vs the forward's ~2 — halve the block target.
    bb = max(1, min(b, (1024 * 1024) // (2 * 4 * h * nq * nk)))
    while b % bb:
        bb -= 1

    inputs = [qp, kp, vp, gp, op]
    in_specs = [
        pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_bias = bias is not None
    has_rope = freqs_cis is not None
    if has_bias:
        inputs.append(_pad_seq(_pad_seq(bias, nq, 1), nk, 2))
        in_specs.append(pl.BlockSpec((h, nq, nk), lambda bi: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if has_rope:
        cos_q, sin_q = _prep_freqs(freqs_cis, h, nq, jnp.float32)
        cos_k, sin_k = _prep_freqs(freqs_cis, h, nk, jnp.float32)
        inputs.extend([cos_q, sin_q, cos_k, sin_k])
        in_specs.extend([
            pl.BlockSpec((h, npad, d // 2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM)
            for npad in (nq, nq, nk, nk)
        ])

    kernel = functools.partial(
        _dense_bwd_kernel, scale=scale, n_valid=n, has_bias=has_bias,
        has_rope=has_rope, mm_dtype=mm_dtype)

    out_specs = [
        pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
                 jax.ShapeDtypeStruct((b, h, nk, d), q.dtype),
                 jax.ShapeDtypeStruct((b, h, nk, d), q.dtype)]
    if want_dbias:
        out_specs.append(pl.BlockSpec((h, nq, nk), lambda bi: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((h, nq, nk), jnp.float32))
    if want_dfreqs:
        out_specs.extend([
            pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ])
        out_shape.extend([jax.ShapeDtypeStruct((b, h, nq, d), jnp.float32),
                          jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32)])

    def entry(*refs):
        ins = refs[:len(inputs)]
        outs = list(refs[len(inputs):])
        kw = {}
        pos = 3
        if want_dbias:
            kw["dbias_ref"] = outs[pos]
            pos += 1
        if want_dfreqs:
            kw["dqr_ref"] = outs[pos]
            kw["dkr_ref"] = outs[pos + 1]
        kernel(*ins, dq_ref=outs[0], dk_ref=outs[1], dv_ref=outs[2], **kw)

    call_kw = {}
    if not interpret:
        call_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    res = pl.pallas_call(
        entry,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **call_kw,
    )(*inputs)
    dq, dk, dv = res[0], res[1], res[2]
    pos = 3
    dbias = None
    if want_dbias:
        dbias = res[pos][:, :n, :n]
        pos += 1
    dfreqs = None
    if want_dfreqs:
        dqr, dkr = res[pos], res[pos + 1]
        dfreqs = _rot_grads_to_dfreqs(qp, kp, dqr, dkr, freqs_cis)
    return dq[:, :, :n, :], dk[:, :, :n, :], dv[:, :, :n, :], dbias, dfreqs


def _coeff_scalar(coeff, hi, kk):
    """coeff[hi, kk] as a scalar via a one-hot masked reduction — the coeff
    block is the full [H, LANE] array (Mosaic requires block dims equal to
    the array's when they aren't (8, 128)-aligned), and dynamic-sublane
    scalar reads don't lower; a masked full-array sum does."""
    mh = jax.lax.broadcasted_iota(jnp.int32, coeff.shape, 0) == hi
    mk = jax.lax.broadcasted_iota(jnp.int32, coeff.shape, 1) == kk
    return jnp.sum(jnp.where(mh & mk, coeff, 0.0))


def _poly_tile(coeff_ref, q_start, k_start, tq, tk, grid, degree, n_valid,
               with_dist=False):
    """Generate a [Tq, Tkv] polynomial-RPE bias tile IN-KERNEL from the
    [deg+1] coefficient row — closed-form from iota coordinates, no gather
    (the gather/roll lowerings this sidesteps are the blocked Toeplitz items
    in ROADMAP.md). Token t's patch coords are ((t-1) % g, (t-1) // g); the
    cls row/col (token 0) is zeroed, matching pe/polynomial.attn_bias
    (/root/reference/models/positional_encoding.py:97-171 semantics).
    Rows/cols beyond n_valid are zeroed too: padded ROWS are not -inf-masked
    by the kernels, and a garbage positive bias there would overflow exp()
    into inf·0 = NaN that the dk/dv accumulations then ingest.

    coeff_ref is the full [H, LANE] coefficient block; `hi` (the kernel's
    head program id) selects the row via _coeff_scalar."""
    coeff_ref, hi = coeff_ref
    coeff = coeff_ref[...].astype(jnp.float32)
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    xq, yq = (rows - 1) % grid, (rows - 1) // grid
    xk, yk = (cols - 1) % grid, (cols - 1) // grid
    dist = (jnp.abs(xq - xk) + jnp.abs(yq - yk)).astype(jnp.float32)
    bias = jnp.zeros((tq, tk), jnp.float32)
    pw = jnp.ones((tq, tk), jnp.float32)
    for kk in range(degree + 1):
        bias = bias + _coeff_scalar(coeff, hi, kk) * pw
        pw = pw * dist
    valid = ((rows > 0) & (cols > 0)
             & (rows < n_valid) & (cols < n_valid))
    bias = jnp.where(valid, bias, 0.0)
    if with_dist:  # the dcoeff pass reuses dist/valid for gradient powers
        return bias, dist, valid
    return bias


def _poly_bias_cols(coeff_hk, grid, n_rows, start, width, degree,
                    row_start=0, n_valid=None):
    """jnp twin of _poly_tile for the non-kernel sites (dense fallback, the
    streaming-lse recompute, and the CP ring's per-chunk generation):
    [H, n_rows, width] bias for token rows [row_start, row_start+n_rows)
    against token columns [start, start+width). `start`/`row_start` may be
    traced (the ring passes its rotating chunk offset and shard row offset).
    n_valid (static) zeroes rows/cols at padded global indices — their dist
    polynomial is finite but unbounded, and exp() of garbage positive bias
    would overflow (same rationale as _poly_tile's n_valid mask)."""
    rows = row_start + jnp.arange(n_rows)
    cols = start + jnp.arange(width)
    xq, yq = (rows - 1) % grid, (rows - 1) // grid
    xk, yk = (cols - 1) % grid, (cols - 1) // grid
    dist = (jnp.abs(xq[:, None] - xk[None, :])
            + jnp.abs(yq[:, None] - yk[None, :])).astype(jnp.float32)
    powers = jnp.stack([dist ** kk for kk in range(degree + 1)], axis=-1)
    bias = jnp.einsum("nwk,hk->hnw", powers, coeff_hk.astype(jnp.float32))
    mask = (rows[:, None] > 0) & (cols[None, :] > 0)
    if n_valid is not None:
        mask = mask & (rows[:, None] < n_valid) & (cols[None, :] < n_valid)
    return jnp.where(mask[None], bias, 0.0)


def _head_row(mat, hi):
    """mat[hi] as a [1, W] row via one-hot reduction (same Mosaic rationale
    as _coeff_scalar: full-array blocks, no dynamic-sublane reads)."""
    sel = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0) == hi
    return jnp.sum(jnp.where(sel, mat, 0.0), axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Relative-table in-kernel bias generation (1-D Toeplitz, SURVEY.md Q3):
# bias[h, i, j] = table[h, i - j + L - 1]. Gathers don't lower in Mosaic
# (ROADMAP), but dynamic-shift pltpu.roll + a log2(Tq) binary-shift expansion
# do: roll the REVERSED table row so the tile's window leads, broadcast it to
# Tq rows, and give row i its extra shift via bit-decomposed static rolls.
# The transpose (dtable) is the same dance backwards: bit-unshift the ds
# rows, column-sum into a window, roll it back to table position.
# All reversals happen OUTSIDE the kernels (lax.rev doesn't lower either):
# kernels consume rrow = reverse(pad(table_row)) and the dtable pass emits
# gradients in rrow coordinates, un-reversed by the caller.
# ---------------------------------------------------------------------------

def _rel_prep(table_h):
    """[H, 2L-1] table -> (rrow [H, Wfull] f32, L, wfull): zero-padded to a
    lane multiple, then lane-reversed, ready for _rel_tile."""
    h, tw = table_h.shape
    ell = (tw + 1) // 2
    wfull = _round_up(tw, LANE)
    padded = jnp.pad(table_h.astype(jnp.float32), ((0, 0), (0, wfull - tw)))
    return padded[:, ::-1], ell, wfull


_EXPAND_BASE = 8  # sublane-aligned base block for the doubling expansion


def _expand_shifts(row, tq, wpad):
    """[1, wpad] -> [tq, wpad] with out[i] = roll(row, i). Roll+select
    cascade for the first <=8 rows (sublane-aligned base), then DOUBLING:
    m <- concat(m, roll(m, rows)) gives rows r and r+rows shift r and
    r+rows respectively. Total roll work is O(tq) rows instead of the
    O(tq log tq) of an all-rows select cascade — at Tq=256 that is ~250
    row-rolls vs ~2048, and the >=8-row steps stay sublane-aligned."""
    base = min(_EXPAND_BASE, 1 << (tq - 1).bit_length() if tq > 1 else 1)
    m = jnp.broadcast_to(row, (base, wpad))
    for b in range((base - 1).bit_length()):
        rolled = jnp.roll(m, 1 << b, axis=1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (base, wpad), 0)
               >> b) % 2 == 1
        m = jnp.where(sel, rolled, m)
    rows = base
    while rows < tq:
        m = jnp.concatenate([m, jnp.roll(m, rows, axis=1)], axis=0)
        rows *= 2
    return m[:tq]


def _fold_shifts(d, tq, wpad):
    """Transpose of _expand_shifts: [tq, wpad] -> [1, wpad] computing
    sum_i roll(d[i], -i). Pairwise fold (top + roll(bottom, -half)) halves
    the rows per pass — roll(roll(x, -half), -i) == roll(x, -(i + half)) —
    down to the 8-row base, which a 3-pass select cascade + column sum
    finishes. Same O(tq) total roll work as the expansion."""
    rows = 1 << (tq - 1).bit_length() if tq > 1 else 1
    if rows > tq:
        d = jnp.pad(d, ((0, rows - tq), (0, 0)))  # zero rows fold away
    while rows > _EXPAND_BASE:
        half = rows // 2
        d = d[:half] + jnp.roll(d[half:], -half, axis=1)
        rows = half
    for b in range((rows - 1).bit_length()):
        rolled = jnp.roll(d, -(1 << b), axis=1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (rows, wpad), 0)
               >> b) % 2 == 1
        d = jnp.where(sel, rolled, d)
    return jnp.sum(d, axis=0, keepdims=True)


def _rel_tile(rrow_ref, q_start, k_start, tq, tk, ell, wfull):
    """[Tq, Tk] relative-bias tile generated in-kernel:
    out[i, j] = padded_table[(base + i - j) mod wfull], base = q_start -
    k_start + L - 1. Valid tokens never wrap (|i-j| <= L-1); padded rows/
    cols read bounded junk that the callers' masks / zero ds neutralize.
    rrow_ref: (ref [H, Wfull], hi) like _poly_tile's coeff argument."""
    rrow_ref, hi = rrow_ref
    rrow = _head_row(rrow_ref[...].astype(jnp.float32), hi)  # [1, Wfull]
    wpad = _round_up(tq + tk - 1, LANE)
    base = q_start - k_start + ell - 1
    s_min = wfull - 1 - base - (tq - 1)
    r = pltpu.roll(rrow, (wfull - s_min % wfull) % wfull, 1)  # -s_min mod
    if wpad > wfull:
        # The rolled row is periodic (roll wraps), so tiling it is EXACT for
        # every valid (i, j) — their absolute rrow indices lie in [0, Wfull).
        # Only arises when the table is smaller than the tile span (tiny-N
        # tests); at streaming N, Wfull >> wpad.
        reps = -(-wpad // wfull)
        r = jnp.concatenate([r] * reps, axis=1)
    m0 = jnp.roll(r[:, :wpad], -(tq - 1), axis=1)
    m = _expand_shifts(m0, tq, wpad)
    return m[:, :tk]


def _rel_ds_to_dtabr(ds, q_start, k_start, ell, wfull):
    """Transpose of _rel_tile: scatter a [Tq, Tk] ds tile onto the reversed
    padded table row -> [1, Wfull] (accumulated by the dtable pass; the
    caller un-reverses). ds must already be zeroed outside the valid
    region."""
    tq, tk = ds.shape
    wpad = _round_up(tq + tk - 1, LANE)
    base = q_start - k_start + ell - 1
    s_min = wfull - 1 - base - (tq - 1)
    d = jnp.pad(ds, ((0, 0), (0, wpad - tk)))
    d = jnp.roll(d, tq - 1, axis=1)
    wg = _fold_shifts(d, tq, wpad)  # [1, wpad]
    if wpad > wfull:
        # Fold the over-wide window back modulo Wfull (transpose of the
        # periodic tiling in _rel_tile) via static-slice chunks.
        reps = -(-wpad // wfull)
        wg = jnp.pad(wg, ((0, 0), (0, reps * wfull - wpad)))
        folded = wg[:, :wfull]
        for r in range(1, reps):
            folded = folded + wg[:, r * wfull:(r + 1) * wfull]
        full = folded
    else:
        full = jnp.pad(wg, ((0, 0), (0, wfull - wpad)))
    return pltpu.roll(full, s_min % wfull, 1)


def _rel_scr_align(row0, col0, n_qt, q_tile, ell, wfull):
    """Alignment index A of the pre-rolled extended row: ext[p] = rrow[(A +
    p) mod wfull]. Chosen so the (qi, ki) tile's aligned window r (what
    _rel_tile computed with its per-tile full-width roll) sits at offset
    (n_qt-1-qi)·q_tile + ki·kv_tile: A = s_min(qi=n_qt-1, ki=0) = wfull -
    1 - base_ref - (q_tile-1). The expansion's mod-wpad row rolls only
    permute WITHIN the window, so the window must be read at the s_min
    alignment (the -(tq-1) seed roll stays per-tile, a cheap [1, wpad]
    static roll)."""
    return (wfull - 1 - (row0 + (n_qt - 1) * q_tile - col0 + ell - 1)
            - (q_tile - 1))


def _rel_tile_off(qi, ki, n_qt, q_tile, kv_tile):
    """Aligned-row window offset of tile (qi, ki); lane-aligned whenever both
    tile sizes are (the streaming defaults 256/512 — the hint lets Mosaic
    lower the dynamic lane slice as a block copy)."""
    off = (n_qt - 1 - qi) * q_tile + ki * kv_tile
    if q_tile % LANE == 0 and kv_tile % LANE == 0:
        off = pl.multiple_of(off, LANE)
    return off


def _rel_row_to_tile(r, tq, tk, wpad):
    """[1, wpad] aligned window -> [Tq, Tk] bias tile: the -(tq-1) seed
    roll wraps mod wpad by design (the expansion's row rolls index the
    same wpad-periodic window — exactly _rel_tile's structure), then the
    O(Tq) doubling expansion."""
    m0 = jnp.roll(r, -(tq - 1), axis=1)
    return _expand_shifts(m0, tq, wpad)[:, :tk]


def _rel_tile_win(prw_ref, off, tq, tk):
    """[Tq, Tk] relative-bias tile from a driver-pre-rolled [1, 1, W] window
    input (the fused backward's per-q-group slice): a [1, wpad] window read
    + the O(Tq) doubling expansion — no O(Wfull) work or residency anywhere
    in the kernel."""
    wpad = _round_up(tq + tk - 1, LANE)
    return _rel_row_to_tile(prw_ref[0, :, pl.ds(off, wpad)], tq, tk, wpad)


def _rel_scatter_scr(acc_ref, off, dsz):
    """Transpose of _rel_tile_win: fold the (zeroed-outside-valid) ds tile
    and accumulate the [1, wpad] window into the EXTENDED accumulator at
    the tile's offset; the driver collapses the extension and undoes the
    alignment once at the end (the old per-tile path padded to Wfull and
    rolled — O(Wfull) per tile)."""
    tq, tk = dsz.shape
    wpad = _round_up(tq + tk - 1, LANE)
    d = jnp.pad(dsz, ((0, 0), (0, wpad - tk)))
    d = jnp.roll(d, tq - 1, axis=1)
    acc_ref[:, pl.ds(off, wpad)] += _fold_shifts(d, tq, wpad)


def _rel_fwd_frames(rel, n_qt, n_kt, q_tile, kv_tile, row0, col0, n_valid):
    """Per-tile pre-framed relative windows for the streaming FORWARD.

    Tile (qi, ki) reads the [1, wpad] aligned window at row offset
    off = (n_qt-1-qi)·q_tile + ki·kv_tile — what the previous design served
    from a kernel-initialized O(Wfull ≈ 2N) scratch (plus the full [1, Wfull]
    row input), whose residency blew the 64 MB scoped-VMEM limit at N = 1M
    (81.8 MB). Every off is a multiple of step = gcd(q_tile, kv_tile), so
    framing the pre-rolled periodically-extended row at stride `step` and
    width wpad hands each tile its window as ONE [1, 1, wpad] input block
    via the diagonal index map j = (n_qt-1-qi)·(q_tile/step) + ki·(kv_tile/
    step): kernel residency for the relative mode drops to O(wpad) = 3 KB,
    O(1) in N. The frames cost (wpad/step)× the extended row in HBM
    (~24N bytes/head at the 256/512 tile defaults) and are built with
    wpad/step interleaved non-overlapping reshapes — no gather, no
    per-window slice unroll. row0/col0 may be traced (CP ring chunks).

    Returns (frames [H·n_win, 1, wpad] f32, index_map, wpad). Head × window
    ride ONE leading untiled axis — a (1, 1, wpad) block of an [H, n_win,
    wpad] array would slice a size->1 window from a tiled dim, which Mosaic
    rejects."""
    rrow, ell, wfull = _rel_prep(rel)
    if n_valid > ell:
        raise ValueError(
            f"relative table covers L={ell} tokens < sequence {n_valid}")
    h = rrow.shape[0]
    wpad = _round_up(q_tile + kv_tile - 1, LANE)
    step = math.gcd(q_tile, kv_tile)
    if wpad % step:
        # The frame construction needs the window width to be a whole
        # number of strides; the streaming tile defaults (256/512 → step
        # 256, wpad 768) and every LANE-multiple tile pair satisfy this.
        raise ValueError(f"window {wpad} not a multiple of stride {step}")
    r = wpad // step
    a = _rel_scr_align(row0, col0, n_qt, q_tile, ell, wfull)
    rolled = jnp.roll(rrow, -(a % wfull), axis=1)
    span = (n_qt - 1) * q_tile + (n_kt - 1) * kv_tile
    n_win = span // step + 1
    m = -(-n_win // r)               # frames per offset class
    wext = step * (r - 1) + wpad * m
    reps = -(-wext // wfull)
    ext = (jnp.concatenate([rolled] * reps, axis=1)[:, :wext]
           if reps > 1 else rolled[:, :wext])
    # Frame j (start step·j, width wpad) = class o = j % r, slot t = j // r
    # of the non-overlapping reshape starting at step·o.
    ys = [ext[:, o * step:o * step + wpad * m].reshape(h, m, wpad)
          for o in range(r)]
    n_win_t = m * r
    frames = jnp.stack(ys, axis=2).reshape(h * n_win_t, 1, wpad)
    qs, ks = q_tile // step, kv_tile // step

    def imap(bi, hi, qi, ki, nq_t=n_qt, nw=n_win_t, qs=qs, ks=ks):
        return (hi * nw + (nq_t - 1 - qi) * qs + ki * ks, 0, 0)

    return frames, imap, wpad


def _rel_bias_cols(table_h, n_rows, start, width, row_start=0):
    """jnp twin for the non-kernel sites (dense fallback, streaming-lse
    chunks, CP ring per-chunk generation): [H, n_rows, width] bias for token
    rows [row_start, row_start+n_rows) × cols [start, start+width); offsets
    may be traced. Out-of-table offsets (padded tokens) clamp to the table
    edge — finite values that the callers' key masks / zero cotangents
    neutralize."""
    ell = (table_h.shape[1] + 1) // 2
    rows = row_start + jnp.arange(n_rows)
    cols = start + jnp.arange(width)
    idx = jnp.clip(rows[:, None] - cols[None, :] + ell - 1,
                   0, table_h.shape[1] - 1)
    return table_h[:, idx].astype(jnp.float32)


def _pad_coeff(coeff_hk):
    """[H, deg+1] -> [H, LANE] (zero-padded lanes; kernels read scalars by
    static index so only the first deg+1 lanes matter)."""
    h, w = coeff_hk.shape
    return jnp.pad(coeff_hk.astype(jnp.float32), ((0, 0), (0, LANE - w)))


def _pad_seq(x, n_pad, axis):
    pad = n_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep_freqs(freqs_cis, num_heads, n_pad, dtype, broadcast=True):
    """(cos, sin) [S, D/2] or [H, S, D/2] (S = N-1 patch tokens) →
    [H, Np, D/2] with an identity row for the cls token and identity rows in
    the padding region. broadcast=False keeps head-shared tables (rope-axial)
    at H=1 — the streaming drivers' per-head BlockSpec windows never need
    the H copies, and materializing them costs real HBM at long N (each
    f32 [H, Np, 16] table pads its 16-lane minor 8× to the 128-lane tile:
    4 tables × H=4 ≈ 8.6 GB at N=1M, the single largest constant of the
    rope-mode step)."""
    cos, sin = freqs_cis
    if cos.ndim == 2:
        reps = num_heads if broadcast else 1
        cos = jnp.broadcast_to(cos[None], (reps,) + cos.shape)
        sin = jnp.broadcast_to(sin[None], (reps,) + sin.shape)
    h, s, d2 = cos.shape
    pad_rows = n_pad - s - 1
    ones = jnp.ones((h, 1, d2), cos.dtype)
    zeros = jnp.zeros((h, 1, d2), sin.dtype)
    cos = jnp.concatenate(
        [ones, cos, jnp.broadcast_to(ones, (h, pad_rows, d2))], axis=1)
    sin = jnp.concatenate(
        [zeros, sin, jnp.broadcast_to(zeros, (h, pad_rows, d2))], axis=1)
    return cos.astype(dtype), sin.astype(dtype)


def _make_flash_attention(mm_dtype):
    """Build a custom_vjp'd fused attention with in-kernel matmuls running in
    `mm_dtype` (bf16 multiplies + f32 accumulation matches XLA's DEFAULT
    precision for f32 matmuls on TPU; f32 is for high-precision parity).

    The public wrapper takes `poly=(coeff_hk [H, deg+1], grid_size)` as an
    alternative to a materialized `bias`: the polynomial-RPE bias is then
    GENERATED in-kernel per tile (closed-form from coordinates) and its
    coefficient gradient accumulated in-kernel — no [H, N, N] tensor exists
    in either direction, which is what makes polynomial PE reachable at
    N >= 8k (where the bias alone would be tens of GB)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
    def attn(q, k, v, scale, bias, freqs_cis, poly_grid, poly_coeff,
             rel_table):
        return _forward(q, k, v, scale, bias, freqs_cis, poly_coeff,
                        poly_grid, rel_table, mm_dtype=mm_dtype)

    def fwd(q, k, v, scale, bias, freqs_cis, poly_grid, poly_coeff,
            rel_table):
        out, lse = _forward(q, k, v, scale, bias, freqs_cis, poly_coeff,
                            poly_grid, rel_table, mm_dtype=mm_dtype,
                            want_lse=True)
        return out, (q, k, v, bias, freqs_cis, poly_coeff, rel_table, out,
                     lse)

    attn.defvjp(fwd, functools.partial(_bwd, mm_dtype=mm_dtype))

    def flash(q, k, v, scale, bias=None, freqs_cis=None, poly=None,
              rel=None):
        if poly is not None:
            if bias is not None or rel is not None:
                raise ValueError("bias/poly/rel are mutually exclusive")
            coeff_hk, grid = poly
            return attn(q, k, v, scale, None, freqs_cis, int(grid), coeff_hk,
                        None)
        if rel is not None:
            if bias is not None:
                raise ValueError("bias/poly/rel are mutually exclusive")
            return attn(q, k, v, scale, None, freqs_cis, 0, None, rel)
        return attn(q, k, v, scale, bias, freqs_cis, 0, None, None)

    return flash


# Sequences longer than this stream KV in tiles with an online softmax
# instead of holding the full [Nq, Nk] logits tile in VMEM.
STREAMING_THRESHOLD = 2048
KV_TILE = 512


def _dense_attn_fits(h: int, n: int, has_bias: bool) -> bool:
    """Whether the dense one-tile kernels fit VMEM at batch block 1:
    the BACKWARD is the stricter direction (~4 concurrent [H, Nq, Nk] f32
    tiles + the bias block); below this both directions take the dense
    kernels, above it both stream (the streaming forward then saves its
    lse for the streaming backward). Hardware-calibrated: N=1025 h=4
    overflows the 16 MB scoped budget with a materialized bias."""
    nq = _round_up(n, 8)
    nk = _round_up(n, LANE)
    tiles = (4 + (1 if has_bias else 0)) * h * nq * nk * 4
    return tiles <= 12 * 1024 * 1024


def _forward(q, k, v, scale, bias, freqs_cis, poly_coeff=None, poly_grid=0,
             rel_table=None, interpret=None, mm_dtype=jnp.bfloat16,
             want_lse=False):
    """want_lse=True: returns (out, lse) for streaming-routed shapes and
    (out, None) for dense ones (the dense backward kernel recomputes its
    softmax from s in VMEM and needs no lse residual)."""
    if interpret is None:
        # Interpret mode off-TPU so the same code path runs in CPU tests
        # (SURVEY.md §4.2).
        interpret = jax.default_backend() != "tpu"
    has_biasish = (bias is not None or poly_coeff is not None
                   or rel_table is not None)
    if (q.shape[2] > STREAMING_THRESHOLD
            or not _dense_attn_fits(q.shape[1], q.shape[2], has_biasish)):
        # Long sequences — or mid-size ones whose dense tiles overflow
        # VMEM (explicit attention_impl=flash below the auto threshold).
        return _forward_streaming(q, k, v, scale, bias, freqs_cis,
                                  poly=(poly_coeff, poly_grid)
                                  if poly_coeff is not None else None,
                                  rel=rel_table,
                                  interpret=interpret, mm_dtype=mm_dtype,
                                  want_lse=want_lse)
    if poly_coeff is not None:
        # Below the streaming threshold the materialized bias is small —
        # generate it and take the dense path.
        bias = _poly_bias_cols(poly_coeff, poly_grid, q.shape[2], 0,
                               q.shape[2], poly_coeff.shape[1] - 1)
    elif rel_table is not None:
        bias = _rel_bias_cols(rel_table, q.shape[2], 0, q.shape[2])
    b, h, n, d = q.shape
    # Asymmetric padding: the KEY axis lives on 128-wide lanes (and is the
    # second matmul's contraction), the QUERY axis on 8-deep sublanes — so
    # pad queries to 8 and keys to 128 instead of padding both to 128
    # (~1.8x less softmax/matmul work at N=65).
    nq = _round_up(n, 8)
    nk = _round_up(n, LANE)
    qp = _pad_seq(q, nq, 2)
    kp = _pad_seq(k, nk, 2)
    vp = _pad_seq(v, nk, 2)

    # Batch-block size: as many items per program as keep the logits tiles
    # comfortably inside VMEM (~4 MB of f32 for p + logits across all heads).
    bb = max(1, min(b, (2 * 1024 * 1024) // (2 * 4 * h * nq * nk)))
    while b % bb:
        bb -= 1

    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, h, nk, d), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_bias = bias is not None
    has_rope = freqs_cis is not None
    if has_bias:
        bias_p = _pad_seq(_pad_seq(bias, nq, 1), nk, 2)
        inputs.append(bias_p)
        in_specs.append(
            pl.BlockSpec((h, nq, nk), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM))
    if has_rope:
        cos_q, sin_q = _prep_freqs(freqs_cis, h, nq, jnp.float32)
        cos_k, sin_k = _prep_freqs(freqs_cis, h, nk, jnp.float32)
        inputs.extend([cos_q, sin_q, cos_k, sin_k])
        in_specs.extend([
            pl.BlockSpec((h, npad, d // 2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM)
            for npad in (nq, nq, nk, nk)
        ])

    kernel = functools.partial(
        _attn_kernel, scale=scale, n_valid=n, has_bias=has_bias,
        has_rope=has_rope, mm_dtype=mm_dtype)

    def kernel_entry(*refs):
        *ins, out_ref = refs
        kernel(*ins, out_ref=out_ref)

    out = pl.pallas_call(
        kernel_entry,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, h, nq, d), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
        interpret=interpret,
    )(*inputs)
    out = out[:, :, :n, :]
    return (out, None) if want_lse else out


# ---------------------------------------------------------------------------
# Streaming-KV flash attention (long sequences): online softmax over KV tiles
# — the [Nq, Nk] logits matrix never exists anywhere, only [Tq, Tkv] tiles
# (SURVEY.md §5.7). Grid is (batch, head, q-tiles, kv-tiles) with kv
# innermost; m/l/acc accumulate in VMEM scratch across kv steps.
# ---------------------------------------------------------------------------

def _stream_kernel(q_ref, k_ref, v_ref, *rest, out_ref, acc_ref, m_ref, l_ref,
                   scale, n_valid, kv_tile, has_bias, has_rope, mm_dtype,
                   poly_grid=0, poly_degree=0, rel_wpad=0,
                   lse_ref=None, offs_ref=None, chunk_valid=None):
    """offs_ref (SMEM [2] int32, optional): GLOBAL (row0, col0) offsets of
    this call's q rows / kv columns — the CP ring passes its shard row
    offset and rotating chunk column so bias generation and the n_valid
    mask act in global coordinates. chunk_valid (static): valid columns
    within this call's kv extent (the chunk tail padded to a kv_tile
    multiple may sit at global indices < n_valid and must still be
    masked)."""
    idx = 0
    bias_ref = cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    coeff_ref = rrow_ref = None
    if has_bias:
        bias_ref = rest[idx]
        idx += 1
    if poly_grid:
        coeff_ref = rest[idx]
        idx += 1
    if rel_wpad:
        rrow_ref = rest[idx]
        idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]
        idx += 4

    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)
    qi = pl.program_id(2)
    n_qt = pl.num_programs(2)
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # [Tq, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [Tkv, D]
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))

    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Tq, Tkv]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if poly_grid:
        s = s + _poly_tile((coeff_ref, pl.program_id(1)),
                           row0 + qi * s.shape[0],
                           col0 + ki * kv_tile, s.shape[0], s.shape[1],
                           poly_grid, poly_degree, n_valid)
    if rel_wpad:
        # The driver pre-framed THIS tile's [1, wpad] aligned window
        # (_rel_fwd_frames, diagonal index map) — the kernel only runs the
        # O(Tq) doubling expansion on it. No O(N)-wide relative resident
        # exists anywhere in the forward.
        s = s + _rel_row_to_tile(rrow_ref[0], s.shape[0], s.shape[1],
                                 rel_wpad)
    col_l = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col0 + col_l < n_valid
    if chunk_valid is not None:
        mask = mask & (col_l < chunk_valid)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[...]  # [Tq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * corr + pv
    m_ref[...] = m_new

    @pl.when(ki == n_kv - 1)
    def _():
        out_ref[0, 0] = (acc_ref[...] / l_ref[...]).astype(out_ref.dtype)
        if lse_ref is not None:
            # Per-row logsumexp, saved for the backward: eliminates the
            # whole jnp lse-recompute pass (which costs as much as the
            # attention forward) AND keeps the backward's p = exp(s - lse)
            # consistent with the kernel's own bias conventions. The
            # [Tq, 1] → [1, Tq] reshape lands the row on the output's LANE
            # axis (see the driver's [B, H, 1, Nq] lse layout).
            lse_ref[0, 0] = (m_ref[...] + jnp.log(l_ref[...])).reshape(1, -1)


def _forward_streaming(q, k, v, scale, bias, freqs_cis, interpret,
                       mm_dtype=jnp.bfloat16, q_tile=512, kv_tile=KV_TILE,
                       poly=None, rel=None, want_lse=False):
    if rel is not None and q_tile > 256:
        # The Toeplitz roll-expansion costs log2(Tq)·Tq·(Tq+Tkv) VPU work
        # per tile — per OUTPUT element that is log2(Tq)·(Tq+Tkv)/Tkv, so a
        # shorter q tile is cheaper: 256×512 → 12 vs 512×512 → 18 ops/elem
        # (measured win on the N=16k relative step; the matmuls stay
        # MXU-shaped at M=256).
        q_tile = 256
    return _forward_streaming_impl(q, k, v, scale, bias, freqs_cis,
                                   interpret, mm_dtype=mm_dtype,
                                   q_tile=q_tile, kv_tile=kv_tile, poly=poly,
                                   rel=rel, want_lse=want_lse)


def _forward_streaming_impl(q, k, v, scale, bias, freqs_cis, interpret,
                            mm_dtype=jnp.bfloat16, q_tile=512,
                            kv_tile=KV_TILE, poly=None, rel=None,
                            want_lse=False):
    """want_lse=True additionally returns the per-row logsumexp [B, H, N]
    (saved by the custom_vjp as a residual — the backward then skips its
    whole lse-recompute pass)."""
    b, h, n, d = q.shape
    q_tile = min(q_tile, _round_up(n, 8))
    nq = _round_up(n, q_tile)
    nk = _round_up(n, kv_tile)
    qp = _pad_seq(q, nq, 2)
    kp = _pad_seq(k, nk, 2)
    vp = _pad_seq(v, nk, 2)
    grid = (b, h, nq // q_tile, nk // kv_tile)

    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_bias = bias is not None
    has_rope = freqs_cis is not None
    poly_grid = poly_degree = 0
    if has_bias:
        bias_p = _pad_seq(_pad_seq(bias, nq, 1), nk, 2)
        inputs.append(bias_p)
        in_specs.append(
            pl.BlockSpec((1, q_tile, kv_tile),
                         lambda bi, hi, qi, ki: (hi, qi, ki),
                         memory_space=pltpu.VMEM))
    if poly is not None:
        coeff_hk, poly_grid = poly
        poly_degree = coeff_hk.shape[1] - 1
        inputs.append(_pad_coeff(coeff_hk))
        # Full-array block: (H, LANE) isn't (8, 128)-tileable per head, and
        # Mosaic requires block dims equal to the array's otherwise.
        in_specs.append(
            pl.BlockSpec((h, LANE), lambda bi, hi, qi, ki: (0, 0),
                         memory_space=pltpu.VMEM))
    rel_wpad = 0
    if rel is not None:
        # Per-TILE pre-framed windows (also validates table coverage with a
        # ValueError — the kernel WRAPS out-of-range indices, the jnp lse
        # twin CLAMPS; a short table must not silently diverge them).
        frames, rel_imap, rel_wpad = _rel_fwd_frames(
            rel, nq // q_tile, nk // kv_tile, q_tile, kv_tile, 0, 0, n)
        inputs.append(frames)
        in_specs.append(pl.BlockSpec((1, 1, rel_wpad), rel_imap,
                                     memory_space=pltpu.VMEM))
    if has_rope:
        cos_q, sin_q = _prep_freqs(freqs_cis, h, nq, jnp.float32,
                                   broadcast=False)
        cos_k, sin_k = _prep_freqs(freqs_cis, h, nk, jnp.float32,
                                   broadcast=False)
        hm = 1 if cos_q.shape[0] > 1 else 0  # head-shared tables ship H=1
        inputs.extend([cos_q, sin_q, cos_k, sin_k])
        in_specs.extend([
            pl.BlockSpec((1, q_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, qi, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ] + [
            pl.BlockSpec((1, kv_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, ki, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ])

    kernel = functools.partial(
        _stream_kernel, scale=scale, n_valid=n, kv_tile=kv_tile,
        has_bias=has_bias, has_rope=has_rope, mm_dtype=mm_dtype,
        poly_grid=poly_grid, poly_degree=poly_degree, rel_wpad=rel_wpad)

    out_specs = [pl.BlockSpec((1, 1, q_tile, d),
                              lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, h, nq, d), q.dtype)]
    if want_lse:
        # lse rides a [B, H, 1, Nq] layout — a [B, H, Nq, 1] output pads
        # its size-1 minor 128× in HBM (2 GB at N=1M); with the row on the
        # LANE axis only the size-1 sublane pads (8×, 134 MB). The block's
        # second-to-last dim equals the array's (1), which Mosaic requires.
        out_specs.append(pl.BlockSpec((1, 1, 1, q_tile),
                                      lambda bi, hi, qi, ki: (bi, hi, 0, qi),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h, 1, nq), jnp.float32))

    scratch_shapes = [
        pltpu.VMEM((q_tile, d), jnp.float32),
        pltpu.VMEM((q_tile, 1), jnp.float32),
        pltpu.VMEM((q_tile, 1), jnp.float32),
    ]

    def kernel_entry(*refs):
        ins = refs[:len(inputs)]
        outs = refs[len(inputs):len(inputs) + len(out_shape)]
        scr = refs[len(inputs) + len(out_shape):]
        acc_ref, m_ref, l_ref = scr[:3]
        kernel(*ins, out_ref=outs[0], acc_ref=acc_ref, m_ref=m_ref,
               l_ref=l_ref, lse_ref=outs[1] if want_lse else None)

    call_kw = {}
    res = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if want_lse else out_specs[0],
        out_shape=out_shape if want_lse else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **call_kw,
    )(*inputs)
    if want_lse:
        out, lse = res
        return out[:, :, :n, :], lse[:, :, 0, :n]
    return res[:, :, :n, :]


# ---------------------------------------------------------------------------
# Chunk drivers for DISTRIBUTED (ring / context-parallel) flash attention:
# the same streaming kernels, invoked on one shard's q rows against ONE
# rotating kv chunk at GLOBAL (row0, col0) offsets (traced scalars via an
# SMEM input — program-id tile coordinates alone can't express the ring's
# global position). The ring in parallel/context_parallel.py merges the
# per-chunk (out, lse) partials with the online-softmax identity and runs
# the backward with the globally-merged lse, which makes each chunk's p
# tiles exactly the global softmax's — the blockwise formulation across
# chips (SURVEY.md §5.7; no reference counterpart).
# ---------------------------------------------------------------------------

def _smem_offs(row0, col0, valid=None):
    """SMEM scalar vector [row0, col0(, valid)]: the global offsets of a
    chunk/segment call, plus (optional, traced) the valid column count
    within the call's kv extent — the segmented sweep's variable last
    segment (static chunk_valid can't express a width that differs per
    fori_loop iteration)."""
    vals = [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
    if valid is not None:
        vals.append(jnp.asarray(valid, jnp.int32))
    spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return jnp.stack(vals), spec


def _chunk_extras(poly, rel, h, n_valid, n_qt, n_kt, q_tile, kv_tile,
                  row0, col0):
    """(extra inputs, per-call specs, kernel kwargs) for the generated-bias
    modes — no dense bias / rope here (the CP ring rotates q/k outside).
    row0/col0 may be traced: the relative frames' alignment roll happens at
    the jnp level (_rel_fwd_frames)."""
    extra, specs, kw = [], [], {}
    if poly is not None:
        coeff_hk, poly_grid = poly
        kw.update(poly_grid=poly_grid, poly_degree=coeff_hk.shape[1] - 1)
        extra.append(_pad_coeff(coeff_hk))
        specs.append((h, LANE))
    if rel is not None:
        frames, imap, wpad = _rel_fwd_frames(
            rel, n_qt, n_kt, q_tile, kv_tile, row0, col0, n_valid)
        kw.update(rel_wpad=wpad)
        extra.append(frames)
        specs.append(((1, 1, wpad), imap))
    return extra, specs, kw


def streaming_chunk_fwd(q, k, v, scale, row0, col0, n_valid, poly=None,
                        rel=None, interpret=None, mm_dtype=jnp.bfloat16,
                        q_tile=512, kv_tile=KV_TILE):
    """Partial flash forward: this shard's q rows [B, H, Nl, D] (global rows
    [row0, row0+Nl)) against ONE kv chunk [B, H, Nc, D] (global columns
    [col0, col0+Nc)); row0/col0 may be traced. Returns (out_c, lse_c):
    out_c normalized WITHIN the chunk, lse_c [B, H, Nl] its logsumexp — the
    pair the ring's online-softmax merge consumes. Bias tiles for the
    poly/rel modes are generated in-kernel at the global coordinates."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rel is not None and q_tile > 256:
        q_tile = 256  # cheaper Toeplitz expansion — see _forward_streaming
    b, h, nl, d = q.shape
    nc = k.shape[2]
    q_tile = min(q_tile, _round_up(nl, 8))
    nq = _round_up(nl, q_tile)
    kv_tile = min(kv_tile, _round_up(nc, LANE))
    nk = _round_up(nc, kv_tile)
    qp, kp, vp = (_pad_seq(x, m, 2) for x, m in ((q, nq), (k, nk), (v, nk)))
    offs, offs_spec = _smem_offs(row0, col0)
    extra, extra_shapes, kw = _chunk_extras(poly, rel, h, n_valid,
                                            nq // q_tile, nk // kv_tile,
                                            q_tile, kv_tile, row0, col0)

    grid = (b, h, nq // q_tile, nk // kv_tile)
    in_specs = [
        pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(s[0], s[1], memory_space=pltpu.VMEM)
         if isinstance(s[0], tuple) else
         pl.BlockSpec(s, lambda bi, hi, qi, ki: (0, 0),
                      memory_space=pltpu.VMEM) for s in extra_shapes] \
      + [offs_spec]

    kernel = functools.partial(
        _stream_kernel, scale=scale, n_valid=n_valid, kv_tile=kv_tile,
        has_bias=False, has_rope=False, mm_dtype=mm_dtype,
        chunk_valid=nc if nc != nk else None, **kw)

    scratch_shapes = [
        pltpu.VMEM((q_tile, d), jnp.float32),
        pltpu.VMEM((q_tile, 1), jnp.float32),
        pltpu.VMEM((q_tile, 1), jnp.float32),
    ]

    def entry(*refs):
        n_in = 3 + len(extra)
        ins = refs[:n_in]
        offs_ref = refs[n_in]
        out_ref, lse_ref = refs[n_in + 1:n_in + 3]
        scr = refs[n_in + 3:]
        acc, m_ref, l_ref = scr[:3]
        kernel(*ins, out_ref=out_ref, acc_ref=acc, m_ref=m_ref, l_ref=l_ref,
               lse_ref=lse_ref, offs_ref=offs_ref)

    call_kw = {}
    out, lse = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_tile),
                         lambda bi, hi, qi, ki: (bi, hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, 1, nq), jnp.float32)],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **call_kw,
    )(qp, kp, vp, *extra, offs)
    return out[:, :, :nl, :], lse[:, :, 0, :nl]


def streaming_chunk_bwd(q, k, v, g, lse, delta, scale, row0, col0, n_valid,
                        poly=None, rel=None, interpret=None,
                        mm_dtype=jnp.bfloat16, q_tile=256, kv_tile=KV_TILE):
    """Partial flash backward for one ring step: gradients of this shard's
    q rows against one kv chunk, with the GLOBALLY-merged lse and delta
    (Σ_d g·out). Returns (dq_partial [B, H, Nl, D] f32 — summed over chunks
    by the ring, dk_chunk, dv_chunk [B, H, Nc, D] f32 — complete for this
    (shard, chunk) pair and ring-accumulated onto the chunk's owner,
    dparam_partial — [H, deg+1] dcoeff / [H, 2L-1] dtable contribution or
    None). One FUSED kernel sweep (_stream_bwd_fused_kernel at global
    offsets) — s/p/ds per tile computed once for all four results."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dq, dk, dv, dcoeff, dtable = _bwd_streaming_fused(
        scale, q, k, v, None, g, lse, delta, interpret,
        mm_dtype=mm_dtype, q_tile=q_tile, kv_tile=kv_tile,
        poly=poly, rel=rel, n_valid=n_valid, row0=row0, col0=col0)
    dparam = dcoeff if dcoeff is not None else dtable
    return dq, dk, dv, dparam


# ---------------------------------------------------------------------------
# Streaming backward (long sequences, SURVEY.md §7 hard-part #3): recompute
# p tiles from saved per-row logsumexp, never materializing [Nq, Nk].
# Standard flash bwd identities, per tile (i = query row, j = key col):
#   D_i   = Σ_d g_id · out_id
#   p_ij  = exp(s_ij − L_i)            s = q·kᵀ·scale (+ bias), L = m + log l
#   dv_j  = Σ_i p_ij g_i
#   ds_ij = p_ij (g_i · v_j − D_i)
#   dq_i  = scale Σ_j ds_ij k_j        dk_j = scale Σ_i ds_ij q_i
# Rotation: dq/dk are gradients w.r.t. ROTATED q/k; the inverse rotation
# (cos, −sin) maps them back. Learnable (rope-mixed) frequencies get their
# (dcos, dsin) from the rotated-space gradients the dq/dkv passes expose
# (_rot_grads_to_dfreqs); a separate batch-innermost pass accumulates dbias.
# ---------------------------------------------------------------------------

def _stream_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                          *rest, dq_ref, acc_ref, scale, n_valid, kv_tile,
                          has_bias, has_rope, mm_dtype, dqr_ref=None,
                          poly_grid=0, poly_degree=0, rel_ell=0, rel_wfull=0,
                          offs_ref=None, chunk_valid=None):
    idx = 0
    bias_ref = cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    coeff_ref = rrow_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if poly_grid:
        coeff_ref = rest[idx]; idx += 1
    if rel_ell:
        rrow_ref = rest[idx]; idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]

    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if poly_grid:
        s = s + _poly_tile((coeff_ref, pl.program_id(1)),
                           row0 + pl.program_id(2) * s.shape[0],
                           col0 + ki * kv_tile, s.shape[0], s.shape[1],
                           poly_grid, poly_degree, n_valid)
    if rel_ell:
        s = s + _rel_tile((rrow_ref, pl.program_id(1)),
                          row0 + pl.program_id(2) * s.shape[0],
                          col0 + ki * kv_tile,
                          s.shape[0], s.shape[1], rel_ell, rel_wfull)
    col_l = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col0 + col_l < n_valid
    if chunk_valid is not None:
        mask = mask & (col_l < chunk_valid)
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])  # lse ref [1,1,Tq,1] -> [Tq,1]
    gv = jax.lax.dot_general(  # g·vᵀ  [Tq, Tkv]
        g_ref[0, 0].astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - delta_ref[0, 0])
    acc_ref[...] += scale * jax.lax.dot_general(
        ds.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv - 1)
    def _():
        out = acc_ref[...]
        if dqr_ref is not None:
            # Gradient w.r.t. the ROTATED q — consumed by the dcos/dsin
            # (learnable rope-mixed frequencies) reduction outside.
            dqr_ref[0, 0] = out.astype(dqr_ref.dtype)
        if has_rope:  # inverse rotation back to unrotated-q space
            out = _rotate(out, cos_q_ref[0].astype(jnp.float32),
                          -sin_q_ref[0].astype(jnp.float32))
        dq_ref[0, 0] = out.astype(dq_ref.dtype)


def _stream_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                           *rest, dk_ref, dv_ref, dk_acc, dv_acc, scale,
                           n_valid, kv_tile, has_bias, has_rope, mm_dtype,
                           dkr_ref=None, poly_grid=0, poly_degree=0,
                           rel_ell=0, rel_wfull=0, offs_ref=None,
                           chunk_valid=None):
    idx = 0
    bias_ref = cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    coeff_ref = rrow_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if poly_grid:
        coeff_ref = rest[idx]; idx += 1
    if rel_ell:
        rrow_ref = rest[idx]; idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]

    qi = pl.program_id(3)  # q tiles innermost here
    n_q = pl.num_programs(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if poly_grid:
        s = s + _poly_tile((coeff_ref, pl.program_id(1)),
                           row0 + qi * s.shape[0], col0 + ki * kv_tile,
                           s.shape[0], s.shape[1], poly_grid, poly_degree,
                           n_valid)
    if rel_ell:
        s = s + _rel_tile((rrow_ref, pl.program_id(1)),
                          row0 + qi * s.shape[0], col0 + ki * kv_tile,
                          s.shape[0], s.shape[1], rel_ell, rel_wfull)
    col_l = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col0 + col_l < n_valid
    if chunk_valid is not None:
        mask = mask & (col_l < chunk_valid)
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])  # lse ref [1,1,Tq,1] -> [Tq,1]
    g = g_ref[0, 0].astype(jnp.float32)
    dv_acc[...] += jax.lax.dot_general(  # pᵀ g  [Tkv, D]
        p.astype(mm_dtype), g.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gv = jax.lax.dot_general(
        g.astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - delta_ref[0, 0])
    dk_acc[...] += scale * jax.lax.dot_general(  # dsᵀ q  [Tkv, D]
        ds.astype(mm_dtype), q.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == n_q - 1)
    def _():
        dk = dk_acc[...]
        if dkr_ref is not None:
            dkr_ref[0, 0] = dk.astype(dkr_ref.dtype)
        if has_rope:
            dk = _rotate(dk, cos_k_ref[0].astype(jnp.float32),
                         -sin_k_ref[0].astype(jnp.float32))
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _stream_bwd_dbias_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                             *rest, dbias_ref, acc_ref, scale, n_valid,
                             kv_tile, has_bias, has_rope, mm_dtype):
    """dbias tile = Σ_batch ds tile, with BATCH as the innermost grid dim so
    the [Tq, Tkv] accumulator lives in VMEM scratch across batch steps. The
    bias gradient therefore streams exactly like the forward — no [B, H, Nq,
    Nk] tensor ever exists (the [H, Nq, Nk] RESULT is the same size as the
    bias input itself). Padded query rows contribute ds = 0 (g and delta are
    zero-padded); padded key columns are masked to p = 0."""
    idx = 0
    bias_ref = cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]

    ki = pl.program_id(2)
    bi = pl.program_id(3)
    n_b = pl.num_programs(3)

    @pl.when(bi == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    col = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])
    gv = jax.lax.dot_general(
        g_ref[0, 0].astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - delta_ref[0, 0])
    acc_ref[...] += ds

    @pl.when(bi == n_b - 1)
    def _():
        dbias_ref[0] = acc_ref[...].astype(dbias_ref.dtype)


def _stream_bwd_dcoeff_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                              coeff_ref, *rest, dcoeff_ref, acc_ref, scale,
                              n_valid, kv_tile, has_rope, mm_dtype,
                              poly_grid, poly_degree, offs_ref=None,
                              chunk_valid=None):
    """Polynomial-coefficient gradient, fully in-kernel:
    dcoeff[h, m] = Σ_{b,i,j} ds[b,h,i,j] · dist(i,j)^m · clsmask(i,j).
    Grid is (h, q-tiles, kv-tiles, BATCH innermost) like the dbias pass, but
    the accumulator is a single [1, LANE] scratch row per head (one lane per
    degree); the output is the full [H, LANE] block (Mosaic block-shape
    rule), revisited across the whole grid, with each head's row added at
    its last step — the [H, N, N] dbias tensor never exists. Padded query
    rows carry ds = 0 (zero-padded g/delta); padded key cols carry p = 0
    (NEG_INF mask)."""
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]

    hi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bi = pl.program_id(3)
    first = (qi == 0) & (ki == 0) & (bi == 0)

    @pl.when(first & (hi == 0))
    def _():
        dcoeff_ref[...] = jnp.zeros_like(dcoeff_ref)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    tq, tk = s.shape
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0
    q_start, k_start = row0 + qi * tq, col0 + ki * kv_tile
    bias, dist, valid = _poly_tile((coeff_ref, hi), q_start, k_start, tq, tk,
                                   poly_grid, poly_degree, n_valid,
                                   with_dist=True)
    s = s + bias
    col_l = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col0 + col_l < n_valid
    if chunk_valid is not None:
        mask = mask & (col_l < chunk_valid)
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])
    gv = jax.lax.dot_general(
        g_ref[0, 0].astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - delta_ref[0, 0])
    ds = jnp.where(valid, ds, 0.0)  # cls row/col and padding carry no dcoeff
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    row = jnp.zeros((1, LANE), jnp.float32)
    pw = jnp.ones((tq, tk), jnp.float32)
    for m in range(poly_degree + 1):
        row = row + jnp.where(lane == m, jnp.sum(ds * pw), 0.0)
        pw = pw * dist
    acc_ref[...] += row

    last = ((qi == pl.num_programs(1) - 1) & (ki == pl.num_programs(2) - 1)
            & (bi == pl.num_programs(3) - 1))

    @pl.when(last)
    def _():
        sel = jax.lax.broadcasted_iota(
            jnp.int32, dcoeff_ref.shape, 0) == hi
        dcoeff_ref[...] += jnp.where(
            sel,
            jnp.broadcast_to(acc_ref[...], dcoeff_ref.shape),
            0.0).astype(dcoeff_ref.dtype)


def _stream_bwd_dtable_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                              rrow_ref, *rest, dtabr_ref, acc_ref, scale,
                              n_valid, kv_tile, has_rope, mm_dtype,
                              rel_ell, rel_wfull, offs_ref=None,
                              chunk_valid=None):
    """Relative-table gradient, fully in-kernel (the Toeplitz transpose):
    each tile's ds rows are bit-unshifted onto the reversed table row and
    accumulated per head in a [1, Wfull] scratch — no [H, N, N] tensor.
    Same grid/accumulation protocol as the dcoeff pass (h, q, kv, batch
    innermost; full-array [H, Wfull] output revisited; caller un-reverses).
    ds is zeroed outside the valid region (padded rows/cols) so junk bias
    values never contribute."""
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]

    hi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bi = pl.program_id(3)
    first = (qi == 0) & (ki == 0) & (bi == 0)

    @pl.when(first & (hi == 0))
    def _():
        dtabr_ref[...] = jnp.zeros_like(dtabr_ref)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    tq, tk = s.shape
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0
    q_start, k_start = row0 + qi * tq, col0 + ki * kv_tile
    s = s + _rel_tile((rrow_ref, hi), q_start, k_start, tq, tk,
                      rel_ell, rel_wfull)
    col_l = ki * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    col = col0 + col_l
    mask = col < n_valid
    if chunk_valid is not None:
        mask = mask & (col_l < chunk_valid)
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0])
    gv = jax.lax.dot_general(
        g_ref[0, 0].astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - delta_ref[0, 0])
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    ds = jnp.where((rows < n_valid) & mask, ds, 0.0)
    acc_ref[...] += _rel_ds_to_dtabr(ds, q_start, k_start, rel_ell,
                                     rel_wfull)

    last = ((qi == pl.num_programs(1) - 1) & (ki == pl.num_programs(2) - 1)
            & (bi == pl.num_programs(3) - 1))

    @pl.when(last)
    def _():
        sel = jax.lax.broadcasted_iota(
            jnp.int32, dtabr_ref.shape, 0) == hi
        dtabr_ref[...] += jnp.where(
            sel, jnp.broadcast_to(acc_ref[...], dtabr_ref.shape),
            0.0).astype(dtabr_ref.dtype)


def _stream_bwd_fused_kernel(q_ref, k_ref, v_ref, ge_ref,
                             *rest, dq_ref, dk_ref, dv_ref, dparam_ref=None,
                             acc_ref=None, rel_tmp=None, rel_sem=None,
                             scale, n_valid, kv_tile, has_rope, mm_dtype,
                             poly_grid=0, poly_degree=0, rel_win=0, rel_qg=0,
                             chunk_valid=None, traced_valid=False):
    """ONE-pass streaming backward (round-3): dq, dk, dv and the PE-parameter
    gradient from a single (b, h, q, kv) sweep — each tile's s/p/ds are
    computed ONCE and feed all four results, where the separate-pass design
    recomputed them 3-4× (for relative the Toeplitz roll-expansion dominated
    every pass: ROADMAP item 6). The trick is output residency: dk/dv out
    blocks are the FULL per-(b, h) [N, D] extent, so they stay in VMEM
    across the whole (q, kv) sweep and accumulate in place — affordable
    because [N, D] is the problem's O(N) memory, not its O(N²) (N=16,385 ×
    d32 = 2 MB/block). dq needs no full-extent residency: its block is
    indexed by qi, which is CONSTANT across the inner ki sweep, so the
    standard revisit-accumulate pattern (zero at ki == 0, += per tile,
    write-back when qi advances) gives dq a [q_tile, D] footprint — the
    VMEM bound is then ~2·N·D (dk+dv), and the driver segments the kv
    extent when even that exceeds the budget.

    Handles none/fixed-rope/poly/rel regimes; dense-bias and learnable-
    frequency modes keep the separate passes (their extra outputs don't fit
    the residency budget).

    Relative mode (round 3, windowed): the driver pre-rolls the reversed
    table row to this call's alignment and pre-slices ONE window per group
    of rel_qg q-tiles (prw_ref, [1, 1, rel_win] via the qi//rel_qg index
    map), so the kernel's relative residents are O(rel_win) — independent
    of both N and the table width. The dtable gradient accumulates in the
    [1, rel_win] acc scratch per (b, h, q-group) and flushes into the
    HBM-resident dparam output (zero-initialized via input/output aliasing)
    with an explicit read-modify-write DMA at each group's last tile. The
    previous design's O(Wfull ≈ 2N) VMEM residents (full pre-rolled row,
    dtable out block, extended accumulator) capped the relative mode at
    N ≈ 262k on a 128 MB-VMEM chip; windows make it N-unbounded.
    """
    idx = 0
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    coeff_ref = prw_ref = offs_ref = None
    if poly_grid:
        coeff_ref = rest[idx]; idx += 1
    if rel_win:
        prw_ref = rest[idx]; idx += 1
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[idx:idx + 4]
        idx += 4
    if idx < len(rest):  # trailing SMEM (row0, col0) offsets — ring chunks
        offs_ref = rest[idx]

    hi = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_qt = pl.num_programs(2)
    first = (qi == 0) & (ki == 0)
    last = ((qi == n_qt - 1) & (ki == pl.num_programs(3) - 1))
    row0 = offs_ref[0] if offs_ref is not None else 0
    col0 = offs_ref[1] if offs_ref is not None else 0

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(first)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)
        if acc_ref is not None and not rel_win:
            acc_ref[...] = jnp.zeros_like(acc_ref)

    if rel_win and acc_ref is not None:
        # The dtable accumulator covers ONE q-group's window; reset at each
        # group's first tile (flushed to HBM at its last — see below).
        @pl.when((ki == 0) & (qi % rel_qg == 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

    if poly_grid and dparam_ref is not None:
        # Poly's [H, LANE] dparam stays a VMEM-resident out block; rel's is
        # HBM (ANY space), zero-initialized by the driver via aliasing.
        @pl.when(first & (pl.program_id(0) == 0) & (hi == 0))
        def _():
            dparam_ref[...] = jnp.zeros_like(dparam_ref)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    if has_rope:
        q = _rotate(q, cos_q_ref[0].astype(jnp.float32),
                    sin_q_ref[0].astype(jnp.float32))
        k = _rotate(k, cos_k_ref[0].astype(jnp.float32),
                    sin_k_ref[0].astype(jnp.float32))
    s = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    tq, tk = s.shape
    # Local coords index the resident output blocks; global coords (ring
    # chunk offsets via offs_ref) drive bias generation and validity.
    lq_start, lk_start = qi * tq, ki * kv_tile
    q_start, k_start = row0 + lq_start, col0 + lk_start
    dist = valid = None
    if poly_grid:
        bias, dist, valid = _poly_tile((coeff_ref, hi), q_start, k_start,
                                       tq, tk, poly_grid, poly_degree,
                                       n_valid, with_dist=True)
        s = s + bias
    rel_off = rel_base = None
    if rel_win:
        # This q-group's window base within the call's extended row; the
        # tile's offset inside the window is the global scratch offset
        # minus the base (bounded by rel_win by the driver's group sizing).
        grp_end = jnp.minimum((qi // rel_qg + 1) * rel_qg, n_qt)
        rel_base = (n_qt - grp_end) * tq
        rel_off = _rel_tile_off(qi, ki, n_qt, tq, kv_tile) - rel_base
        if tq % LANE == 0 and kv_tile % LANE == 0:
            rel_off = pl.multiple_of(rel_off, LANE)
        s = s + _rel_tile_win(prw_ref, rel_off, tq, tk)
    col_l = lk_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    kmask = col0 + col_l < n_valid
    if chunk_valid is not None:
        kmask = kmask & (col_l < chunk_valid)
    if traced_valid:
        # Segmented sweep: valid width of THIS segment (the last one is
        # narrower) arrives traced through the SMEM offsets vector.
        kmask = kmask & (col_l < offs_ref[2])
    s = jnp.where(kmask, s, NEG_INF)
    # g / lse / delta arrive PACKED as one [Tq, D+2] window (lse at lane D,
    # delta at lane D+1): the lanes were free anyway (D < 128 pads to the
    # 128-lane tile), where separate [B, H, N, 1] lse/delta tensors pad
    # 128× in HBM — 2 GB EACH at N=1M — and cost two more input DMAs.
    d_head = q_ref.shape[3]
    ge = ge_ref[0, 0].astype(jnp.float32)  # [Tq, D+2]
    g = ge[:, :d_head]
    p = jnp.exp(s - ge[:, d_head:d_head + 1])
    gv = jax.lax.dot_general(
        g.astype(mm_dtype), v_ref[0, 0].astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (gv - ge[:, d_head + 1:d_head + 2])

    dv_c = jax.lax.dot_general(  # pᵀ g  [Tkv, D]
        p.astype(mm_dtype), g.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_c = scale * jax.lax.dot_general(  # dsᵀ q  [Tkv, D]
        ds.astype(mm_dtype), q.astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_c = scale * jax.lax.dot_general(  # ds k  [Tq, D]
        ds.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if has_rope:
        # Inverse rotation per tile (rotation is linear, so inverse-then-sum
        # equals sum-then-inverse); fixed freqs only here — learnable modes
        # take the separate-pass path for their dqr/dkr outputs.
        dq_c = _rotate(dq_c, cos_q_ref[0].astype(jnp.float32),
                       -sin_q_ref[0].astype(jnp.float32))
        dk_c = _rotate(dk_c, cos_k_ref[0].astype(jnp.float32),
                       -sin_k_ref[0].astype(jnp.float32))
    dq_ref[0, 0] += dq_c
    dk_ref[0, 0, pl.ds(lk_start, tk), :] += dk_c
    dv_ref[0, 0, pl.ds(lk_start, tk), :] += dv_c

    if poly_grid and dparam_ref is not None:
        dsz = jnp.where(valid, ds, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        row = jnp.zeros((1, LANE), jnp.float32)
        pw = jnp.ones((tq, tk), jnp.float32)
        for m in range(poly_degree + 1):
            row = row + jnp.where(lane == m, jnp.sum(dsz * pw), 0.0)
            pw = pw * dist
        acc_ref[...] += row
    if rel_win and dparam_ref is not None:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        dsz = jnp.where((rows < n_valid) & kmask, ds, 0.0)
        _rel_scatter_scr(acc_ref, rel_off, dsz)
        # Group flush: read-modify-write this head's window of the dparam
        # row. Grid steps execute sequentially, so the RMW pairs never
        # race; windows of different (b, h) at the same base accumulate
        # through the out buffer. dparam is [H, 1, Wext] — the head dim
        # must stay a LEADING (untiled) axis: ANY-space buffers small
        # enough for Mosaic to place in VMEM get (sublane, lane) tiling on
        # the last two dims, and a dynamic 1-row slice of a tiled sublane
        # dim does not compile ("slice along dimension 0 must be aligned
        # to tiling").
        @pl.when((ki == pl.num_programs(3) - 1)
                 & ((qi % rel_qg == rel_qg - 1) | (qi == n_qt - 1)))
        def _():
            win = dparam_ref.at[pl.ds(hi, 1), :, pl.ds(rel_base, rel_win)]
            pull = pltpu.make_async_copy(win, rel_tmp, rel_sem)
            pull.start()
            pull.wait()
            rel_tmp[0] += acc_ref[...]
            push = pltpu.make_async_copy(rel_tmp, win, rel_sem)
            push.start()
            push.wait()

    if poly_grid and dparam_ref is not None:
        @pl.when(last)
        def _():
            sel = jax.lax.broadcasted_iota(
                jnp.int32, dparam_ref.shape, 0) == hi
            dparam_ref[...] += jnp.where(
                sel, jnp.broadcast_to(acc_ref[...], dparam_ref.shape),
                0.0).astype(dparam_ref.dtype)


# The fused backward holds per-(b, h) full [N, D] dk/dv blocks plus the
# double-buffered [q_tile, D] dq window and [Tq, Tkv] tile temporaries in
# VMEM; the driver raises Mosaic's scoped-vmem limit to 100 MB (v5e has
# 128 MB physical). When the resident estimate exceeds this budget the
# driver SEGMENTS the kv extent (one fused call per segment at global
# column offsets) instead of falling back — so the fused path engages at
# any N. 64 MB leaves ~35 MB headroom under the raised limit for input
# windows, kernel temporaries, and register spills (the N=65,537 compile
# report shows those at ~5 MB total).
_FUSED_BWD_VMEM_BUDGET = 64 * 1024 * 1024

# VMEM reservation for the relative mode's windowed residents in the fused
# backward: the pre-rolled row window (double-buffered input), the dtable
# accumulator, and the RMW temp — 16 bytes per window entry. 8 MB buys a
# ~500k-entry window: one q-group covers any N ≤ ~470k outright, and larger
# N just adds q-groups (more HBM flushes, same VMEM) — the relative mode's
# kernel residency is O(1) in N, like the other PE modes.
_REL_WIN_BUDGET = 8 * 1024 * 1024


def _fused_kv_seg_cols(d, q_tile, kv_tile, fixed_extra=0):
    """Largest kv extent (kv_tile multiple) whose fused-backward residency
    fits _FUSED_BWD_VMEM_BUDGET. Mosaic double-buffers EVERY window —
    including the constant-index resident outputs — and pads the minor dim
    to the 128-lane register width (the N=65,537 compile report prices each
    full-extent f32[66048, 32] dk/dv window at 64.5 MB = cols × 128 lanes ×
    4 bytes × 2 buffers), so dk+dv cost 16·cols·d_pad bytes and the dq
    window 8·q_tile·d_pad. fixed_extra: bytes of segment-size-independent
    residents (the relative mode's _REL_WIN_BUDGET window reservation,
    which comes out of the dk/dv allowance). Floored at one kv_tile (head
    dims large enough to overshoot even that do not occur in this model
    family)."""
    d_pad = _round_up(d, LANE)
    tile_tmp = 6 * q_tile * kv_tile * 4
    cols = ((_FUSED_BWD_VMEM_BUDGET - fixed_extra - tile_tmp
             - 8 * q_tile * d_pad) // (16 * d_pad))
    return max(kv_tile, cols // kv_tile * kv_tile)


def _bwd_fused_segmented(scale, q, k, v, freqs_cis, g, lse, delta, interpret,
                         mm_dtype, q_tile, kv_tile, poly, rel, n_valid,
                         row0, col0, seg_cols):
    """kv-segmented fused backward: when dk/dv's full-extent residency would
    exceed _FUSED_BWD_VMEM_BUDGET (very long N or large head_dim), sweep the
    kv extent in seg_cols-column segments — one fused-kernel call each at
    global column offsets, the same mechanism the CP ring's chunk backward
    uses. Each (q, kv) tile is still visited exactly once, so per-tile work
    is unchanged; only dq/dparam partial sums and the in-place dk/dv segment
    writes happen at the jnp level (O(N·D) traffic).

    The sweep is a lax.fori_loop, not a Python unroll: XLA's scheduler kept
    every unrolled segment's FULL-EXTENT f32 dq partial (plus per-segment
    temporaries) alive simultaneously — the N=589,825 compile report shows
    ~20 live f32[1, 4, N, 32] buffers ≈ 23 GB padded, 1.7× the whole chip's
    HBM. The loop carries one dq/dk/dv accumulator round-trip buffer each,
    and compiles the kernel ONCE instead of per segment. The variable last
    segment rides a traced valid-width (chunk_cols → SMEM) over kv padded
    to a segment multiple.

    dk/dv carry at the INPUT dtype: each column is written exactly once, so
    a bf16 carry equals the f32 result's final cast — except (a) ring
    chunks, whose partials are summed ACROSS shards and stay f32, and
    (b) fixed-rope, whose dk is inverse-rotated after the loop (a bf16
    carry would double-round; rope keeps f32 carries).

    Fixed-frequency rope is applied OUTSIDE the segment loop — rotate q/k
    once, inverse-rotate dq/dk once — because the kernel's rotation tables
    are indexed from row 0 of the call's kv extent, which would be wrong at
    a segment offset."""
    ring = row0 is not None or col0 is not None
    kv_dt = jnp.float32 if (ring or freqs_cis is not None) else k.dtype
    if freqs_cis is not None:
        cos, sin = freqs_cis
        q, k = reference_attention.rotate_qk_skip_cls(q, k, freqs_cis)
        if mm_dtype != jnp.float32:
            # The kernel multiplies at mm_dtype regardless; storing the
            # rotated operands at mm_dtype halves two full-extent HBM
            # buffers without changing any matmul input bit.
            q, k = q.astype(mm_dtype), k.astype(mm_dtype)
    base = 0 if col0 is None else col0
    nc = k.shape[2]
    nseg = -(-nc // seg_cols)
    ncp = nseg * seg_cols
    kp, vp = _pad_seq(k, ncp, 2), _pad_seq(v, ncp, 2)
    has_poly, has_rel = poly is not None, rel is not None

    def body(i, carry):
        dq, dk, dv, dcoeff, dtable = carry
        s0 = i * seg_cols
        ks = jax.lax.dynamic_slice_in_dim(kp, s0, seg_cols, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(vp, s0, seg_cols, axis=2)
        dq_s, dk_s, dv_s, dc_s, dt_s = _bwd_streaming_fused(
            scale, q, ks, vs, None, g, lse, delta, interpret,
            mm_dtype=mm_dtype, q_tile=q_tile, kv_tile=kv_tile, poly=poly,
            rel=rel, n_valid=n_valid, row0=row0, col0=base + s0,
            chunk_cols=jnp.minimum(nc - s0, seg_cols))
        dq = dq + dq_s
        dk = jax.lax.dynamic_update_slice_in_dim(
            dk, dk_s.astype(kv_dt), s0, axis=2)
        dv = jax.lax.dynamic_update_slice_in_dim(
            dv, dv_s.astype(kv_dt), s0, axis=2)
        if has_poly:
            dcoeff = dcoeff + dc_s
        if has_rel:
            dtable = dtable + dt_s
        return dq, dk, dv, dcoeff, dtable

    carry0 = (jnp.zeros(q.shape, jnp.float32),
              jnp.zeros(kp.shape, kv_dt), jnp.zeros(vp.shape, kv_dt),
              jnp.zeros(poly[0].shape, jnp.float32) if has_poly
              else jnp.zeros((), jnp.float32),
              jnp.zeros(rel.shape, jnp.float32) if has_rel
              else jnp.zeros((), jnp.float32))
    dq, dk, dv, dcoeff, dtable = jax.lax.fori_loop(0, nseg, body, carry0)
    dk, dv = dk[:, :, :nc], dv[:, :, :nc]
    if freqs_cis is not None:
        # Gradients w.r.t. the unrotated q/k: R(θ)ᵀ = R(−θ), i.e. rotate
        # with (cos, −sin) — the same inverse the unsegmented kernel applies
        # per tile.
        dq, dk = reference_attention.rotate_qk_skip_cls(dq, dk, (cos, -sin))
    return (dq, dk, dv, dcoeff if has_poly else None,
            dtable if has_rel else None)


def _bwd_streaming_fused(scale, q, k, v, freqs_cis, g, lse, delta, interpret,
                         mm_dtype=jnp.bfloat16, q_tile=256, kv_tile=KV_TILE,
                         poly=None, rel=None, n_valid=None, row0=None,
                         col0=None, chunk_cols=None):
    """Driver for _stream_bwd_fused_kernel. Returns (dq, dk, dv, dcoeff,
    dtable) — f32 grads cast by the caller. Pre-conditions (enforced by
    _bwd's dispatch): no dense bias, no learnable frequencies. VMEM is
    self-bounded: oversized kv extents are swept in segments
    (_bwd_fused_segmented).

    row0/col0 (traced, optional): GLOBAL offsets of the q rows / kv columns
    — the CP ring's per-chunk call (streaming_chunk_bwd): k/v are then one
    chunk (length ≠ q's), n_valid the global token count, and the returned
    dq/dk/dv are this (shard, chunk) pair's partials."""
    b, h, n, d = q.shape
    nc = k.shape[2]
    if n_valid is None:
        n_valid = n
    # The relative mode's VMEM residents are WINDOWS now (pre-rolled row
    # slice + accumulator + RMW temp, 16 bytes per entry total) — a fixed
    # reservation independent of N and of the table width.
    seg_cols = _fused_kv_seg_cols(d, min(q_tile, _round_up(n, 8)),
                                  min(kv_tile, _round_up(nc, LANE)),
                                  fixed_extra=_REL_WIN_BUDGET
                                  if rel is not None else 0)
    if _round_up(nc, kv_tile) > seg_cols:
        return _bwd_fused_segmented(
            scale, q, k, v, freqs_cis, g, lse, delta, interpret, mm_dtype,
            q_tile, kv_tile, poly, rel, n_valid, row0, col0, seg_cols)
    poly_grid = poly_degree = 0
    extra, extra_shapes = [], []
    if poly is not None:
        coeff_hk, poly_grid = poly
        poly_degree = coeff_hk.shape[1] - 1
        extra.append(_pad_coeff(coeff_hk))
        extra_shapes.append((h, LANE))
    if rel is not None:
        rrow, rel_ell, rel_wfull = _rel_prep(rel)
        if n_valid > rel_ell:
            raise ValueError(
                f"relative table covers L={rel_ell} tokens < sequence "
                f"{n_valid}")

    q_tile = min(q_tile, _round_up(n, 8))
    nq = _round_up(n, q_tile)
    kv_tile = min(kv_tile, _round_up(nc, LANE))
    nk = _round_up(nc, kv_tile)
    chunk_valid = nc if nc != nk else None
    rel_win = rel_qg = 0
    rel_a0 = rel_wext = None
    if rel is not None:
        # Pre-roll the reversed table row to this call's alignment (the
        # in-kernel _rel_scr_init, hoisted to jnp where a dynamic roll is
        # cheap HBM work) and pre-slice one window per group of rel_qg
        # q-tiles: prw[h, g] = ext[h, base(g) : base(g)+W], base(g) =
        # (n_qt − group_end(g))·q_tile — exactly the span of scratch
        # offsets group g's tiles read. Window entries cost 16 bytes of
        # VMEM each (double-buffered input + accumulator + RMW temp), so
        # _REL_WIN_BUDGET bounds W; the q-group count absorbs any N.
        n_qt, n_kt = nq // q_tile, nk // kv_tile
        wpad = _round_up(q_tile + kv_tile - 1, LANE)
        c_ext = (n_kt - 1) * kv_tile + wpad
        rel_qg = max(1, min(n_qt, (_REL_WIN_BUDGET // 16 - c_ext) // q_tile))
        rel_win = _round_up((rel_qg - 1) * q_tile + c_ext, LANE)
        n_qg = -(-n_qt // rel_qg)
        rel_a0 = _rel_scr_align(0 if row0 is None else row0,
                                0 if col0 is None else col0,
                                n_qt, q_tile, rel_ell, rel_wfull)
        bases = [(n_qt - min((g + 1) * rel_qg, n_qt)) * q_tile
                 for g in range(n_qg)]
        rel_wext = _round_up(bases[0] + rel_win, LANE)
        rolled = jnp.roll(rrow, -(rel_a0 % rel_wfull), axis=1)
        reps = -(-rel_wext // rel_wfull)
        ext = jnp.concatenate([rolled] * reps, axis=1)[:, :rel_wext] \
            if reps > 1 else rolled[:, :rel_wext]
        prw = jnp.stack([ext[:, b0:b0 + rel_win] for b0 in bases], axis=1)
        # Head and group ride ONE leading untiled axis ([H*G, 1, W]): with
        # them separate ([H, G, W]), the (1, 1, W) block's second-to-last
        # dim would be a size-1 slice of a G>1 axis — which Mosaic rejects
        # (last two block dims must divide (8, 128) or equal the array's).
        extra.append(prw.reshape(h * n_qg, 1, rel_win))
        extra_shapes.append(((1, 1, rel_win),
                             lambda bi, hi, qi, ki, rq=rel_qg, ng=n_qg:
                             (hi * ng + qi // rq, 0, 0)))
    qp, kp, vp = (_pad_seq(x, m, 2) for x, m in ((q, nq), (k, nk), (v, nk)))
    # Pack g + lse + delta into ONE [B, H, nq, D+2] f32 tensor (lse at lane
    # D, delta at D+1): the packed lanes ride g's padding-to-128 for free,
    # where separate [B, H, nq, 1] tensors each pad 128× in HBM (2 GB at
    # N=1M) and cost their own input windows + DMAs. f32 throughout — lse
    # enters exp() and delta a cancellation-prone subtraction.
    gext = jnp.concatenate(
        [g.astype(jnp.float32), lse[..., None], delta[..., None]], axis=-1)
    gp = _pad_seq(gext, nq, 2)
    inputs = [qp, kp, vp, gp]

    imap_q = lambda bi, hi, qi, ki: (bi, hi, qi, 0)       # noqa: E731
    imap_kv = lambda bi, hi, qi, ki: (bi, hi, ki, 0)      # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, q_tile, d), imap_q, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), imap_kv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d), imap_kv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, q_tile, d + 2), imap_q, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(sh[0], sh[1], memory_space=pltpu.VMEM)
         if isinstance(sh[0], tuple) else
         pl.BlockSpec(sh, lambda bi, hi, qi, ki: (0, 0),
                      memory_space=pltpu.VMEM) for sh in extra_shapes]
    has_rope = freqs_cis is not None
    if has_rope:
        cos_q, sin_q = _prep_freqs(freqs_cis, h, nq, jnp.float32,
                                   broadcast=False)
        cos_k, sin_k = _prep_freqs(freqs_cis, h, nk, jnp.float32,
                                   broadcast=False)
        hm = 1 if cos_q.shape[0] > 1 else 0
        inputs.extend([cos_q, sin_q, cos_k, sin_k])
        in_specs.extend([
            pl.BlockSpec((1, q_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_tile, d // 2),
                         lambda bi, hi, qi, ki: (hi * hm, ki, 0),
                         memory_space=pltpu.VMEM),
        ])
    kernel = functools.partial(
        _stream_bwd_fused_kernel, scale=scale, n_valid=n_valid,
        kv_tile=kv_tile, has_rope=has_rope, mm_dtype=mm_dtype,
        poly_grid=poly_grid, poly_degree=poly_degree,
        rel_win=rel_win, rel_qg=rel_qg, chunk_valid=chunk_valid,
        traced_valid=chunk_cols is not None)

    # dk/dv out blocks are the full per-(b, h) extent — resident across
    # the (q, kv) sweep, accumulated in place. dq's block is per q-tile:
    # its index is constant across the inner ki sweep (revisit-accumulate),
    # so only [q_tile, d] of it is ever resident.
    out_specs = [
        pl.BlockSpec((1, 1, q_tile, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi, ki: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi, ki: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, nq, d), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32)]
    scratch = []
    want_param = poly is not None or rel is not None
    if poly is not None:
        out_specs.append(pl.BlockSpec(
            (h, LANE), lambda bi, hi, qi, ki: (0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((h, LANE), jnp.float32))
        scratch.append(pltpu.VMEM((1, LANE), jnp.float32))
    if rel is not None:
        # dtable accumulates out of kernel residency (ANY space): the
        # kernel RMW-DMAs one [1, 1, rel_win] window per (b, h, q-group);
        # zero-initialized via input/output aliasing of a zeros tensor
        # appended as the LAST input below. Shape [H, 1, Wext]: the head
        # dim must be a leading UNTILED axis — see the kernel's flush.
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((h, 1, rel_wext), jnp.float32))
        scratch.append(pltpu.VMEM((1, rel_win), jnp.float32))       # acc
        scratch.append(pltpu.VMEM((1, 1, rel_win), jnp.float32))    # RMW tmp
        scratch.append(pltpu.SemaphoreType.DMA)

    n_extra_specs = len(extra_shapes)
    rope_inputs = 4 if has_rope else 0
    offs_inputs = []
    if row0 is not None or col0 is not None or chunk_cols is not None:
        offs, offs_spec = _smem_offs(0 if row0 is None else row0,
                                     0 if col0 is None else col0,
                                     chunk_cols)
        offs_inputs = [offs]
        in_specs.append(offs_spec)

    n_alias = 1 if rel is not None else 0

    def entry(*refs):
        n_in = 4 + n_extra_specs + rope_inputs + len(offs_inputs) + n_alias
        ins = refs[:n_in - n_alias]  # the aliased zeros ref is write-only
        outs = refs[n_in:n_in + len(out_shape)]
        scr = refs[n_in + len(out_shape):]
        kw = {}
        if want_param:
            kw["dparam_ref"] = outs[3]
            kw["acc_ref"] = scr[0]
        if rel is not None:
            kw["rel_tmp"] = scr[1]
            kw["rel_sem"] = scr[2]
        kernel(*ins, dq_ref=outs[0], dk_ref=outs[1], dv_ref=outs[2], **kw)

    # Input order must match the kernel's *rest unpacking (and the spec
    # list built above): 4 common (q, k, v, packed g+lse+delta), then
    # extras (coeff / prw), then the rope tables, the SMEM offsets, and
    # (rel only) the aliased dtable zeros last.
    all_inputs = inputs[:4] + extra + inputs[4:] + offs_inputs
    call_kw = {}
    if rel is not None:
        all_inputs.append(jnp.zeros((h, 1, rel_wext), jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        call_kw["input_output_aliases"] = {len(all_inputs) - 1: 3}
    if not interpret:
        # The resident [N, D] out blocks + tile temporaries exceed the
        # compiler's default 16 MB scoped-vmem budget at long N; raise it
        # (v5e VMEM accommodates this — the driver's _FUSED_BWD_VMEM_BUDGET
        # bounds the resident blocks well below the physical limit).
        call_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    res = pl.pallas_call(
        entry,
        grid=(b, h, nq // q_tile, nk // kv_tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **call_kw,
    )(*all_inputs)
    dq, dk, dv = res[0][:, :, :n, :], res[1][:, :, :nc, :], \
        res[2][:, :, :nc, :]
    dcoeff = dtable = None
    if poly is not None:
        dcoeff = res[3][:, :poly_degree + 1]
    elif rel is not None:
        # Adjoint of the extended-row construction: fold the Wext extent
        # back modulo Wfull, undo the alignment roll, un-reverse.
        dp = res[3][:, 0]
        reps = -(-rel_wext // rel_wfull)
        if reps * rel_wfull > rel_wext:
            dp = jnp.pad(dp, ((0, 0), (0, reps * rel_wfull - rel_wext)))
        folded = dp[:, :rel_wfull]
        for r in range(1, reps):
            folded = folded + dp[:, r * rel_wfull:(r + 1) * rel_wfull]
        row = jnp.roll(folded, rel_a0 % rel_wfull, axis=1)
        dtable = row[:, ::-1][:, :rel.shape[1]]
    return dq, dk, dv, dcoeff, dtable


def _streaming_lse(q, k, scale, bias, freqs_cis, n, poly=None, rel=None):
    """Per-row logsumexp recomputed with the streaming forward structure (in
    plain jnp over kv chunks — small [Tq] state, no N×N materialization).
    poly=(coeff_hk, grid): the chunk's bias columns are generated on the fly
    (_poly_bias_cols) instead of sliced from a materialized tensor."""
    b, h, nq, d = q.shape
    if freqs_cis is not None:
        q, k = reference_attention.rotate_qk_skip_cls(q, k, freqs_cis)
    m = jnp.full((b, h, nq), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, nq), jnp.float32)
    nk = k.shape[2]
    for start in range(0, nk, KV_TILE):
        kt = k[:, :, start:start + KV_TILE]
        s = jnp.einsum("bhnd,bhmd->bhnm", q, kt,
                       preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias[None, :, :, start:start + KV_TILE]
        if poly is not None:
            coeff_hk, grid = poly
            s = s + _poly_bias_cols(coeff_hk, grid, nq, start, kt.shape[2],
                                    coeff_hk.shape[1] - 1)[None]
        if rel is not None:
            s = s + _rel_bias_cols(rel, nq, start, kt.shape[2])[None]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[..., None]), axis=-1)
        m = m_new
    return m + jnp.log(l)


def _bwd_streaming(scale, q, k, v, bias, freqs_cis, out, g, interpret,
                   mm_dtype=jnp.bfloat16, q_tile=512, kv_tile=KV_TILE,
                   want_dbias=False, want_dfreqs=False, poly=None, rel=None,
                   lse=None):
    """Tiled streaming backward. Returns (dq, dk, dv, dbias, dfreqs[,
    dcoeff]): dbias [H, N, N] when want_dbias (batch-accumulated in-kernel —
    same size as the bias input, nothing bigger materializes); dfreqs
    (dcos, dsin) matching the input freqs_cis when want_dfreqs (learnable
    rope-mixed), reduced from the rotated-space q/k gradients outside the
    kernels. poly=(coeff_hk, grid): bias tiles are GENERATED in-kernel in
    every pass and a 6th return value dcoeff [H, deg+1] is appended
    (in-kernel accumulated — no [H, N, N] tensor in either direction)."""
    b, h, n, d = q.shape
    if lse is None:
        # Fallback for direct callers (tests): recompute the per-row
        # logsumexp. The custom_vjp path passes the forward-saved lse,
        # skipping this pass (it costs as much as the attention forward).
        lse = _streaming_lse(q, k, scale, bias, freqs_cis, n, poly=poly,
                             rel=rel)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    poly_grid = poly_degree = 0
    if poly is not None:
        poly_grid = poly[1]
        poly_degree = poly[0].shape[1] - 1
    rel_ell = rel_wfull = 0
    rrow = None
    if rel is not None:
        rrow, rel_ell, rel_wfull = _rel_prep(rel)
        if n > rel_ell:  # see _forward_streaming: wrap-vs-clamp disagreement
            raise ValueError(
                f"relative table covers L={rel_ell} tokens < sequence {n}")

    q_tile = min(q_tile, _round_up(n, 8))
    nq = _round_up(n, q_tile)
    nk = _round_up(n, kv_tile)
    qp, kp, vp = (_pad_seq(x, m, 2) for x, m in ((q, nq), (k, nk), (v, nk)))
    gp = _pad_seq(g, nq, 2)
    # Trailing singleton dim: Mosaic requires the last two BLOCK dims to be
    # (8k, 128k) or equal to the array dims — a [B, H, nq] array with block
    # (1, 1, q_tile) violates that (dim -2 is 1 != H); [B, H, nq, 1] with
    # block (1, 1, q_tile, 1) is legal. (Interpret mode does not check this;
    # caught by the first real-TPU compile.)
    lse_p = _pad_seq(lse, nq, 2)[..., None]
    delta_p = _pad_seq(delta, nq, 2)[..., None]

    common_inputs = [qp, kp, vp, gp, lse_p, delta_p]
    has_bias = bias is not None
    has_rope = freqs_cis is not None
    extra, extra_specs_q, extra_specs_kv = [], [], []
    if has_bias:
        bias_p = _pad_seq(_pad_seq(bias, nq, 1), nk, 2)
        extra.append(bias_p)
        extra_specs_q.append(pl.BlockSpec(
            (1, q_tile, kv_tile), lambda bi, hi, qi, ki: (hi, qi, ki),
            memory_space=pltpu.VMEM))
        extra_specs_kv.append(pl.BlockSpec(
            (1, q_tile, kv_tile), lambda bi, hi, ki, qi: (hi, qi, ki),
            memory_space=pltpu.VMEM))
    if poly is not None:
        extra.append(_pad_coeff(poly[0]))
        extra_specs_q.append(pl.BlockSpec(
            (h, LANE), lambda bi, hi, qi, ki: (0, 0),
            memory_space=pltpu.VMEM))
        extra_specs_kv.append(pl.BlockSpec(
            (h, LANE), lambda bi, hi, ki, qi: (0, 0),
            memory_space=pltpu.VMEM))
    if rel is not None:
        extra.append(rrow)
        extra_specs_q.append(pl.BlockSpec(
            (h, rel_wfull), lambda bi, hi, qi, ki: (0, 0),
            memory_space=pltpu.VMEM))
        extra_specs_kv.append(pl.BlockSpec(
            (h, rel_wfull), lambda bi, hi, ki, qi: (0, 0),
            memory_space=pltpu.VMEM))
    if has_rope:
        cos_q, sin_q = _prep_freqs(freqs_cis, h, nq, jnp.float32,
                                   broadcast=False)
        cos_k, sin_k = _prep_freqs(freqs_cis, h, nk, jnp.float32,
                                   broadcast=False)
        hm = 1 if cos_q.shape[0] > 1 else 0
        extra.extend([cos_q, sin_q, cos_k, sin_k])
        for spec_list, order in ((extra_specs_q, "q"), (extra_specs_kv, "kv")):
            if order == "q":
                qmap = lambda bi, hi, qi, ki: (hi * hm, qi, 0)   # noqa: E731
                kmap = lambda bi, hi, qi, ki: (hi * hm, ki, 0)   # noqa: E731
            else:
                qmap = lambda bi, hi, ki, qi: (hi * hm, qi, 0)   # noqa: E731
                kmap = lambda bi, hi, ki, qi: (hi * hm, ki, 0)   # noqa: E731
            spec_list.extend([
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
            ])

    def q_major():  # block index maps for (b, h, q, kv) grids
        return [
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ]

    def bh_inner():  # (h, q, kv, BATCH-innermost) grids: dbias/dcoeff passes
        return [
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda hi, qi, ki, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda hi, qi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda hi, qi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda hi, qi, ki, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda hi, qi, ki, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda hi, qi, ki, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ]

    def kv_major():  # (b, h, kv, q) grids
        return [
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_tile, d),
                         lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, d),
                         lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 1),
                         lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ]

    dq_kernel = functools.partial(
        _stream_bwd_dq_kernel, scale=scale, n_valid=n, kv_tile=kv_tile,
        has_bias=has_bias, has_rope=has_rope, mm_dtype=mm_dtype,
        poly_grid=poly_grid, poly_degree=poly_degree,
        rel_ell=rel_ell, rel_wfull=rel_wfull)
    dq_out_specs = [pl.BlockSpec((1, 1, q_tile, d),
                                 lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                                 memory_space=pltpu.VMEM)]
    dq_out_shape = [jax.ShapeDtypeStruct((b, h, nq, d), q.dtype)]
    if want_dfreqs:
        dq_out_specs.append(dq_out_specs[0])
        dq_out_shape.append(jax.ShapeDtypeStruct((b, h, nq, d), jnp.float32))

    def dq_entry(*refs):
        n_in = len(common_inputs) + len(extra)
        ins = refs[:n_in]
        outs = refs[n_in:n_in + len(dq_out_shape)]
        acc = refs[n_in + len(dq_out_shape)]
        dq_kernel(*ins, dq_ref=outs[0], acc_ref=acc,
                  dqr_ref=outs[1] if want_dfreqs else None)

    dq_res = pl.pallas_call(
        dq_entry,
        grid=(b, h, nq // q_tile, nk // kv_tile),
        in_specs=q_major() + extra_specs_q,
        out_specs=dq_out_specs if want_dfreqs else dq_out_specs[0],
        out_shape=dq_out_shape if want_dfreqs else dq_out_shape[0],
        scratch_shapes=[pltpu.VMEM((q_tile, d), jnp.float32)],
        interpret=interpret,
    )(*common_inputs, *extra)
    if want_dfreqs:
        dq, dqr = dq_res
    else:
        dq, dqr = dq_res, None
    dq = dq[:, :, :n, :]

    dkv_kernel = functools.partial(
        _stream_bwd_dkv_kernel, scale=scale, n_valid=n, kv_tile=kv_tile,
        has_bias=has_bias, has_rope=has_rope, mm_dtype=mm_dtype,
        poly_grid=poly_grid, poly_degree=poly_degree,
        rel_ell=rel_ell, rel_wfull=rel_wfull)
    dkv_out_specs = [
        pl.BlockSpec((1, 1, kv_tile, d),
                     lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_tile, d),
                     lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    dkv_out_shape = [jax.ShapeDtypeStruct((b, h, nk, d), q.dtype),
                     jax.ShapeDtypeStruct((b, h, nk, d), q.dtype)]
    if want_dfreqs:
        dkv_out_specs.append(dkv_out_specs[0])
        dkv_out_shape.append(jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32))

    def dkv_entry(*refs):
        n_in = len(common_inputs) + len(extra)
        ins = refs[:n_in]
        outs = refs[n_in:n_in + len(dkv_out_shape)]
        dk_acc, dv_acc = refs[n_in + len(dkv_out_shape):]
        dkv_kernel(*ins, dk_ref=outs[0], dv_ref=outs[1], dk_acc=dk_acc,
                   dv_acc=dv_acc, dkr_ref=outs[2] if want_dfreqs else None)

    dkv_res = pl.pallas_call(
        dkv_entry,
        grid=(b, h, nk // kv_tile, nq // q_tile),
        in_specs=kv_major() + extra_specs_kv,
        out_specs=dkv_out_specs,
        out_shape=dkv_out_shape,
        scratch_shapes=[pltpu.VMEM((kv_tile, d), jnp.float32),
                        pltpu.VMEM((kv_tile, d), jnp.float32)],
        interpret=interpret,
    )(*common_inputs, *extra)
    if want_dfreqs:
        dk, dv, dkr = dkv_res
    else:
        dk, dv = dkv_res
        dkr = None

    dbias = None
    if want_dbias:
        dbias_kernel = functools.partial(
            _stream_bwd_dbias_kernel, scale=scale, n_valid=n,
            kv_tile=kv_tile, has_bias=has_bias, has_rope=has_rope,
            mm_dtype=mm_dtype)
        # grid (h, q-tiles, kv-tiles, BATCH innermost).
        db_common_specs = bh_inner()
        db_extra_specs = []
        if has_bias:
            db_extra_specs.append(pl.BlockSpec(
                (1, q_tile, kv_tile), lambda hi, qi, ki, bi: (hi, qi, ki),
                memory_space=pltpu.VMEM))
        if has_rope:
            qmap = lambda hi, qi, ki, bi: (hi, qi, 0)   # noqa: E731
            kmap = lambda hi, qi, ki, bi: (hi, ki, 0)   # noqa: E731
            db_extra_specs.extend([
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
            ])

        def dbias_entry(*refs):
            n_in = len(common_inputs) + len(extra)
            ins, out_ref, acc = refs[:n_in], refs[n_in], refs[n_in + 1]
            dbias_kernel(*ins, dbias_ref=out_ref, acc_ref=acc)

        dbias = pl.pallas_call(
            dbias_entry,
            grid=(h, nq // q_tile, nk // kv_tile, b),
            in_specs=db_common_specs + db_extra_specs,
            out_specs=pl.BlockSpec((1, q_tile, kv_tile),
                                   lambda hi, qi, ki, bi: (hi, qi, ki),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, nq, nk), bias.dtype),
            scratch_shapes=[pltpu.VMEM((q_tile, kv_tile), jnp.float32)],
            interpret=interpret,
        )(*common_inputs, *extra)[:, :n, :n]

    dcoeff = None
    if poly is not None:
        dcoeff_kernel = functools.partial(
            _stream_bwd_dcoeff_kernel, scale=scale, n_valid=n,
            kv_tile=kv_tile, has_rope=has_rope, mm_dtype=mm_dtype,
            poly_grid=poly_grid, poly_degree=poly_degree)
        # grid (h, q-tiles, kv-tiles, BATCH innermost) — same spec family
        # as the dbias pass.
        dc_common_specs = bh_inner()
        dc_extra_specs = [pl.BlockSpec((h, LANE),
                                       lambda hi, qi, ki, bi: (0, 0),
                                       memory_space=pltpu.VMEM)]
        if has_rope:
            qmap = lambda hi, qi, ki, bi: (hi, qi, 0)   # noqa: E731
            kmap = lambda hi, qi, ki, bi: (hi, ki, 0)   # noqa: E731
            dc_extra_specs.extend([
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
            ])

        def dcoeff_entry(*refs):
            n_in = len(common_inputs) + len(extra)
            ins, out_ref, acc = refs[:n_in], refs[n_in], refs[n_in + 1]
            dcoeff_kernel(*ins, dcoeff_ref=out_ref, acc_ref=acc)

        dcoeff = pl.pallas_call(
            dcoeff_entry,
            grid=(h, nq // q_tile, nk // kv_tile, b),
            in_specs=dc_common_specs + dc_extra_specs,
            out_specs=pl.BlockSpec((h, LANE), lambda hi, qi, ki, bi: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, LANE), jnp.float32)],
            interpret=interpret,
        )(*common_inputs, *extra)[:, :poly_degree + 1]

    dtable = None
    if rel is not None:
        dtable_kernel = functools.partial(
            _stream_bwd_dtable_kernel, scale=scale, n_valid=n,
            kv_tile=kv_tile, has_rope=has_rope, mm_dtype=mm_dtype,
            rel_ell=rel_ell, rel_wfull=rel_wfull)
        dt_extra_specs = [pl.BlockSpec((h, rel_wfull),
                                       lambda hi, qi, ki, bi: (0, 0),
                                       memory_space=pltpu.VMEM)]
        if has_rope:
            qmap = lambda hi, qi, ki, bi: (hi, qi, 0)   # noqa: E731
            kmap = lambda hi, qi, ki, bi: (hi, ki, 0)   # noqa: E731
            dt_extra_specs.extend([
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_tile, d // 2), qmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_tile, d // 2), kmap,
                             memory_space=pltpu.VMEM),
            ])

        def dtable_entry(*refs):
            n_in = len(common_inputs) + len(extra)
            ins, out_ref, acc = refs[:n_in], refs[n_in], refs[n_in + 1]
            dtable_kernel(*ins, dtabr_ref=out_ref, acc_ref=acc)

        dtabr = pl.pallas_call(
            dtable_entry,
            grid=(h, nq // q_tile, nk // kv_tile, b),
            in_specs=bh_inner() + dt_extra_specs,
            out_specs=pl.BlockSpec((h, rel_wfull),
                                   lambda hi, qi, ki, bi: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, rel_wfull), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, rel_wfull), jnp.float32)],
            interpret=interpret,
        )(*common_inputs, *extra)
        # rrow coordinates -> table coordinates: un-reverse, drop lane pad.
        dtable = dtabr[:, ::-1][:, :rel.shape[1]].astype(rel.dtype)

    dfreqs = None
    if want_dfreqs:
        dfreqs = _rot_grads_to_dfreqs(qp, kp, dqr, dkr, freqs_cis)
    return (dq, dk[:, :, :n, :], dv[:, :, :n, :], dbias, dfreqs, dcoeff,
            dtable)


def _rot_grads_to_dfreqs(qp, kp, dqr, dkr, freqs_cis):
    """(dcos, dsin) for learnable per-head frequencies from rotated-space
    gradients. With r = [x1·cos − x2·sin, x1·sin + x2·cos] and g = ∂L/∂r:
      ∂L/∂cos = g1·x1 + g2·x2,   ∂L/∂sin = −g1·x2 + g2·x1,
    summed over batch, for both the q and k sides. Elementwise over
    [B, H, N, D] — no attention-matrix materialization. Rows are then
    sliced back to the caller's patch-token layout (identity cls row and
    padding rows carry no learnable dependence)."""
    def side(x, gr):
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        g1, g2 = gr[..., :d2].astype(jnp.float32), gr[..., d2:].astype(jnp.float32)
        dcos = jnp.sum(g1 * x1 + g2 * x2, axis=0)    # [H, Np, D/2]
        dsin = jnp.sum(-g1 * x2 + g2 * x1, axis=0)
        return dcos, dsin

    dcos_q, dsin_q = side(qp.astype(jnp.float32), dqr)
    dcos_k, dsin_k = side(kp.astype(jnp.float32), dkr)
    s = freqs_cis[0].shape[-2]  # patch-token rows in the caller's layout
    dcos = dcos_q[:, 1:1 + s] + dcos_k[:, 1:1 + s]
    dsin = dsin_q[:, 1:1 + s] + dsin_k[:, 1:1 + s]
    if freqs_cis[0].ndim == 2:  # shared across heads (axial layout)
        dcos, dsin = dcos.sum(0), dsin.sum(0)
    return (dcos.astype(freqs_cis[0].dtype), dsin.astype(freqs_cis[1].dtype))


def _bwd(scale, poly_grid, residuals, g, mm_dtype=jnp.bfloat16):
    q, k, v, bias, freqs_cis, poly_coeff, rel_table, out, lse = residuals
    n = q.shape[2]
    learnable_freqs = freqs_cis is not None and freqs_cis[0].ndim == 3
    interpret = jax.default_backend() != "tpu"
    has_biasish = (bias is not None or poly_coeff is not None
                   or rel_table is not None)
    if (n > STREAMING_THRESHOLD
            or not _dense_attn_fits(q.shape[1], n, has_biasish)):
        # VMEM is bounded inside the fused driver (per-q-tile dq residency +
        # kv segmentation), so the fused path engages at ANY N for the modes
        # it supports.
        use_fused = (bias is None and not learnable_freqs
                     and lse is not None)
        poly = (poly_coeff, poly_grid) if poly_coeff is not None else None
        if use_fused:
            # ONE-pass backward: s/p/ds per tile computed once for all of
            # dq/dk/dv/dparam (the separate passes recompute them 3-4×; for
            # relative the Toeplitz expansion dominated every pass).
            delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                            axis=-1)
            dq, dk, dv, dcoeff, dtable = _bwd_streaming_fused(
                scale, q, k, v, freqs_cis, g, lse, delta,
                interpret=interpret, mm_dtype=mm_dtype,
                poly=poly, rel=rel_table)
            dq = dq.astype(q.dtype)
            dk = dk.astype(k.dtype)
            dv = dv.astype(v.dtype)
            dbias = None
            dfreqs = None
            if freqs_cis is not None:
                dfreqs = (jnp.zeros_like(freqs_cis[0]),
                          jnp.zeros_like(freqs_cis[1]))
            if dcoeff is not None:
                dcoeff = dcoeff.astype(poly_coeff.dtype)
            if dtable is not None:
                dtable = dtable.astype(rel_table.dtype)
            return dq, dk, dv, dbias, dfreqs, dcoeff, dtable
        # Separate-pass backward: dense-bias mode (in-kernel batch-
        # accumulated dbias) or learnable rope-mixed frequencies (dqr/dkr
        # outputs) — their extra outputs don't fit the fused residency.
        dq, dk, dv, dbias, dfreqs, dcoeff, dtable = _bwd_streaming(
            scale, q, k, v, bias, freqs_cis, out, g,
            interpret=interpret, mm_dtype=mm_dtype,
            want_dbias=bias is not None, want_dfreqs=learnable_freqs,
            poly=poly, rel=rel_table, lse=lse)
        if freqs_cis is not None and dfreqs is None:
            # Fixed axial frequencies carry no learnable dependence; a zero
            # cotangent is exact (and is dropped upstream).
            dfreqs = (jnp.zeros_like(freqs_cis[0]),
                      jnp.zeros_like(freqs_cis[1]))
        return dq, dk, dv, dbias, dfreqs, dcoeff, dtable

    # Dense regime: head-batched one-kernel tiled backward (the round-2
    # oracle-recompute vjp is gone — _dense_bwd_kernel runs the five flash
    # identities with the softmax recomputed in VMEM). Generated-bias modes
    # materialize their (small, dense-sized) bias for the kernel and
    # transpose the accumulated dbias back through the generator's jnp vjp.
    gen_vjp = None
    if poly_coeff is not None:
        bias_in, gen_vjp = jax.vjp(
            lambda c: _poly_bias_cols(c, poly_grid, n, 0, n,
                                      poly_coeff.shape[1] - 1), poly_coeff)
    elif rel_table is not None:
        bias_in, gen_vjp = jax.vjp(
            lambda t: _rel_bias_cols(t, n, 0, n), rel_table)
    else:
        bias_in = bias
    dq, dk, dv, dbias, dfreqs = _bwd_dense(
        scale, q, k, v, bias_in, freqs_cis, out, g, interpret,
        mm_dtype=mm_dtype, want_dbias=bias_in is not None,
        want_dfreqs=learnable_freqs)
    dcoeff = dtable = None
    if poly_coeff is not None:
        (dcoeff,) = gen_vjp(dbias)
        dbias = None
    elif rel_table is not None:
        (dtable,) = gen_vjp(dbias)
        dbias = None
    elif dbias is not None:
        dbias = dbias.astype(bias.dtype)
    if freqs_cis is not None and dfreqs is None:
        dfreqs = (jnp.zeros_like(freqs_cis[0]),
                  jnp.zeros_like(freqs_cis[1]))
    return dq, dk, dv, dbias, dfreqs, dcoeff, dtable


# Production default (bf16 multiplies, f32 accumulation) and a full-f32
# variant for high-precision use / tight parity testing.
flash_attention = _make_flash_attention(jnp.bfloat16)
flash_attention_hp = _make_flash_attention(jnp.float32)
