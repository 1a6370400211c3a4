"""Bounded-program train step: one optimizer step as MANY short programs.

The monolithic train step (train_step.make_train_step) compiles the whole
fwd+bwd+update into ONE XLA program. That is the right default — but a
single program is also a single scheduling unit: it must run to completion
inside whatever execution window the environment grants (a preemptible
slice, a remote-dispatch tunnel with a per-program execution deadline, a
profiler budget). At very long sequence lengths the attention term makes
the step minutes long, and the monolithic program becomes un-runnable even
though every individual piece of work is small.

This driver re-expresses the SAME step (same math, same optimizer, same
metrics as train_step._dp_step at accum=1, batch fully valid) as a host-
orchestrated pipeline of independently jitted programs, each bounded:

  embed -> [per block: pre -> attention per Q-CHUNK -> post] -> head/loss
        <- backward in reverse, attention gradients again per q-chunk <-
  -> optimizer update

* The attention — the only O(N²) term — is split along query rows: each
  q-chunk's program runs that chunk's rows against ALL keys through the
  streaming Pallas kernels at a global row offset (ops/flash_attention.
  streaming_chunk_fwd/_bwd — the exact primitives the CP ring composes
  across chips, here composed across TIME on one chip). Program duration
  scales with q_chunk·N instead of N².
* Every per-token piece (LN/qkv/rotation, proj/MLP, embed, head) is O(N)
  — already short — and runs as its own program.
* The backward is hand-scheduled: per-piece jax.vjp with explicit
  residuals (block inputs, attention outputs, logsumexp), recomputing the
  cheap O(N) pre-projections instead of saving q/k/v. Residency is
  therefore explicit and bounded: nothing holds more than a few [B, N, E]
  buffers plus the f32 dk/dv accumulators — the N=1M rope step fits HBM
  WITHOUT remat, where the monolithic program needs jax.checkpoint.

Functionally this is gradient checkpointing + program slicing done by the
host; numerically it matches the monolithic step (tests/test_bounded.py:
same loss and same updated params to f32 tolerance in every PE mode).

The reference has no counterpart (single-device torch eager,
/root/reference/train.py:94-217); this is TPU-native infrastructure for
the long-sequence regime the streaming kernels opened. Dropout/
augmentation are not supported (same contract as the CP ring:
parallel/context_parallel.apply_cp — the reference's effective regime is
all rates 0, SURVEY.md Q11).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import optax

from vit_rpe_rope_tpu import pe as pe_registry
from vit_rpe_rope_tpu.configs import (
    PE_KIND_EMBED_ADDITIVE,
    PE_KIND_LOGITS_BIAS,
    PE_KIND_QK_ROTATION,
    TrainConfig,
    ViTConfig,
)
from vit_rpe_rope_tpu.models.vit import (
    BLOCK_PARAM_NAMES, _layer_norm, _linear, patch_embed)
from vit_rpe_rope_tpu.ops.flash_attention import (
    _pad_seq, _prep_freqs, _round_up, streaming_chunk_bwd,
    streaming_chunk_fwd)
from vit_rpe_rope_tpu.ops.rotary import rotate_half_split

_ALIGN = 512  # kv-tile multiple: keeps every chunk/pad boundary tile-clean

# BOUNDED_SYNC_DEBUG=1: block after every piece dispatch and print a tag —
# memory bring-up tool for new N regimes (the tunnel exposes no
# memory_stats(); the tag stream identifies the dispatch that OOMs).
_SYNC_DEBUG = os.environ.get("BOUNDED_SYNC_DEBUG", "") == "1"


def _dbg(tag, value):
    if _SYNC_DEBUG:
        jax.block_until_ready(value)
        print(f"[bounded] {tag}", flush=True)
    return value


def make_bounded_step(cfg: ViTConfig, tcfg: TrainConfig, tx, preprocess,
                      q_chunk: int = 131072, kv_chunk: int = 0,
                      mm_dtype=jnp.bfloat16, interpret=None,
                      debug_grads: bool = False):
    """Build the bounded-program step.

    Returns step(params, opt_state, step_vec, images_u8, labels) ->
    (params, opt_state, metrics[loss, correct, count]) — the monolithic
    driver's contract, minus the index-gather (the caller hands the batch
    directly; there is no epoch index table to slice).

    q_chunk: query rows per attention program (rounded up to 512). The
    whole step issues ~depth·(2·ceil(N/q_chunk) + 4) + 5 programs; each
    attention program does q_chunk·N_pad of the N² work.
    kv_chunk: 0 = each backward attention program sees ALL keys (its
    full-width f32 dk/dv contributions are the dominant transients at
    extreme N). > 0 = the backward ALSO segments the key axis at the host
    level (outer loop over kv segments, inner over q chunks): dk/dv are
    complete per segment — written ONCE into compute-dtype buffers, no
    full-width f32 accumulators — bounding gradient residency by the
    segment size. The N=2M single-chip config needs this.
    mm_dtype: in-kernel matmul dtype (bf16 = production; f32 for parity
    tests against the XLA oracle path).
    debug_grads: also return the raw gradient dict as a 4th element
    (parity tests compare it against jax.grad of the monolithic loss).
    """
    if cfg.has_dropout:
        raise ValueError("bounded-program stepping does not support dropout "
                         "(the reference's effective regime is all rates 0)")
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    n = cfg.seq_len
    e, nh, dh = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    scale = dh ** -0.5
    q_chunk = _round_up(q_chunk, _ALIGN)
    n_pad = _round_up(n, _ALIGN)
    starts = list(range(0, n_pad, q_chunk))
    sizes = [min(q_chunk, n_pad - s) for s in starts]
    kv_chunk = _round_up(kv_chunk, _ALIGN) if kv_chunk else 0
    kv_starts = list(range(0, n_pad, kv_chunk)) if kv_chunk else [0]
    kv_sizes = ([min(kv_chunk, n_pad - c) for c in kv_starts] if kv_chunk
                else [n_pad])

    kind = pe_mod.KIND
    rope = kind == PE_KIND_QK_ROTATION
    poly = kind == PE_KIND_LOGITS_BIAS and cfg.pos_encoding == "polynomial"
    rel = kind == PE_KIND_LOGITS_BIAS and cfg.pos_encoding == "relative"
    if kind == PE_KIND_LOGITS_BIAS and not (poly or rel):
        raise ValueError(f"no streaming generator for PE "
                         f"{cfg.pos_encoding!r}; use the monolithic step")

    def _chunk_kw(aux):
        if poly:
            return dict(poly=(aux[0], cfg.grid_size))
        if rel:
            return dict(rel=aux[0])
        return {}

    # ---- pieces (each jitted once; shapes are static per piece) ----------

    def _embed(params, images_u8):
        """uint8 images -> padded tokens [B, n_pad, E] + PE aux tensors.
        aux: (cos, sin) f32 for rotation PEs (head-shared tables stay H=1),
        ([H, deg+1] coeffs,) / ([H, 2L-1] table,) for the generated-bias
        modes, () otherwise. Differentiating through this piece routes the
        accumulated aux cotangents back to the raw PE parameters."""
        x = preprocess(images_u8)
        x = patch_embed(params, x.astype(dtype), cfg)
        bsz = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                               (bsz, 1, e))
        x = jnp.concatenate([cls, x], axis=1)
        if kind == PE_KIND_EMBED_ADDITIVE:
            x = pe_mod.add_embedding(params, x)
        x = _pad_seq(x, n_pad, axis=1)
        if rope:
            cos, sin = _prep_freqs(pe_mod.freqs_cis(params, cfg), nh, n_pad,
                                   jnp.float32, broadcast=False)
            return x, (cos, sin)
        if poly:
            return x, (pe_mod.coeff_per_head(params, cfg),)
        if rel:
            return x, (pe_mod.table_per_head(params, cfg),)
        return x, ()

    def _pre(bp, x, aux):
        """x [B, n_pad, E] -> rotated q, k, v [B, H, n_pad, Dh]."""
        h = _layer_norm(x, bp["norm1.weight"], bp["norm1.bias"], eps)
        bsz = x.shape[0]
        qkv = _linear(h, bp["attn.qkv.weight"])
        qkv = qkv.reshape(bsz, n_pad, 3, nh, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if rope:
            cos, sin = aux
            q = rotate_half_split(q, cos[None], sin[None])
            k = rotate_half_split(k, cos[None], sin[None])
        return q, k, v

    def _post(bp, x, o):
        """Residual + proj + MLP: (block input x, attention out o) -> block
        output. o [B, H, n_pad, Dh]."""
        bsz = x.shape[0]
        a = o.transpose(0, 2, 1, 3).reshape(bsz, n_pad, e)
        x = x + _linear(a, bp["attn.proj.weight"], bp["attn.proj.bias"])
        h = _layer_norm(x, bp["norm2.weight"], bp["norm2.bias"], eps)
        h = _linear(h, bp["mlp.fc1.weight"], bp["mlp.fc1.bias"])
        h = jax.nn.gelu(h, approximate=False)
        h = _linear(h, bp["mlp.fc2.weight"], bp["mlp.fc2.bias"])
        return x + h

    def _head(hp, xcls, labels, mask):
        """Final LN on the cls row only (LN is per-token, the head reads
        row 0 — same value as LN over all tokens then slicing) -> loss.
        mask [B] zeroes padding examples of a final partial batch (same
        semantics as train_step._gather_batch)."""
        xf = _layer_norm(xcls, hp["norm.weight"], hp["norm.bias"], eps)
        logits = _linear(xf[:, 0], hp["head.weight"],
                         hp["head.bias"]).astype(jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        count = jnp.sum(mask)
        loss = jnp.sum(losses * mask) / jnp.maximum(count, 1.0)
        correct = jnp.sum((jnp.argmax(logits, axis=-1) == labels)
                          .astype(jnp.float32) * mask)
        return loss, (correct, count)

    jit = jax.jit
    embed_f = jit(_embed)
    embed_b = jit(lambda params, images_u8, dx, daux: jax.vjp(
        _embed, params, images_u8)[1]((dx, daux))[0])
    pre_f = jit(_pre)
    pre_b = jit(lambda bp, x, aux, dqkv: jax.vjp(_pre, bp, x, aux)[1](dqkv))
    post_b = jit(lambda bp, x, o, dy: jax.vjp(_post, bp, x, o)[1](dy))
    post_f = jit(_post)
    head_vg = jit(jax.value_and_grad(_head, argnums=(0, 1), has_aux=True))
    ones_mask = jit(lambda labels: jnp.ones(labels.shape, jnp.float32))
    scatter_cls = jit(lambda dxcls: jnp.zeros(
        (dxcls.shape[0], n_pad, e), dxcls.dtype).at[:, :1].set(dxcls))
    add_donate = jit(lambda a, b: a + b, donate_argnums=(0,))
    tree_add = jit(functools.partial(jax.tree_util.tree_map, jnp.add))
    upd_rows = jit(
        lambda buf, part, r0: jax.lax.dynamic_update_slice_in_dim(
            buf, part, r0, axis=2), donate_argnums=(0,))
    acc_rows = jit(
        lambda buf, part, r0: jax.lax.dynamic_update_slice_in_dim(
            buf, jax.lax.dynamic_slice_in_dim(
                buf, r0, part.shape[2], axis=2) + part, r0, axis=2),
        donate_argnums=(0,))
    one_chunk = len(starts) == 1
    opt_upd = jit(lambda params, opt_state, grads: (
        lambda u_o: (optax.apply_updates(params, u_o[0]), u_o[1]))(
            tx.update(grads, opt_state, params)), donate_argnums=(0, 1))

    att_f = {}   # per chunk-size compiled attention programs
    att_b = {}
    for sz in set(sizes):
        def _afwd(q, k, v, aux, r0, _sz=sz):
            qi = jax.lax.dynamic_slice_in_dim(q, r0, _sz, axis=2)
            return streaming_chunk_fwd(qi, k, v, scale, r0, 0, n,
                                       interpret=interpret,
                                       mm_dtype=mm_dtype, **_chunk_kw(aux))

        def _abwd(q, k, v, g, o, lse, aux, r0, _sz=sz):
            qi = jax.lax.dynamic_slice_in_dim(q, r0, _sz, axis=2)
            gi = jax.lax.dynamic_slice_in_dim(g, r0, _sz, axis=2)
            oi = jax.lax.dynamic_slice_in_dim(o, r0, _sz, axis=2)
            li = jax.lax.dynamic_slice_in_dim(lse, r0, _sz, axis=2)
            delta = jnp.sum(gi.astype(jnp.float32) * oi.astype(jnp.float32),
                            axis=-1)
            dq, dk, dv, dp = streaming_chunk_bwd(
                qi, k, v, gi, li, delta, scale, r0, 0, n,
                interpret=interpret, mm_dtype=mm_dtype, **_chunk_kw(aux))
            # Chunk PARTIALS travel in compute dtype (full-width f32 dk/dv
            # transients are 2 GB each at N=2M); the caller's accumulator
            # stays f32, so only the per-chunk contribution is rounded.
            return dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype), dp

        att_f[sz] = jit(_afwd)
        att_b[sz] = jit(_abwd)

    att_b2 = {}  # kv-segmented backward: one (q-chunk, kv-segment) program
    if kv_chunk:
        for szq in set(sizes):
            for szk in set(kv_sizes):
                def _abwd2(q, k, v, g, o, lse, aux, r0, c0,
                           _szq=szq, _szk=szk):
                    qi = jax.lax.dynamic_slice_in_dim(q, r0, _szq, axis=2)
                    gi = jax.lax.dynamic_slice_in_dim(g, r0, _szq, axis=2)
                    oi = jax.lax.dynamic_slice_in_dim(o, r0, _szq, axis=2)
                    li = jax.lax.dynamic_slice_in_dim(lse, r0, _szq, axis=2)
                    kj = jax.lax.dynamic_slice_in_dim(k, c0, _szk, axis=2)
                    vj = jax.lax.dynamic_slice_in_dim(v, c0, _szk, axis=2)
                    delta = jnp.sum(gi.astype(jnp.float32)
                                    * oi.astype(jnp.float32), axis=-1)
                    # f32 partials here: dq accumulates over kv segments
                    # and dk/dv over q chunks — rounding happens only at
                    # the segment write-back in the caller.
                    return streaming_chunk_bwd(
                        qi, kj, vj, gi, li, delta, scale, r0, c0, n,
                        interpret=interpret, mm_dtype=mm_dtype,
                        **_chunk_kw(aux))

                att_b2[(szq, szk)] = jit(_abwd2)

    hp_names = ("norm.weight", "norm.bias", "head.weight", "head.bias")

    def forward(params, images_u8, keep_residuals=True):
        """Host-scheduled forward; returns (xs, os_, lses, aux) — the
        residual lists the backward consumes (empty when
        keep_residuals=False, e.g. eval)."""
        x, aux = _dbg("embed_f", embed_f(params, images_u8))[0:2]
        bsz = images_u8.shape[0]
        xs, os_, lses = [x], [], []
        for i in range(cfg.depth):
            bp = {nm: params[f"blocks.{i}.{nm}"] for nm in BLOCK_PARAM_NAMES}
            q, k, v = _dbg(f"pre_f[{i}]", pre_f(bp, x, aux))
            if one_chunk:
                o, lse = att_f[sizes[0]](q, k, v, aux, 0)
            else:
                o = jnp.zeros((bsz, nh, n_pad, dh), q.dtype)
                # lse stays LANE-MAJOR [B, H, n_pad] (token dim last):
                # a [..., n_pad, 1] layout would pad its unit minor to the
                # 128-lane tile — ~2 GB of HBM at N=1M instead of 16 MB.
                lse = jnp.zeros((bsz, nh, n_pad), jnp.float32)
                for r0, sz in zip(starts, sizes):
                    o_c, lse_c = att_f[sz](q, k, v, aux, r0)
                    o = upd_rows(o, o_c, r0)
                    lse = upd_rows(lse, lse_c, r0)
                    _dbg(f"att_f[{i}]@{r0}", lse)
            del q, k, v
            x = _dbg(f"post_f[{i}]", post_f(bp, x, o))
            if keep_residuals:
                xs.append(x)
                os_.append(o)
                lses.append(lse)
            else:
                xs[-1] = x  # eval holds only the latest block output
        return xs, os_, lses, aux

    head_j = jit(_head)

    def evaluate(params, step_vec, images_u8, labels, mask=None):
        """Forward-only bounded evaluation: metrics [loss, correct, count]
        with the same per-program bounds as the train step (the eval
        counterpart fit() uses when q_chunk is set)."""
        del step_vec
        if mask is None:
            mask = ones_mask(labels)
        xs, _, _, _ = forward(params, images_u8, keep_residuals=False)
        hp = {nm: params[nm] for nm in hp_names}
        loss, (correct, count) = head_j(hp, xs[-1][:, :1], labels, mask)
        return jnp.stack([loss, correct, count])

    def step(params, opt_state, step_vec, images_u8, labels, mask=None):
        del step_vec  # LR schedule lives in opt_state (optax count)
        bsz = labels.shape[0]
        if mask is None:
            mask = ones_mask(labels)

        # ---------------- forward ----------------
        xs, os_, lses, aux = forward(params, images_u8)

        hp = {nm: params[nm] for nm in hp_names}
        ((loss, (correct, count)), (dhp, dxcls)) = head_vg(
            hp, xs[-1][:, :1], labels, mask)

        # ---------------- backward ----------------
        grads = dict(dhp)
        dx = scatter_cls(dxcls)
        daux = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), aux)
        cast = jit(lambda a, dt: a.astype(dt), static_argnums=1,
                   donate_argnums=(0,))
        for i in reversed(range(cfg.depth)):
            bp = {nm: params[f"blocks.{i}.{nm}"] for nm in BLOCK_PARAM_NAMES}
            x_in, o, lse = xs[i], os_[i], lses[i]
            # Release list references as the walk consumes them — at very
            # long N each retained [B, N, E]-class buffer is real HBM.
            xs[i + 1] = os_[i] = lses[i] = None
            dbp_post, dx_a, do = _dbg(f"post_b[{i}]",
                                      post_b(bp, x_in, o, dx))
            del dx
            q, k, v = pre_f(bp, x_in, aux)  # cheap O(N) recompute
            qkv_dtype = q.dtype
            if kv_chunk:
                # Outer loop over KV SEGMENTS: dk/dv are complete per
                # segment and written once (compute dtype, no full-width
                # f32 accumulator); dq accumulates across segments in f32.
                dq = jnp.zeros((bsz, nh, n_pad, dh), jnp.float32)
                dk = jnp.zeros((bsz, nh, n_pad, dh), qkv_dtype)
                dv = jnp.zeros((bsz, nh, n_pad, dh), qkv_dtype)
                dparam = None
                for c0, szk in zip(kv_starts, kv_sizes):
                    dk_j = dv_j = None
                    for r0, szq in zip(starts, sizes):
                        dq_c, dk_c, dv_c, dp_c = att_b2[(szq, szk)](
                            q, k, v, do, o, lse, aux, r0, c0)
                        dq = acc_rows(dq, dq_c, r0)
                        dk_j = (dk_c if dk_j is None
                                else add_donate(dk_j, dk_c))
                        dv_j = (dv_c if dv_j is None
                                else add_donate(dv_j, dv_c))
                        if dp_c is not None:
                            dparam = (dp_c if dparam is None
                                      else add_donate(dparam, dp_c))
                        _dbg(f"att_b2[{i}]@{r0},{c0}", dv_j)
                    dk = upd_rows(dk, cast(dk_j, qkv_dtype), c0)
                    dv = upd_rows(dv, cast(dv_j, qkv_dtype), c0)
                    del dk_j, dv_j
                dq = cast(dq, qkv_dtype)
            elif one_chunk:
                dq, dk, dv, dparam = att_b[sizes[0]](q, k, v, do, o, lse,
                                                     aux, 0)
            else:
                # dq rows are DISJOINT across chunks (written once, no
                # accumulation) so the buffer stays in compute dtype;
                # dk/dv accumulate across chunks in f32.
                dq = jnp.zeros((bsz, nh, n_pad, dh), qkv_dtype)
                dk = jnp.zeros((bsz, nh, n_pad, dh), jnp.float32)
                dv = jnp.zeros((bsz, nh, n_pad, dh), jnp.float32)
                dparam = None
                for r0, sz in zip(starts, sizes):
                    dq_c, dk_c, dv_c, dp_c = att_b[sz](q, k, v, do, o, lse,
                                                       aux, r0)
                    dq = upd_rows(dq, dq_c, r0)
                    dk = add_donate(dk, dk_c)
                    dv = add_donate(dv, dv_c)
                    _dbg(f"att_b[{i}]@{r0}", dv)
                    if dp_c is not None:
                        dparam = (dp_c if dparam is None
                                  else add_donate(dparam, dp_c))
            # pre_b recomputes q/k/v internally: release everything the
            # vjp program doesn't need BEFORE dispatching it, and hand the
            # cotangents over in compute dtype (each f32 buffer still live
            # here is 1 GB at N=2M).
            del do, o, lse, q, k, v
            dk = cast(dk, qkv_dtype)
            dv = cast(dv, qkv_dtype)
            dbp_pre, dx_b, da = _dbg(f"pre_b[{i}]",
                                     pre_b(bp, x_in, aux, (dq, dk, dv)))
            del dq, dk, dv, x_in
            dx = add_donate(dx_a, dx_b)
            daux = tree_add(daux, da)
            if dparam is not None:  # in-kernel dcoeff/dtable partials
                daux = (add_donate(daux[0], dparam.astype(daux[0].dtype)),)
            dbp = tree_add(dbp_post, dbp_pre)
            for nm in BLOCK_PARAM_NAMES:
                grads[f"blocks.{i}.{nm}"] = dbp[nm]

        dparams_embed = _dbg("embed_b",
                             embed_b(params, images_u8, dx, daux))
        for key, g in dparams_embed.items():
            grads[key] = tree_add(grads[key], g) if key in grads else g

        new_params, opt_state = _dbg("opt_upd",
                                     opt_upd(params, opt_state, grads))
        metrics = jnp.stack([loss, correct, count])
        if debug_grads:
            return new_params, opt_state, metrics, grads
        return new_params, opt_state, metrics

    step.n_chunks = len(starts)
    step.n_pad = n_pad
    step.evaluate = evaluate
    return step
