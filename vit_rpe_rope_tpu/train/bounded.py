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

PARALLEL COMPOSITION (mesh= / seq_parallel=): the same host schedule runs
SPMD over a device mesh —

  * data parallelism: the batch is sharded over 'data'. Every per-token
    piece stays a plain jit program — GSPMD's global-array semantics make
    the batch reductions (param grads, the loss mean) correct without any
    code change; only the Pallas attention programs need shard_map
    wrappers (GSPMD cannot partition a pallas_call), with the in-kernel
    PE-parameter partials psum'd over 'data' at the program boundary
    (OUTSIDE differentiated code — the backward here is hand-scheduled).
  * sequence parallelism (seq_parallel > 1): tokens are sharded
    shard-major over the mesh's 'model' axis (the lone-CP convention) and
    each per-q-chunk attention program runs the KV RING — the exact
    recurrence of parallel/context_parallel.ring_flash_attention, with the
    hop loop a lax.scan INSIDE the program (ppermute rides ICI) and the
    time loop over q-chunks staying on the host. Each program is bounded
    by q_chunk · N work — the same bound as the single-device driver —
    and per-device residency is O(N/R). The forward merges hop partials
    with the online-softmax logaddexp rule; the backward rides dk/dv
    accumulators around the ring with k/v (they land home after R hops).
    This is the composition that makes the 1M-2M-token single-chip
    capability multi-chip: bounded stepping bounds program DURATION, the
    ring bounds per-chip MEMORY, and both now hold at once. Data
    parallelism composes as the degenerate R=1 ring, so the mesh path is
    ONE code path; the host schedule (chunk starts, buffer scatter,
    gradient accumulation) is mesh-agnostic — local shard offsets under
    the ring coincide with global offsets when R=1.

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
    NEG_INF, _pad_seq, _prep_freqs, _round_up, streaming_chunk_bwd,
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
                      debug_grads: bool = False, mesh=None,
                      seq_parallel: int = 1, force_ring: bool = False,
                      grad_accum: int = 1):
    """Build the bounded-program step.

    Returns step(params, opt_state, step_vec, images_u8, labels) ->
    (params, opt_state, metrics[loss, correct, count]) — the monolithic
    driver's contract, minus the index-gather (the caller hands the batch
    directly; there is no epoch index table to slice).

    grad_accum > 1: the step consumes MICROBATCHED inputs with a leading
    accumulation axis — images_u8 [A, B, h, w, C], labels/mask [A, B] —
    runs the full host-scheduled fwd+bwd once per micro-row, accumulates
    count-weighted raw gradients, and applies ONE optimizer update
    normalized by the total real-example count: bit-comparable (to f32
    accumulation order) to a single step on the concatenated [A·B] batch.
    This is the effective-batch mechanism for the 1M–2M-token regime,
    where a single micro-batch is already the HBM budget — the schedule
    is host-driven, so the accumulators ride between piece programs
    exactly like the kv-segment accumulators do
    (capability bar: /root/reference/train.py:94-116 trains at any
    batch size).

    q_chunk: query rows per attention program (rounded up to 512). The
    whole step issues ~depth·(2·ceil(N/q_chunk) + 4) + 5 programs; each
    attention program does q_chunk·N_pad of the N² work.
    kv_chunk: 0 = each backward attention program sees ALL keys (its
    full-width f32 dk/dv contributions are the dominant transients at
    extreme N). > 0 = the backward ALSO segments the key axis at the host
    level (outer loop over kv segments, inner over q chunks): dk/dv are
    complete per segment — written ONCE into compute-dtype buffers, no
    full-width f32 accumulators — bounding gradient residency by the
    segment size. The N=2M single-chip config needs this. Does not
    compose with seq_parallel (the ring already bounds kv residency by
    the shard size).
    mm_dtype: in-kernel matmul dtype (bf16 = production; f32 for parity
    tests against the XLA oracle path).
    debug_grads: also return the raw gradient dict as a 4th element
    (parity tests compare it against jax.grad of the monolithic loss).
    mesh: a ('data', 'model') jax.sharding.Mesh for SPMD execution (see
    module docstring). None or a 1-device mesh = the single-device path.
    The caller shards images/labels over 'data' and replicates
    params/optimizer state; outputs come back with the same placement.
    seq_parallel: token shards over the mesh's 'model' axis (KV ring).
    force_ring: run the ring code path even at seq_parallel == 1 (a
    1-device ring is numerically exact — used to validate the ring
    programs on single-chip hardware).
    """
    if cfg.has_dropout:
        raise ValueError("bounded-program stepping does not support dropout "
                         "(the reference's effective regime is all rates 0)")
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1; got {grad_accum}")
    n_seq = max(1, seq_parallel)
    if mesh is not None and mesh.devices.size == 1 and n_seq == 1 \
            and not force_ring:
        mesh = None  # 1-device mesh: keep the validated single-device path
    n_data = 1
    if mesh is not None:
        from vit_rpe_rope_tpu.parallel.mesh import (
            DATA_AXIS, MODEL_AXIS, NamedSharding, P)
        from vit_rpe_rope_tpu.parallel.mesh import shard_map as _shard_map
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if axes.get(MODEL_AXIS, 1) != n_seq:
            raise ValueError(
                f"seq_parallel={n_seq} needs a mesh whose '{MODEL_AXIS}' "
                f"axis has that size; got {axes}")
        n_data = axes.get(DATA_AXIS, 1)
    elif n_seq > 1 or force_ring:
        raise ValueError("seq_parallel > 1 / force_ring require a mesh")
    if mesh is not None and kv_chunk:
        raise ValueError("kv_chunk does not compose with a mesh: under "
                         "seq_parallel the ring already bounds backward kv "
                         "residency by the shard size N/R")
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    n = cfg.seq_len
    e, nh, dh = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    scale = dh ** -0.5
    q_chunk = _round_up(q_chunk, _ALIGN)
    n_pad = _round_up(n, _ALIGN * n_seq)
    nl = n_pad // n_seq  # local tokens per sequence shard (= n_pad if lone)
    starts = list(range(0, nl, q_chunk))
    sizes = [min(q_chunk, nl - s) for s in starts]
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

    # ---- mesh plumbing (no-ops when mesh is None) -------------------------
    # Activations are GLOBAL arrays: [B, N, E] batch-sharded over 'data' and
    # token-sharded (shard-major) over 'model'; q/k/v [B, H, N, D] likewise
    # on axes (0, 2). PE aux is replicated except the rope freq tables,
    # which shard with the tokens they rotate. with_sharding_constraint
    # inside the pieces pins both the forward values AND (via its transpose)
    # the hand-scheduled backward's cotangents; the O(N) pieces themselves
    # stay plain jit — GSPMD partitions them and inserts the batch psums
    # for the parameter cotangents.
    if mesh is not None:
        xspec = P(DATA_AXIS, MODEL_AXIS, None)
        tokspec = P(DATA_AXIS, None, MODEL_AXIS, None)
        lsespec = P(DATA_AXIS, None, MODEL_AXIS)
        freqspec = P(None, MODEL_AXIS, None)
        if kind == PE_KIND_QK_ROTATION:
            aux_specs = (freqspec, freqspec)
        elif kind == PE_KIND_LOGITS_BIAS:
            aux_specs = (P(),)
        else:
            aux_specs = ()

        def _ns(spec):
            return NamedSharding(mesh, spec)

        def _wsc(a, spec):
            return jax.lax.with_sharding_constraint(a, _ns(spec))

        _zcache = {}

        def zeros(shape, dt, spec):
            """Device-side zeros born with the right sharding (an eager
            jnp.zeros would land on one device and force a reshard)."""
            key = (tuple(shape), jnp.dtype(dt).name, spec)
            if key not in _zcache:
                _zcache[key] = jax.jit(
                    functools.partial(jnp.zeros, tuple(shape), dt),
                    out_shardings=_ns(spec))
            return _zcache[key]()
    else:
        xspec = tokspec = lsespec = freqspec = None

        def _wsc(a, spec):
            return a

        def zeros(shape, dt, spec):
            return jnp.zeros(shape, dt)

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
        x = _wsc(_pad_seq(x, n_pad, axis=1), xspec)
        if rope:
            cos, sin = _prep_freqs(pe_mod.freqs_cis(params, cfg), nh, n_pad,
                                   jnp.float32, broadcast=False)
            return x, (_wsc(cos, freqspec), _wsc(sin, freqspec))
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
        return (_wsc(q, tokspec), _wsc(k, tokspec), _wsc(v, tokspec))

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
        return _wsc(x + h, xspec)

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
    scatter_cls = jit(lambda dxcls: _wsc(jnp.zeros(
        (dxcls.shape[0], n_pad, e), dxcls.dtype).at[:, :1].set(dxcls),
        xspec))
    add_donate = jit(lambda a, b: a + b, donate_argnums=(0,))
    tree_add = jit(functools.partial(jax.tree_util.tree_map, jnp.add))
    take_cls = jit(lambda x: x[:, :1])
    stack3 = jit(lambda a, b, c: jnp.stack([a, b, c]))
    zero_tree = jit(functools.partial(jax.tree_util.tree_map,
                                      jnp.zeros_like))
    cast = jit(lambda a, dt: a.astype(dt), static_argnums=1,
               donate_argnums=(0,))
    # Gradient-accumulation plumbing (grad_accum > 1): count-weighted tree
    # scale/accumulate + one normalization, and a fused metric combine so
    # the scalar bookkeeping is one small program per micro-row.
    wscale = jit(lambda g, w: jax.tree_util.tree_map(lambda b: w * b, g))
    wacc = jit(lambda acc, g, w: jax.tree_util.tree_map(
        lambda x, y: x + w * y, acc, g), donate_argnums=(0,))
    div_tree = jit(lambda g, d: jax.tree_util.tree_map(lambda x: x / d, g),
                   donate_argnums=(0,))
    combine = jit(lambda loss, cor, cnt, lw, ct, cn:
                  (lw + loss * cnt, ct + cor, cn + cnt))
    zero3 = jit(lambda ref: (jnp.zeros_like(ref),) * 3)
    safe_den = jit(lambda c: jnp.maximum(c, 1.0))

    def _upd_rows(buf, part, r0):
        return jax.lax.dynamic_update_slice_in_dim(buf, part, r0, axis=2)

    if mesh is None:
        upd_rows = jit(_upd_rows, donate_argnums=(0,))
        acc_rows = jit(
            lambda buf, part, r0: jax.lax.dynamic_update_slice_in_dim(
                buf, jax.lax.dynamic_slice_in_dim(
                    buf, r0, part.shape[2], axis=2) + part, r0, axis=2),
            donate_argnums=(0,))
    else:
        # Row scatter under the mesh: offsets are LOCAL shard rows, so the
        # update must happen per shard (a global dynamic_update_slice would
        # write one contiguous slab, not one slab per token shard).
        _upd4 = jit(_shard_map(_upd_rows, mesh,
                               in_specs=(tokspec, tokspec, P()),
                               out_specs=tokspec), donate_argnums=(0,))
        _upd3 = jit(_shard_map(_upd_rows, mesh,
                               in_specs=(lsespec, lsespec, P()),
                               out_specs=lsespec), donate_argnums=(0,))

        def upd_rows(buf, part, r0):
            return (_upd4 if buf.ndim == 4 else _upd3)(buf, part, r0)

        acc_rows = None  # only the (mesh-rejected) kv_chunk path needs it
    one_chunk = len(starts) == 1
    opt_upd = jit(lambda params, opt_state, grads: (
        lambda u_o: (optax.apply_updates(params, u_o[0]), u_o[1]))(
            tx.update(grads, opt_state, params)), donate_argnums=(0, 1))

    att_f = {}   # per chunk-size compiled attention programs
    att_b = {}
    for sz in set(sizes) if mesh is None else ():
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

    if mesh is not None:
        # Mesh attention: one program per q-chunk, the KV ring a lax.scan
        # INSIDE it (hop r: this shard holds kv block (my - r) mod R;
        # ppermute my -> my+1 rotates). shard_map because GSPMD cannot
        # partition a pallas_call; psums/ppermutes here live in HAND-
        # SCHEDULED backward code, never under jax.grad (the custom-VJP
        # transposition hazard in parallel/mesh.py does not apply). Data
        # parallelism is the degenerate R=1 ring: one hop, col0 = 0, the
        # identity ppermute — one code path for DP, CP, and DP×CP.
        perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]

        def _ring_fwd(q, k, v, aux, r0, _sz):
            my = jax.lax.axis_index(MODEL_AXIS)
            qi = jax.lax.dynamic_slice_in_dim(q, r0, _sz, axis=2)
            row0 = my * nl + r0
            kw = _chunk_kw(aux)
            b_, h_ = qi.shape[0], qi.shape[1]

            def body(carry, r):
                out, lse, k_cur, v_cur = carry
                col0 = ((my - r) % n_seq) * nl
                o_c, lse_c = streaming_chunk_fwd(
                    qi, k_cur, v_cur, scale, row0, col0, n,
                    interpret=interpret, mm_dtype=mm_dtype, **kw)
                # Online-softmax merge (o_c is normalized within its hop's
                # kv block) — parallel/context_parallel._ring_flash_fwd_impl
                # convention, composed here per q-chunk.
                lse_new = jnp.logaddexp(lse, lse_c)
                out = (out * jnp.exp(lse - lse_new)[..., None]
                       + o_c.astype(jnp.float32)
                       * jnp.exp(lse_c - lse_new)[..., None])
                k_nxt = jax.lax.ppermute(k_cur, MODEL_AXIS, perm)
                v_nxt = jax.lax.ppermute(v_cur, MODEL_AXIS, perm)
                return (out, lse_new, k_nxt, v_nxt), None

            init = (jnp.zeros((b_, h_, _sz, dh), jnp.float32),
                    jnp.full((b_, h_, _sz), NEG_INF, jnp.float32), k, v)
            (out, lse, _, _), _ = jax.lax.scan(body, init,
                                               jnp.arange(n_seq),
                                               length=n_seq)
            return out.astype(q.dtype), lse

        def _ring_bwd(q, k, v, g, o, lse, aux, r0, _sz):
            my = jax.lax.axis_index(MODEL_AXIS)
            qi = jax.lax.dynamic_slice_in_dim(q, r0, _sz, axis=2)
            gi = jax.lax.dynamic_slice_in_dim(g, r0, _sz, axis=2)
            oi = jax.lax.dynamic_slice_in_dim(o, r0, _sz, axis=2)
            li = jax.lax.dynamic_slice_in_dim(lse, r0, _sz, axis=2)
            row0 = my * nl + r0
            kw = _chunk_kw(aux)
            delta = jnp.sum(gi.astype(jnp.float32) * oi.astype(jnp.float32),
                            axis=-1)
            b_, h_ = qi.shape[0], qi.shape[1]
            have_p = poly or rel

            def body(carry, r):
                dq, dparam, k_cur, v_cur, dk_cur, dv_cur = carry
                col0 = ((my - r) % n_seq) * nl
                dq_c, dk_c, dv_c, dp_c = streaming_chunk_bwd(
                    qi, k_cur, v_cur, gi, li, delta, scale, row0, col0, n,
                    interpret=interpret, mm_dtype=mm_dtype, **kw)
                dq = dq + dq_c
                if have_p:
                    dparam = dparam + dp_c
                # dk/dv partials ride the ring with k/v: the accumulator
                # for block c travels the remaining hops and lands on
                # shard c — the block's owner — exactly when the scan ends.
                dk_cur = dk_cur + dk_c
                dv_cur = dv_cur + dv_c
                nxt = [jax.lax.ppermute(a, MODEL_AXIS, perm)
                       for a in (k_cur, v_cur, dk_cur, dv_cur)]
                return (dq, dparam, *nxt), None

            dparam0 = (jnp.zeros(aux[0].shape, jnp.float32) if have_p
                       else jnp.zeros((), jnp.float32))
            init = (jnp.zeros((b_, h_, _sz, dh), jnp.float32), dparam0, k, v,
                    jnp.zeros(k.shape, jnp.float32),
                    jnp.zeros(v.shape, jnp.float32))
            (dq, dparam, _, _, dk, dv), _ = jax.lax.scan(
                body, init, jnp.arange(n_seq), length=n_seq)
            # Chunk partials travel in compute dtype (single-device att_b
            # convention); the host's accumulators stay f32. dparam is
            # completed here — psum over BOTH axes, outside differentiated
            # code — so the host adds replicated arrays.
            dq, dk, dv = (a.astype(q.dtype) for a in (dq, dk, dv))
            if have_p:
                return dq, dk, dv, jax.lax.psum(dparam,
                                                (DATA_AXIS, MODEL_AXIS))
            return dq, dk, dv

        have_p = poly or rel
        out_b = ((tokspec, tokspec, tokspec, P()) if have_p
                 else (tokspec, tokspec, tokspec))
        for sz in set(sizes):
            att_f[sz] = jit(_shard_map(
                functools.partial(_ring_fwd, _sz=sz), mesh,
                in_specs=(tokspec, tokspec, tokspec, aux_specs, P()),
                out_specs=(tokspec, lsespec)))
            bwd = jit(_shard_map(
                functools.partial(_ring_bwd, _sz=sz), mesh,
                in_specs=(tokspec, tokspec, tokspec, tokspec, tokspec,
                          lsespec, aux_specs, P()),
                out_specs=out_b))
            if have_p:
                att_b[sz] = bwd
            else:
                att_b[sz] = (lambda *a, _b=bwd: (*_b(*a), None))

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
    head_j = jit(_head)

    if mesh is not None and jax.default_backend() == "cpu":
        # The 1-core CPU test meshes deadlock when more than one sharded
        # program is in flight (in-process collectives; train/loop.py
        # serializes its steps for the same reason). Block after every
        # dispatch — correctness-only mode, the CPU mesh is a test rig.
        def _sync(f):
            @functools.wraps(f)
            def g(*a, **kw):
                r = f(*a, **kw)
                jax.block_until_ready(r)
                return r
            return g

        (embed_f, embed_b, pre_f, pre_b, post_f, post_b, head_vg, head_j,
         ones_mask, scatter_cls, add_donate, tree_add, take_cls, stack3,
         zero_tree, cast, upd_rows, opt_upd, zeros, wscale, wacc, div_tree,
         combine, zero3, safe_den) = map(_sync, (
             embed_f, embed_b, pre_f, pre_b, post_f, post_b, head_vg,
             head_j, ones_mask, scatter_cls, add_donate, tree_add,
             take_cls, stack3, zero_tree, cast, upd_rows, opt_upd, zeros,
             wscale, wacc, div_tree, combine, zero3, safe_den))
        att_f = {k2: _sync(v2) for k2, v2 in att_f.items()}
        att_b = {k2: _sync(v2) for k2, v2 in att_b.items()}

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
                o = zeros((bsz, nh, n_pad, dh), q.dtype, tokspec)
                # lse stays LANE-MAJOR [B, H, n_pad] (token dim last):
                # a [..., n_pad, 1] layout would pad its unit minor to the
                # 128-lane tile — ~2 GB of HBM at N=1M instead of 16 MB.
                lse = zeros((bsz, nh, n_pad), jnp.float32, lsespec)
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

    def evaluate(params, step_vec, images_u8, labels, mask=None):
        """Forward-only bounded evaluation: metrics [loss, correct, count]
        with the same per-program bounds as the train step (the eval
        counterpart fit() uses when q_chunk is set)."""
        del step_vec
        if mask is None:
            mask = ones_mask(labels)
        xs, _, _, _ = forward(params, images_u8, keep_residuals=False)
        hp = {nm: params[nm] for nm in hp_names}
        loss, (correct, count) = head_j(hp, take_cls(xs[-1]), labels, mask)
        return stack3(loss, correct, count)

    def _grads_of(params, images_u8, labels, mask):
        """One micro-batch's full host-scheduled fwd+bwd. Returns (grads,
        loss, correct, count): loss is the micro's batch-mean (the _head
        convention) and grads differentiate that mean — the accumulation
        wrapper re-weights by count for concat-batch parity."""
        bsz = labels.shape[0]

        # ---------------- forward ----------------
        xs, os_, lses, aux = forward(params, images_u8)

        hp = {nm: params[nm] for nm in hp_names}
        ((loss, (correct, count)), (dhp, dxcls)) = head_vg(
            hp, take_cls(xs[-1]), labels, mask)

        # ---------------- backward ----------------
        grads = dict(dhp)
        dx = scatter_cls(dxcls)
        daux = zero_tree(aux)
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
                dq = zeros((bsz, nh, n_pad, dh), qkv_dtype, tokspec)
                dk = zeros((bsz, nh, n_pad, dh), jnp.float32, tokspec)
                dv = zeros((bsz, nh, n_pad, dh), jnp.float32, tokspec)
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
        return grads, loss, correct, count

    def step(params, opt_state, step_vec, images_u8, labels, mask=None):
        del step_vec  # LR schedule lives in opt_state (optax count)
        if grad_accum == 1:
            if mask is None:
                mask = ones_mask(labels)
            grads, loss, correct, count = _grads_of(params, images_u8,
                                                    labels, mask)
        else:
            # Host-driven gradient accumulation: Σ_a count_a · grads_a is
            # the raw gradient SUM over every real example (grads_a
            # differentiate the micro MEAN); one normalization by the
            # total count at the end == the concatenated-batch gradient.
            assert images_u8.shape[0] == grad_accum, (
                f"grad_accum={grad_accum} expects a leading accumulation "
                f"axis; got images {images_u8.shape}")
            g_acc = totals = None
            for a in range(grad_accum):
                m_a = ones_mask(labels[a]) if mask is None else mask[a]
                g, loss_a, cor_a, cnt_a = _grads_of(params, images_u8[a],
                                                    labels[a], m_a)
                if g_acc is None:
                    g_acc = wscale(g, cnt_a)
                    totals = combine(loss_a, cor_a, cnt_a,
                                     *zero3(loss_a))
                else:
                    g_acc = wacc(g_acc, g, cnt_a)
                    totals = combine(loss_a, cor_a, cnt_a, *totals)
                _dbg(f"accum[{a}]", totals)
            loss_w, correct, count = totals
            safe = safe_den(count)
            grads = div_tree(g_acc, safe)
            loss = loss_w / safe

        new_params, opt_state = _dbg("opt_upd",
                                     opt_upd(params, opt_state, grads))
        metrics = stack3(loss, correct, count)
        if debug_grads:
            return new_params, opt_state, metrics, grads
        return new_params, opt_state, metrics

    step.n_chunks = len(starts)
    step.n_pad = n_pad
    step.evaluate = evaluate
    return step
