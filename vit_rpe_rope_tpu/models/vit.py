"""Pure-functional Vision Transformer (params pytree + apply fn).

Functional counterpart of the reference VisionTransformer
(/root/reference/models/vit.py:131-286), redesigned TPU-first:

* Params are a FLAT dict keyed by the reference's state_dict names and stored
  in torch layout (Linear weights [out, in], conv weight [E, C, P, P]) — this
  keeps the checkpoint key/shape contract (SURVEY.md Q9) trivially intact so
  the visualizers' shape-sniffing keeps working and reference .pth checkpoints
  can be imported directly.
* Patch embedding is a reshape + one big matmul (kernel == stride conv is
  exactly a per-patch linear map) — lands on the MXU with no conv lowering.
* PE bias / RoPE cos-sin are generated ONCE per forward and reused by every
  block (the reference recomputes get_bias() inside each block — SURVEY.md Q5;
  pure win, no behavior change).
* Everything is jit-compatible: static shapes, python-level block loop
  (depth is small and static), no data-dependent control flow.

Inputs are NHWC (TPU-native layout); the data pipeline produces NHWC.
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
from vit_rpe_rope_tpu.ops import flash_attention
from vit_rpe_rope_tpu.ops import reference_attention
from vit_rpe_rope_tpu.utils.initializers import kaiming_normal_fan_out, trunc_normal


# ---------------------------------------------------------------------------
# Parameter initialization (/root/reference/models/vit.py:216-233; SURVEY.md Q10)
# ---------------------------------------------------------------------------

def init_params(key, cfg: ViTConfig) -> dict:
    """Flat params dict, reference state_dict key names, torch layouts.

    trunc_normal(std=0.02) for Linear weights and PE tables; zeros for all
    biases and the cls token; kaiming fan_out for the patch-embed conv.
    """
    e, c, p = cfg.embed_dim, cfg.in_chans, cfg.patch_size
    hid = cfg.mlp_hidden_dim
    keys = iter(jax.random.split(key, 6 * cfg.depth + 8))
    params = {
        "cls_token": jnp.zeros((1, 1, e), jnp.float32),
        "patch_embed.weight": kaiming_normal_fan_out(next(keys), (e, c, p, p)),
        "patch_embed.bias": jnp.zeros((e,), jnp.float32),
    }
    params.update(pe_registry.get(cfg.pos_encoding).init_params(next(keys), cfg))
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        params[f"{b}.norm1.weight"] = jnp.ones((e,), jnp.float32)
        params[f"{b}.norm1.bias"] = jnp.zeros((e,), jnp.float32)
        # qkv has NO bias (qkv_bias=False, /root/reference/models/vit.py:28,35)
        params[f"{b}.attn.qkv.weight"] = trunc_normal(next(keys), (3 * e, e))
        params[f"{b}.attn.proj.weight"] = trunc_normal(next(keys), (e, e))
        params[f"{b}.attn.proj.bias"] = jnp.zeros((e,), jnp.float32)
        params[f"{b}.norm2.weight"] = jnp.ones((e,), jnp.float32)
        params[f"{b}.norm2.bias"] = jnp.zeros((e,), jnp.float32)
        params[f"{b}.mlp.fc1.weight"] = trunc_normal(next(keys), (hid, e))
        params[f"{b}.mlp.fc1.bias"] = jnp.zeros((hid,), jnp.float32)
        params[f"{b}.mlp.fc2.weight"] = trunc_normal(next(keys), (e, hid))
        params[f"{b}.mlp.fc2.bias"] = jnp.zeros((e,), jnp.float32)
    params["norm.weight"] = jnp.ones((e,), jnp.float32)
    params["norm.bias"] = jnp.zeros((e,), jnp.float32)
    params["head.weight"] = trunc_normal(next(keys), (cfg.num_classes, e))
    params["head.bias"] = jnp.zeros((cfg.num_classes,), jnp.float32)
    return params


def buffers(cfg: ViTConfig) -> dict:
    """Non-trainable state_dict entries (torch buffers) for checkpoint parity:
    relative_position_index, rope-axial inv_freq (SURVEY.md Q9)."""
    return dict(pe_registry.get(cfg.pos_encoding).buffers(cfg))


def reference_alias_keys(cfg: ViTConfig) -> dict:
    """The reference attaches the ONE shared PE module to every block's
    attention (/root/reference/models/vit.py:205-207, for every non-absolute
    PE), so each pos_embed.* tensor appears again in the torch state_dict as
    blocks.{i}.attn.pos_encoding.* — same storage, duplicated keys.

    Returns {alias_key: canonical_pos_embed_key} so checkpoints can be written
    with the exact reference key set (Q9) and loaded ignoring the duplicates.
    """
    pe_mod = pe_registry.get(cfg.pos_encoding)
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        return {}  # absolute PE is applied at embed time, never attached
    names = list(pe_mod.init_params(jax.random.PRNGKey(0), cfg)) + list(
        pe_mod.buffers(cfg)
    )
    aliases = {}
    for i in range(cfg.depth):
        for key in names:
            suffix = key.removeprefix("pos_embed.")
            aliases[f"blocks.{i}.attn.pos_encoding.{suffix}"] = key
    return aliases


def num_params(params: dict) -> int:
    return sum(int(v.size) for v in params.values())


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _layer_norm(x, weight, bias, eps):
    """torch nn.LayerNorm semantics (biased variance), stats in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def _linear(x, weight, bias=None):
    """x [..., in] @ torch-layout weight [out, in] (+ bias)."""
    y = jnp.einsum(
        "...i,oi->...o", x, weight.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def patchify(images, cfg: ViTConfig):
    """[B, H, W, C] images -> [B, S, C·P·P] per-patch pixel rows, row-major
    over the patch grid (so t_x = t % w, t_y = t // w — the reference's
    token order, /root/reference/models/vit.py:164,248-250). Shared by the
    fp32 patch_embed and the quantized serving twin (quant.apply_q8)."""
    b = images.shape[0]
    g, p, c = cfg.grid_size, cfg.patch_size, cfg.in_chans
    x = images.reshape(b, g, p, g, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gi, gj, C, P, P]
    return x.reshape(b, g * g, c * p * p)


def patch_embed(params, images, cfg: ViTConfig):
    """Non-overlapping patch embedding as reshape + matmul.

    A conv with kernel == stride is exactly a linear map per patch:
      out[b, t, e] = Σ_{c,p,q} w[e,c,p,q] · img[b, c, i·P+p, j·P+q],  t = i·w+j
    images: [B, H, W, C] float.
    """
    e, c, p = cfg.embed_dim, cfg.in_chans, cfg.patch_size
    w = params["patch_embed.weight"].reshape(e, c * p * p)
    return _linear(patchify(images, cfg), w, params["patch_embed.bias"])


def _attention_impl(cfg: ViTConfig) -> str:
    impl = cfg.attention_impl
    if impl == "auto":
        # Measured on v5e-1 three rounds running (r1-r3): at the reference's
        # shapes XLA beats the Pallas kernels — at N=65 per-program
        # overheads dominate, and at N=197 the round-3 head-batched dense
        # backward reaches standalone parity (fwd 22.6 vs 24.5 µs, grad
        # 1079 vs 1038 µs) yet the 12-block step still loses ~25% because
        # the custom_vjp boundary blocks XLA's qkv/proj epilogue fusions.
        # Above the streaming threshold the Pallas path WINS in every PE
        # mode (N=4,097: rope 0.033 vs 0.042 s/step; it never materializes
        # the [B, H, N, N] logits XLA needs ~1 GB for), so "auto" switches
        # there. Full analysis: ROADMAP.md round-2 + round-3 closures.
        from vit_rpe_rope_tpu.ops.flash_attention import STREAMING_THRESHOLD

        impl = "flash" if cfg.seq_len > STREAMING_THRESHOLD else "reference"
    return impl


def remat_block_fn(cfg: ViTConfig, fn, static_argnums):
    """`fn` wrapped in jax.checkpoint per cfg.remat / cfg.remat_policy
    (identity when remat is off) — the single home of the policy mapping,
    shared by the plain, stacked, TP, CP and PP forwards. "dots" saves matmul
    outputs and recomputes only elementwise/LN work (measured: recovers over
    half of full remat's step-time penalty in bf16; see VALIDATION.md)."""
    if not cfg.remat:
        return fn
    if cfg.remat_policy == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif cfg.remat_policy == "softmax":
        # Save every intermediate EXCEPT the tagged f32 [B, H, N, N]
        # softmax tensors (ops/reference_attention.py) — near-zero
        # recompute, removes the dense regime's dominant residual traffic.
        # NOTE: jax's save_any_names_but_these treats UNtagged values as
        # non-saveable (it is a names-only whitelist family), which would
        # degrade to full remat — hence the explicit policy: saveable
        # unless it is the tagged name.
        def policy(prim, *_, **params):
            return not (prim.name == "name"
                        and params.get("name") == "attn_softmax")
    else:
        policy = None
    return jax.checkpoint(fn, static_argnums=static_argnums, policy=policy)


def _dropout(x, rate, key):
    """Inverted dropout, torch nn.Dropout train-mode semantics (keep-scaled)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _drop_path(x, rate, key):
    """Stochastic depth per sample (timm DropPath, instantiated by
    /root/reference/models/vit.py:115): zero a residual branch for a random
    subset of examples, survivors scaled by 1/keep."""
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _logits_bias(pe_mod, params, cfg: ViTConfig, rng=None):
    """Materialized [H, L, L] attention bias — or, when the STREAMING flash
    path will run with polynomial PE (and attention-prob dropout can't force
    the unfused path), a 1-tuple (coeff_hk,) marker telling _block_body to
    let the Pallas kernel GENERATE bias tiles in-kernel from the
    coefficients (ops/flash_attention poly mode). At N >= 8k the [H, N, N]
    bias alone is tens of GB, so in-kernel generation is what makes
    polynomial PE reachable in the long-sequence regime.

    rng mirrors _block_body's dropout gate: attn-prob dropout only runs in
    train mode (rng set), so eval forwards of an attn_drop_rate > 0 config
    still stream with the marker instead of materializing."""
    attn_drop_possible = cfg.attn_drop_rate > 0.0 and rng is not None
    if (cfg.pos_encoding in ("polynomial", "relative")
            and _attention_impl(cfg) == "flash"
            and cfg.seq_len > flash_attention.STREAMING_THRESHOLD
            and not attn_drop_possible):
        if cfg.pos_encoding == "polynomial":
            return (pe_mod.coeff_per_head(params, cfg),)
        return (pe_mod.table_per_head(params, cfg),)
    return pe_mod.attn_bias(params, cfg)


def _block(params, prefix, x, cfg, bias, freqs_cis, impl, rng=None):
    """Pre-LN transformer block (/root/reference/models/vit.py:100-129) on
    prefix-keyed flat params; delegates to _block_body (rematerialized per
    cfg.remat/remat_policy, same as apply_stacked)."""
    block_params = {name: params[f"{prefix}.{name}"]
                    for name in BLOCK_PARAM_NAMES}
    block_fn = remat_block_fn(cfg, _block_body, static_argnums=(2, 5))
    return block_fn(block_params, x, cfg, bias, freqs_cis, impl, rng)


# ---------------------------------------------------------------------------
# Depth-stacked layout: per-block params as [depth, ...] arrays + lax.scan.
# Same math as the unrolled loop, but ~12 leaves instead of ~12·depth — far
# fewer XLA kernels per optimizer/autodiff step and one compiled block body.
# The flat reference-keyed dict stays the checkpoint/TP interface.
# ---------------------------------------------------------------------------

BLOCK_PARAM_NAMES = (
    "norm1.weight", "norm1.bias", "attn.qkv.weight", "attn.proj.weight",
    "attn.proj.bias", "norm2.weight", "norm2.bias", "mlp.fc1.weight",
    "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias",
)


def stack_block_params(params: dict, cfg: ViTConfig) -> dict:
    """Reference-keyed dict -> stacked dict: blocks.{i}.X (i = 0..depth-1)
    becomes one "blocks.X" array of shape [depth, ...]."""
    out = {k: v for k, v in params.items() if not k.startswith("blocks.")}
    for name in BLOCK_PARAM_NAMES:
        out[f"blocks.{name}"] = jnp.stack(
            [params[f"blocks.{i}.{name}"] for i in range(cfg.depth)])
    return out


def unstack_block_params(stacked: dict, cfg: ViTConfig) -> dict:
    out = {k: v for k, v in stacked.items() if not k.startswith("blocks.")}
    for name in BLOCK_PARAM_NAMES:
        arr = stacked[f"blocks.{name}"]
        for i in range(cfg.depth):
            out[f"blocks.{i}.{name}"] = arr[i]
    return out


def _block_body(block_params: dict, x, cfg, bias, freqs_cis, impl, rng=None):
    """One pre-LN block on un-prefixed block params (scan body).

    NOTE: quant._q8_block is this function's int8 serving twin (same
    structure, quantized linears) — mirror structural changes there.

    rng=None (eval, or all dropout rates 0 — the reference's effective
    regime, SURVEY.md Q11) is the deterministic path, byte-identical to the
    pre-dropout program. With rng set and nonzero rates, dropout lands where
    the reference modules place it: attn probs (Attention.attn_drop), after
    attn-proj (proj_drop), after each MLP linear (timm Mlp drop), and
    per-sample drop-path on both residual branches."""
    eps = cfg.layer_norm_eps
    drop = rng is not None and cfg.has_dropout
    if impl == "flash_block":
        if bias is None and not drop:
            # EXPERIMENTAL single block-level custom_vjp (ops/block_vjp.py):
            # the whole block is one differentiation boundary — the
            # attention-level boundary measurably costs ~25% in-model at
            # dense shapes (ROADMAP round-3 closure) even though the Pallas
            # kernels are at standalone parity.
            from vit_rpe_rope_tpu.ops import block_vjp

            return block_vjp.block_apply(cfg, block_params, x, freqs_cis)
        impl = "flash"  # bias modes / dropout: regular per-call boundary
    keys = list(jax.random.split(rng, 6)) if drop else [None] * 6
    h = _layer_norm(x, block_params["norm1.weight"],
                    block_params["norm1.bias"], eps)
    bsz, n, e = h.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    # qkv via an einsum whose OUTPUT layout is already [3, B, H, N, Dh]:
    # the reshape(B,N,3,H,Dh).transpose(2,0,3,1,4) relayout it replaces was
    # a real device pass — 6.2% of stretch-step device time in the round-4
    # trace (docs/logs/r4_profile_stretch.json, "data formatting") — while
    # the einsum lets the MXU write its tiles in the target layout. Weight
    # rows are torch-ordered f = part·E + head·Dh + d, so the [3E, E] ->
    # [3, H, Dh, E] view is exact (same trick as tensor_parallel._tp_block).
    qkv_w = block_params["attn.qkv.weight"].reshape(3, nh, dh, e)
    qkv = jnp.einsum("bne,thde->tbhnd", h, qkv_w.astype(h.dtype),
                     preferred_element_type=jnp.float32).astype(h.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = dh ** -0.5
    attn_dropping = drop and cfg.attn_drop_rate > 0
    if impl == "flash" and not attn_dropping:
        if isinstance(bias, tuple):  # generated-bias marker (_logits_bias)
            gen = ({"poly": (bias[0], cfg.grid_size)}
                   if cfg.pos_encoding == "polynomial"
                   else {"rel": bias[0]})
            attn_out = flash_attention.flash_attention(
                q, k, v, scale, freqs_cis=freqs_cis, **gen)
        else:
            attn_out = flash_attention.flash_attention(
                q, k, v, scale, bias=bias, freqs_cis=freqs_cis)
    else:
        # Attn-prob dropout needs the materialized probabilities, so it
        # always runs on the unfused path.
        attn_out = reference_attention.attention(
            q, k, v, scale, bias=bias, freqs_cis=freqs_cis,
            dropout_rate=cfg.attn_drop_rate if attn_dropping else 0.0,
            dropout_key=keys[0])
    # NOTE(measured, round 4): the output-side twin of the qkv layout trick
    # (einsum "bhnd,ohd->bno" against a [E,H,Dh]-viewed proj.weight) LOSES
    # here — stretch fp32 1,494 -> 1,415 img/s (-5.3%), bf16 flat — unlike
    # the input side, XLA does not fold the [B,H,N,Dh]->[B,N,E] seam into
    # the fp32 matmul operand read. The explicit transpose+reshape is the
    # measured-faster form (docs/logs/r4_block_vjp.jsonl).
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(bsz, n, e)
    attn_out = _linear(attn_out, block_params["attn.proj.weight"],
                       block_params["attn.proj.bias"])
    if drop and cfg.drop_rate > 0:
        attn_out = _dropout(attn_out, cfg.drop_rate, keys[1])
    if drop and cfg.drop_path_rate > 0:
        attn_out = _drop_path(attn_out, cfg.drop_path_rate, keys[2])
    x = x + attn_out
    h = _layer_norm(x, block_params["norm2.weight"],
                    block_params["norm2.bias"], eps)
    h = _linear(h, block_params["mlp.fc1.weight"], block_params["mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
    if drop and cfg.drop_rate > 0:
        h = _dropout(h, cfg.drop_rate, keys[3])
    h = _linear(h, block_params["mlp.fc2.weight"], block_params["mlp.fc2.bias"])
    if drop and cfg.drop_rate > 0:
        h = _dropout(h, cfg.drop_rate, keys[4])
    if drop and cfg.drop_path_rate > 0:
        h = _drop_path(h, cfg.drop_path_rate, keys[5])
    return x + h


def apply_stacked(stacked: dict, images, cfg: ViTConfig, rng=None):
    """Forward on depth-stacked params. Numerically identical to apply()
    (same per-block math, same order).

    The block loop is UNROLLED on purpose: lax.scan over blocks measured
    ~35% slower here (it stacks saved activations for the backward and
    blocks cross-layer fusion). Stacking still pays off because the
    train-step flattener then sees ~25 leaves instead of ~100, keeping the
    optimizer and the unflatten VJP to a handful of large kernels."""
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    x = patch_embed(stacked, images.astype(dtype), cfg)
    bsz = x.shape[0]
    cls = jnp.broadcast_to(stacked["cls_token"].astype(dtype),
                           (bsz, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)

    bias = None
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(stacked, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        bias = _logits_bias(pe_mod, stacked, cfg, rng)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(stacked, cfg)

    impl = _attention_impl(cfg)
    # Recompute blocks in the backward pass per cfg.remat: O(depth) less
    # activation memory for one extra forward — scaling knob for big models.
    block_fn = remat_block_fn(cfg, _block_body, static_argnums=(2, 5))
    for i in range(cfg.depth):
        block_params = {name: stacked[f"blocks.{name}"][i]
                        for name in BLOCK_PARAM_NAMES}
        block_rng = None if rng is None else jax.random.fold_in(rng, i)
        x = block_fn(block_params, x, cfg, bias, freqs_cis, impl, block_rng)
    x = _layer_norm(x, stacked["norm.weight"], stacked["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], stacked["head.weight"], stacked["head.bias"])
    return logits.astype(jnp.float32)


def forward_features(params, images, cfg: ViTConfig, rng=None):
    """[B, H, W, C] images -> [B, L, E] token features after all blocks.

    rng: optional PRNG key enabling train-mode dropout/drop-path when the
    corresponding cfg rates are nonzero; None = deterministic (eval)."""
    pe_mod = pe_registry.get(cfg.pos_encoding)
    dtype = jnp.dtype(cfg.compute_dtype)
    x = patch_embed(params, images.astype(dtype), cfg)  # [B, S, E]
    bsz = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(dtype), (bsz, 1, cfg.embed_dim)
    )
    x = jnp.concatenate([cls, x], axis=1)  # [B, L, E]

    bias = None
    freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(params, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        # [H, L, L] once per forward — or the in-kernel-generation marker
        # in the streaming-polynomial regime (_logits_bias).
        bias = _logits_bias(pe_mod, params, cfg, rng)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(params, cfg)  # once per forward

    impl = _attention_impl(cfg)
    for i in range(cfg.depth):
        block_rng = None if rng is None else jax.random.fold_in(rng, i)
        x = _block(params, f"blocks.{i}", x, cfg, bias, freqs_cis, impl,
                   block_rng)
    return x


def apply(params, images, cfg: ViTConfig, rng=None):
    """Full forward: [B, H, W, C] images -> [B, num_classes] logits
    (classification from the cls token, /root/reference/models/vit.py:273-286).
    rng enables train-mode dropout (see forward_features)."""
    x = forward_features(params, images, cfg, rng)
    x = _layer_norm(x, params["norm.weight"], params["norm.bias"],
                    cfg.layer_norm_eps)
    logits = _linear(x[:, 0], params["head.weight"], params["head.bias"])
    return logits.astype(jnp.float32)
