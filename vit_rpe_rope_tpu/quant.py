"""Post-training int8 quantization for serving — a deployment capability
with no reference counterpart (the reference serves fp32 eager torch only).

Two modes over the SAME int8 artifacts (`quantize_params` output):

  * **W8A8** (`mode="w8a8"`): int8×int8→int32 MXU matmuls (394 TOPS on v5e,
    double the bf16 peak) with per-token dynamic activation scales — no
    calibration set needed; accumulation in int32, dequantized by the
    rank-1 outer product of the two scale vectors.
  * **W8A16** (`mode="w8a16"`, weight-only): weights dequantize to bf16
    inside the matmul fusion, activations stay bf16 — no activation
    round/clip chain at all. Halves WEIGHT HBM traffic vs bf16 params, so
    it targets the weight-bound serving regime (small batches / latency),
    where W8A8's per-token quantization overhead is pure loss.

  * weights: per-output-channel symmetric int8 (offline, `quantize_params`)
    in both modes — one artifact serves both.

Everything non-matmul (LayerNorm, softmax, GELU, PE generators, the
attention inner products q·kᵀ / p·v, residuals) stays in float (f32 for
w8a8, bf16 for w8a16) — bandwidth-bound vector ops where int8 buys nothing
but error. Numerics: quantization error is bounded by the per-channel /
per-token abs-max grids; `tests/test_quant.py` enforces logit closeness
and top-1 agreement with the fp32 path on trained models in both modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_rpe_rope_tpu.configs import PE_KIND_EMBED_ADDITIVE, \
    PE_KIND_LOGITS_BIAS, PE_KIND_QK_ROTATION, ViTConfig
from vit_rpe_rope_tpu.models.vit import (_attention_impl, _layer_norm,
                                          _logits_bias, patchify)
from vit_rpe_rope_tpu.ops import flash_attention, reference_attention
from vit_rpe_rope_tpu.pe import REGISTRY as pe_registry

# Linear-family weights to quantize: every ".weight" that feeds a matmul.
# LayerNorm weights stay fp32 (vector op), biases stay fp32 (added post-
# dequant). patch_embed.weight [E, C, P, P] is reshaped to its matmul form.
_QUANT_SUFFIXES = ("qkv.weight", "proj.weight", "fc1.weight", "fc2.weight")


def _is_quantized_key(key: str) -> bool:
    if key in ("patch_embed.weight", "head.weight"):
        return True
    return key.startswith("blocks.") and key.endswith(_QUANT_SUFFIXES)


def quantize_tensor(w):
    """Symmetric int8 quantization of `w` [out, in] (torch linear layout)
    with one scale per OUT channel (reduced over `in`).
    Returns (w_q int8 [out, in], scale f32 [out])."""
    absmax = jnp.max(jnp.abs(w), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    w_q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_params(params: dict, cfg: ViTConfig) -> dict:
    """fp32 reference-keyed params -> serving qparams: every matmul weight
    replaced by `{key}:q8` (int8) + `{key}:scale` (f32 per-out-channel);
    everything else passed through as float32."""
    out = {}
    for key, w in params.items():
        if _is_quantized_key(key):
            w = jnp.asarray(w, jnp.float32)
            if key == "patch_embed.weight":
                e = w.shape[0]
                w = w.reshape(e, -1)  # matmul form [E, C·P·P]
            w_q, scale = quantize_tensor(w)
            out[key + ":q8"] = w_q
            out[key + ":scale"] = scale
        else:
            out[key] = jnp.asarray(w)
    return out


def _q8_act(x):
    """Dynamic per-token symmetric int8 activation quantization.
    x: [..., in] float -> (x_q int8, scale f32 [...])."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    x_q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return x_q, scale


def q8_linear(x, w_q, w_scale, bias=None):
    """int8×int8→int32 linear: x [..., in] @ w_q.T [in, out], dequantized by
    the outer product of the dynamic per-token and static per-channel scales.

    The optimization_barrier between quantization and the dot is load-bearing:
    without it the remote TPU compiler hangs (>30 min, reproduced twice) when
    fusing the round/clip chain into the int8 matmul at ViT-S shapes
    ([12608, 384] × [384, 1536]); with it the same program compiles in ~100 s
    cold / seconds cached. Cost: the int8 activations materialize in HBM —
    1/4 the bytes of the fp32 tensor they replace."""
    x_q, x_scale = _q8_act(x)
    x_q, x_scale = jax.lax.optimization_barrier((x_q, x_scale))
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale[..., None] * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def q8_linear_wo(x, w_q, w_scale, bias=None):
    """Weight-only (W8A16) linear: the int8 weight dequantizes to bf16 —
    full-precision f32 dequant rounded once to bf16, an elementwise chain
    XLA fuses into the dot's operand read — and the matmul runs bf16×bf16
    with f32 accumulation. No activation quantization chain, no
    optimization_barrier needed (the w8a8 compile hang was in the act
    round/clip fusion)."""
    w = (w_q.astype(jnp.float32) * w_scale[:, None]).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


_Q8_LINEAR = {"w8a8": q8_linear, "w8a16": q8_linear_wo}


def _q8_block(params, prefix, x, cfg: ViTConfig, bias, freqs_cis, impl,
              mode: str = "w8a8"):
    """Serving twin of models.vit._block_body (eval path only — no dropout),
    with the four block linears quantized; LN/attention-inner/softmax fp32.
    `impl` dispatches the attention core exactly like the fp32 path (the
    Pallas streaming kernel owns N > 2048 under "auto")."""
    lin = _Q8_LINEAR[mode]
    eps = cfg.layer_norm_eps
    h = _layer_norm(x, params[f"{prefix}.norm1.weight"],
                    params[f"{prefix}.norm1.bias"], eps)
    bsz, n, e = h.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    qkv = lin(h, params[f"{prefix}.attn.qkv.weight:q8"],
                    params[f"{prefix}.attn.qkv.weight:scale"])
    qkv = qkv.reshape(bsz, n, 3, nh, dh).transpose(2, 0, 3, 1, 4)
    if impl == "flash":
        if isinstance(bias, tuple):  # generated-bias marker (_logits_bias)
            gen = ({"poly": (bias[0], cfg.grid_size)}
                   if cfg.pos_encoding == "polynomial"
                   else {"rel": bias[0]})
            attn_out = flash_attention.flash_attention(
                qkv[0], qkv[1], qkv[2], dh ** -0.5, freqs_cis=freqs_cis,
                **gen)
        else:
            attn_out = flash_attention.flash_attention(
                qkv[0], qkv[1], qkv[2], dh ** -0.5, bias=bias,
                freqs_cis=freqs_cis)
    else:
        attn_out = reference_attention.attention(
            qkv[0], qkv[1], qkv[2], dh ** -0.5, bias=bias,
            freqs_cis=freqs_cis)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(bsz, n, e)
    attn_out = lin(attn_out, params[f"{prefix}.attn.proj.weight:q8"],
                         params[f"{prefix}.attn.proj.weight:scale"],
                         params[f"{prefix}.attn.proj.bias"])
    x = x + attn_out
    h = _layer_norm(x, params[f"{prefix}.norm2.weight"],
                    params[f"{prefix}.norm2.bias"], eps)
    h = lin(h, params[f"{prefix}.mlp.fc1.weight:q8"],
                  params[f"{prefix}.mlp.fc1.weight:scale"],
                  params[f"{prefix}.mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = lin(h, params[f"{prefix}.mlp.fc2.weight:q8"],
                  params[f"{prefix}.mlp.fc2.weight:scale"],
                  params[f"{prefix}.mlp.fc2.bias"])
    return x + h


def apply_q8(qparams: dict, images, cfg: ViTConfig, mode: str = "w8a8"):
    """Quantized forward: [B, H, W, C] float images -> [B, classes] logits.
    Mirrors models.vit.apply / forward_features (eval semantics).
    mode: "w8a8" (int8 MXU, f32 activations) or "w8a16" (weight-only —
    bf16 activations, int8 weights dequantized in the matmul fusion)."""
    if mode not in _Q8_LINEAR:
        raise ValueError(f"unknown int8 mode {mode!r}; "
                         f"options: {sorted(_Q8_LINEAR)}")
    lin = _Q8_LINEAR[mode]
    adtype = jnp.bfloat16 if mode == "w8a16" else jnp.float32
    pe_mod = pe_registry.get(cfg.pos_encoding)
    b, e = images.shape[0], cfg.embed_dim
    x = patchify(images.astype(adtype), cfg)
    x = lin(x, qparams["patch_embed.weight:q8"],
            qparams["patch_embed.weight:scale"],
            qparams["patch_embed.bias"])
    cls = jnp.broadcast_to(qparams["cls_token"].astype(x.dtype),
                           (b, 1, e))
    x = jnp.concatenate([cls, x], axis=1)

    bias = freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(qparams, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        # Same bias-or-marker logic as the fp32 twin: in the streaming-
        # polynomial regime the kernel generates bias tiles in-kernel from
        # the (unquantized) coefficients instead of materializing [H, N, N].
        bias = _logits_bias(pe_mod, qparams, cfg)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(qparams, cfg)

    impl = _attention_impl(cfg)
    for i in range(cfg.depth):
        x = _q8_block(qparams, f"blocks.{i}", x, cfg, bias, freqs_cis, impl,
                      mode)
    x = _layer_norm(x, qparams["norm.weight"], qparams["norm.bias"],
                    cfg.layer_norm_eps)
    logits = lin(x[:, 0], qparams["head.weight:q8"],
                 qparams["head.weight:scale"], qparams["head.bias"])
    return logits.astype(jnp.float32)
