"""Post-training int8 quantization for serving — a deployment capability
with no reference counterpart (the reference serves fp32 eager torch only).

Three modes over the SAME int8 weight artifacts (`quantize_params` output):

  * **W8A8** (`mode="w8a8"`): int8×int8→int32 MXU matmuls (394 TOPS on v5e,
    double the bf16 peak) with per-token dynamic activation scales — no
    calibration set needed; accumulation in int32, dequantized by the
    rank-1 outer product of the two scale vectors.
  * **W8A8-static** (`mode="w8a8-static"`): int8 MXU matmuls with
    per-tensor activation scales CALIBRATED OFFLINE (`calibrate_act_scales`
    over a few representative batches, folded into the artifact as
    `{key}:act_scale` scalars). Serving has NO dynamic quantization chain —
    no per-token abs-max reduction, no scale vector — just a scalar
    multiply/round/clip that XLA fuses into the matmul operand read, so
    nothing needs the w8a8 optimization_barrier workaround and the int8
    matmul keeps its full bandwidth advantage where activations dominate
    (large batch / large model).
  * **W8A16** (`mode="w8a16"`, weight-only): weights dequantize to bf16
    inside the matmul fusion, activations stay bf16 — no activation
    round/clip chain at all. Halves WEIGHT HBM traffic vs bf16 params, so
    it targets the weight-bound serving regime (small batches / latency),
    where W8A8's per-token quantization overhead is pure loss.

  * weights: per-output-channel symmetric int8 (offline, `quantize_params`)
    in all modes — one artifact serves all three (static additionally
    needs the calibration scalars).

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


def quantize_params(params: dict, cfg: ViTConfig,
                    calib_images=None) -> dict:
    """fp32 reference-keyed params -> serving qparams: every matmul weight
    replaced by `{key}:q8` (int8) + `{key}:scale` (f32 per-out-channel);
    everything else passed through as float32.

    calib_images: optional float [B, H, W, C] batch(es) ALREADY preprocessed
    the way `models.vit.apply` expects (normalized/resized — the serving
    layer passes its own preprocess output). When given, per-tensor
    activation scales are calibrated on the ORIGINAL fp32 weights and added
    as `{key}:act_scale` scalars, enabling `mode="w8a8-static"`."""
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
    if calib_images is not None:
        out.update(calibrate_act_scales(params, calib_images, cfg))
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


def q8_linear_static(x, w_q, w_scale, a_scale, bias=None):
    """Static-scale int8×int8→int32 linear: the activation grid is the
    calibrated per-tensor scalar `a_scale` (see calibrate_act_scales), so
    serving runs NO reduction before the matmul — just scalar
    div/round/clip, an elementwise chain XLA fuses into the dot's operand
    read. No optimization_barrier: the w8a8 compile hang lived in fusing
    the DYNAMIC per-token abs-max chain into the int8 matmul; with a
    static scalar there is no reduction to fuse.

    The non-matmul plumbing (LN/softmax/residuals) runs in the CALLER's
    activation dtype — apply_q8 uses bf16 for this mode (like w8a16): the
    int8 grid already dominates the error budget, and fp32 activations
    would double the bandwidth of every vector op between the matmuls.
    The quantization chain itself computes in f32 (a bf16 x/a_scale would
    round before the grid does)."""
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


Q8_MODES = ("w8a8", "w8a8-static", "w8a16")


def _make_lin(qparams: dict, mode: str):
    """Mode-dispatching linear over quantize_params output: lin(x, wkey,
    bias=None) looks up `{wkey}:q8` / `{wkey}:scale` (+ `{wkey}:act_scale`
    for the static mode) and applies the mode's matmul."""
    def lin(x, wkey, bias=None):
        w_q = qparams[wkey + ":q8"]
        w_scale = qparams[wkey + ":scale"]
        if mode == "w8a16":
            return q8_linear_wo(x, w_q, w_scale, bias)
        if mode == "w8a8-static":
            a_key = wkey + ":act_scale"
            if a_key not in qparams:
                raise ValueError(
                    f"mode='w8a8-static' needs calibrated activation scales "
                    f"({a_key} missing) — quantize with "
                    f"quantize_params(params, cfg, calib_images=...)")
            return q8_linear_static(x, w_q, w_scale, qparams[a_key], bias)
        return q8_linear(x, w_q, w_scale, bias)
    return lin


def _q8_block(params, prefix, x, cfg: ViTConfig, bias, freqs_cis, impl,
              lin):
    """Serving twin of models.vit._block_body (eval path only — no dropout),
    with the four block linears through `lin` (see _make_lin — quantized, or
    the calibration observer); LN/attention-inner/softmax fp32. `impl`
    dispatches the attention core exactly like the fp32 path (the Pallas
    streaming kernel owns N > 2048 under "auto")."""
    eps = cfg.layer_norm_eps
    h = _layer_norm(x, params[f"{prefix}.norm1.weight"],
                    params[f"{prefix}.norm1.bias"], eps)
    bsz, n, e = h.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    qkv = lin(h, f"{prefix}.attn.qkv.weight")
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
    attn_out = lin(attn_out, f"{prefix}.attn.proj.weight",
                   params[f"{prefix}.attn.proj.bias"])
    x = x + attn_out
    h = _layer_norm(x, params[f"{prefix}.norm2.weight"],
                    params[f"{prefix}.norm2.bias"], eps)
    h = lin(h, f"{prefix}.mlp.fc1.weight", params[f"{prefix}.mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = lin(h, f"{prefix}.mlp.fc2.weight", params[f"{prefix}.mlp.fc2.bias"])
    return x + h


def _forward_with_lin(params: dict, images, cfg: ViTConfig, lin,
                      adtype=jnp.float32):
    """The shared eval forward (twin of models.vit.apply): every matmul goes
    through `lin(x, wkey, bias=None)`; LN/attention-inner/softmax/PE stay
    float. Drives BOTH the quantized serving modes (lin = _make_lin) and
    offline calibration (lin = the fp32 observer in calibrate_act_scales)."""
    pe_mod = pe_registry.get(cfg.pos_encoding)
    b, e = images.shape[0], cfg.embed_dim
    x = patchify(images.astype(adtype), cfg)
    x = lin(x, "patch_embed.weight", params["patch_embed.bias"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, e))
    x = jnp.concatenate([cls, x], axis=1)

    bias = freqs_cis = None
    if pe_mod.KIND == PE_KIND_EMBED_ADDITIVE:
        x = pe_mod.add_embedding(params, x)
    elif pe_mod.KIND == PE_KIND_LOGITS_BIAS:
        # Same bias-or-marker logic as the fp32 twin: in the streaming-
        # polynomial regime the kernel generates bias tiles in-kernel from
        # the (unquantized) coefficients instead of materializing [H, N, N].
        bias = _logits_bias(pe_mod, params, cfg)
    elif pe_mod.KIND == PE_KIND_QK_ROTATION:
        freqs_cis = pe_mod.freqs_cis(params, cfg)

    impl = _attention_impl(cfg)
    for i in range(cfg.depth):
        x = _q8_block(params, f"blocks.{i}", x, cfg, bias, freqs_cis, impl,
                      lin)
    x = _layer_norm(x, params["norm.weight"], params["norm.bias"],
                    cfg.layer_norm_eps)
    logits = lin(x[:, 0], "head.weight", params["head.bias"])
    return logits.astype(jnp.float32)


def apply_q8(qparams: dict, images, cfg: ViTConfig, mode: str = "w8a8"):
    """Quantized forward: [B, H, W, C] float images -> [B, classes] logits.
    Mirrors models.vit.apply / forward_features (eval semantics).
    mode: "w8a8" (int8 MXU, dynamic per-token scales), "w8a8-static"
    (int8 MXU, offline-calibrated per-tensor scales — no dynamic
    quantization chain), or "w8a16" (weight-only — bf16 activations, int8
    weights dequantized in the matmul fusion)."""
    if mode not in Q8_MODES:
        raise ValueError(f"unknown int8 mode {mode!r}; "
                         f"options: {sorted(Q8_MODES)}")
    adtype = jnp.float32 if mode == "w8a8" else jnp.bfloat16
    return _forward_with_lin(qparams, images, cfg, _make_lin(qparams, mode),
                             adtype)


def calibrate_act_scales(params: dict, calib_images, cfg: ViTConfig) -> dict:
    """Offline activation-scale calibration for mode="w8a8-static": run the
    fp32 eval forward over calibration batches, recording the abs-max of the
    INPUT of every quantized matmul site; return `{wkey}:act_scale` scalars
    (abs-max / 127, one per site — per-tensor symmetric grid).

    params: ORIGINAL fp32 reference-keyed params (not quantize_params
    output) so the observed activations carry no weight-quantization error.
    calib_images: one float [B, H, W, C] array or a list of them, already
    preprocessed the way models.vit.apply expects. Runs eagerly (no jit) —
    calibration is a one-time offline pass."""
    absmax: dict = {}

    def observer(x, wkey, bias=None):
        xf = x.astype(jnp.float32)
        m = jnp.max(jnp.abs(xf))
        absmax[wkey] = m if wkey not in absmax \
            else jnp.maximum(absmax[wkey], m)
        w = jnp.asarray(params[wkey], jnp.float32)
        if wkey == "patch_embed.weight":
            w = w.reshape(w.shape[0], -1)
        y = jnp.einsum("...i,oi->...o", xf, w)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    batches = calib_images if isinstance(calib_images, (list, tuple)) \
        else [calib_images]
    for images in batches:
        _forward_with_lin(params, jnp.asarray(images), cfg, observer)
    return {wkey + ":act_scale":
            jnp.maximum(m, 1e-12).astype(jnp.float32) / 127.0
            for wkey, m in absmax.items()}
