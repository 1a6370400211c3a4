"""EXPERIMENTAL block-level custom_vjp: one differentiation boundary per
transformer block instead of one per attention call.

Why: three measurement rounds (ROADMAP.md round-1..3 closures) showed the
Pallas dense attention kernels reach STANDALONE parity with XLA at the
reference shapes (N=197: fwd 22.6 vs 24.5 µs, fwd+bwd 1079 vs 1038 µs) yet
lose ~25% in-model — the attention-level `jax.custom_vjp` is an opaque wall
at the hottest point of the block, so XLA cannot fuse the qkv/proj matmul
epilogues into their neighbors or schedule across it. ROADMAP round-1 named
the untried variant: move the boundary to the BLOCK edges (the residual
stream), where the only thing crossing is the [B, N, E] activation and
there is nothing left to fuse across.

This module is that experiment: `block_apply(cfg, block_params, x,
freqs_cis)` computes models.vit._block_body's eval math (pre-LN block,
exact-erf GELU, the round-4 qkv/proj layout-fused einsums) with the
attention forward/backward going straight to the RAW Pallas drivers
(`flash_attention._forward` / `._bwd` — bypassing their per-call
custom_vjp), and the rest of the block's backward hand-written so the whole
block is ONE custom_vjp. Residuals saved: x, x2, f1, q, k, v, attention out
(+ lse above the streaming threshold) — the LN statistics and the GELU are
recomputed in the backward (cheap vector work; saves their HBM residuals).

Scope (experiment, guarded by the caller): bias-free PE modes (none /
rope-axial / rope-mixed incl. learnable-frequency gradients) and no
dropout — exactly the flagship/stretch regime the measurement targets.
Engaged via `attention_impl="flash_block"` ([extension] CLI choice).

Reference parity anchor: same block semantics as
/root/reference/models/vit.py:60-106 (Attention + Mlp in a pre-LN Block);
gradient parity vs the autodiff path is enforced by tests/test_block_vjp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_rpe_rope_tpu.ops import flash_attention as fa

_SQRT_2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _ln_fwd(x, w, b, eps):
    """f32-internal LayerNorm (same convention as models.vit._layer_norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _ln_bwd(dh, x, w, eps):
    """Hand-written LayerNorm backward (recomputes the statistics from the
    saved INPUT instead of carrying μ/σ residuals — vector-cheap).
    Returns (dx in x.dtype, dw f32, db f32)."""
    xf = x.astype(jnp.float32)
    dhf = dh.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    sinv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * sinv
    dw = jnp.sum(dhf * xhat, axis=tuple(range(x.ndim - 1)))
    db = jnp.sum(dhf, axis=tuple(range(x.ndim - 1)))
    dxhat = dhf * w.astype(jnp.float32)
    dx = sinv * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype), dw, db


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _gelu_grad(x):
    """d/dx of exact-erf GELU: Φ(x) + x·φ(x), computed in f32."""
    xf = x.astype(jnp.float32)
    phi_cdf = 0.5 * (1.0 + jax.lax.erf(xf / _SQRT_2))
    phi_pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * xf * xf)
    return phi_cdf + xf * phi_pdf


def _mm(eq, a, b, out_dtype):
    return jnp.einsum(eq, a, b,
                      preferred_element_type=jnp.float32).astype(out_dtype)


def _primal(cfg, bp, x, freqs_cis, want_residuals):
    eps = cfg.layer_norm_eps
    nh, dh = cfg.num_heads, cfg.head_dim
    e = x.shape[-1]
    cdt = x.dtype
    h1 = _ln_fwd(x, bp["norm1.weight"], bp["norm1.bias"], eps)
    wq3 = bp["attn.qkv.weight"].reshape(3, nh, dh, e).astype(cdt)
    qkv = _mm("bne,thde->tbhnd", h1, wq3, cdt)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = dh ** -0.5
    if want_residuals:
        ao, lse = fa._forward(q, k, v, scale, None, freqs_cis, want_lse=True)
    else:
        ao, lse = fa._forward(q, k, v, scale, None, freqs_cis), None
    wp3 = bp["attn.proj.weight"].reshape(e, nh, dh).astype(cdt)
    p = _mm("bhnd,ohd->bno", ao, wp3, cdt) + bp["attn.proj.bias"].astype(cdt)
    x2 = x + p
    h2 = _ln_fwd(x2, bp["norm2.weight"], bp["norm2.bias"], eps)
    f1 = _mm("bni,oi->bno", h2, bp["mlp.fc1.weight"].astype(cdt), cdt) \
        + bp["mlp.fc1.bias"].astype(cdt)
    g1 = _gelu(f1)
    f2 = _mm("bni,oi->bno", g1, bp["mlp.fc2.weight"].astype(cdt), cdt) \
        + bp["mlp.fc2.bias"].astype(cdt)
    y = x2 + f2
    if not want_residuals:
        return y
    return y, (x, x2, f1, q, k, v, ao, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def block_apply(cfg, block_params, x, freqs_cis):
    """One pre-LN transformer block (eval semantics) as a single custom_vjp.
    block_params: the un-prefixed flat block dict (_block_body convention);
    freqs_cis: (cos, sin) rotation tensors or None."""
    return _primal(cfg, block_params, x, freqs_cis, want_residuals=False)


def _block_fwd(cfg, block_params, x, freqs_cis):
    y, res = _primal(cfg, block_params, x, freqs_cis, want_residuals=True)
    return y, (block_params, freqs_cis) + res


def _block_bwd(cfg, res, dy):
    bp, freqs_cis, x, x2, f1, q, k, v, ao, lse = res
    eps = cfg.layer_norm_eps
    nh, dh = cfg.num_heads, cfg.head_dim
    e = x.shape[-1]
    cdt = x.dtype
    f32 = jnp.float32
    lead = tuple(range(dy.ndim - 1))

    # --- MLP tail: y = x2 + fc2(gelu(fc1(LN2(x2)))) ---
    g1 = _gelu(f1)
    dW2 = _mm("bno,bni->oi", dy, g1, f32)
    db2 = jnp.sum(dy.astype(f32), axis=lead)
    dg1 = _mm("bno,oi->bni", dy, bp["mlp.fc2.weight"].astype(cdt), cdt)
    df1 = (dg1.astype(f32) * _gelu_grad(f1)).astype(cdt)
    h2 = _ln_fwd(x2, bp["norm2.weight"], bp["norm2.bias"], eps)
    dW1 = _mm("bno,bni->oi", df1, h2, f32)
    db1 = jnp.sum(df1.astype(f32), axis=lead)
    dh2 = _mm("bno,oi->bni", df1, bp["mlp.fc1.weight"].astype(cdt), cdt)
    dx2_ln, dn2w, dn2b = _ln_bwd(dh2, x2, bp["norm2.weight"], eps)
    dx2 = dy + dx2_ln  # residual branch + LN2 path

    # --- attention tail: x2 = x + proj(attn(qkv(LN1(x)))) ---
    wp3 = bp["attn.proj.weight"].reshape(e, nh, dh)
    dWp3 = _mm("bno,bhnd->ohd", dx2, ao, f32)
    dpb = jnp.sum(dx2.astype(f32), axis=lead)
    dao = _mm("bno,ohd->bhnd", dx2, wp3.astype(cdt), cdt)
    scale = dh ** -0.5
    dq, dk, dv, _, dfreqs, _, _ = fa._bwd(
        scale, 0, (q, k, v, None, freqs_cis, None, None, ao, lse), dao)
    dqkv = jnp.stack([dq.astype(cdt), dk.astype(cdt), dv.astype(cdt)])
    h1 = _ln_fwd(x, bp["norm1.weight"], bp["norm1.bias"], eps)
    dWq3 = _mm("tbhnd,bne->thde", dqkv, h1, f32)
    wq3 = bp["attn.qkv.weight"].reshape(3, nh, dh, e)
    dh1 = _mm("tbhnd,thde->bne", dqkv, wq3.astype(cdt), cdt)
    dx1, dn1w, dn1b = _ln_bwd(dh1, x, bp["norm1.weight"], eps)
    dx = dx2 + dx1

    dbp = {
        "norm1.weight": dn1w, "norm1.bias": dn1b,
        "attn.qkv.weight": dWq3.reshape(3 * e, e),
        "attn.proj.weight": dWp3.reshape(e, e),
        "attn.proj.bias": dpb,
        "norm2.weight": dn2w, "norm2.bias": dn2b,
        "mlp.fc1.weight": dW1, "mlp.fc1.bias": db1,
        "mlp.fc2.weight": dW2, "mlp.fc2.bias": db2,
    }
    # Cotangents must mirror the primal params' dtypes (f32 master weights).
    dbp = {kk: vv.astype(bp[kk].dtype) for kk, vv in dbp.items()}
    if freqs_cis is None:
        dfreqs = None
    elif dfreqs is None:
        dfreqs = (jnp.zeros_like(freqs_cis[0]), jnp.zeros_like(freqs_cis[1]))
    else:
        dfreqs = (dfreqs[0].astype(freqs_cis[0].dtype),
                  dfreqs[1].astype(freqs_cis[1].dtype))
    return dbp, dx, dfreqs


block_apply.defvjp(_block_fwd, _block_bwd)
