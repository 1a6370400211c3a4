"""Unfused jnp multi-head attention — the trusted oracle
(direct functional counterpart of /root/reference/models/vit.py:43-94).

Used (a) as the numerics oracle for the Pallas fused kernel's parity tests
and (b) as the fallback attention implementation on non-TPU backends.

PE plugs in through exactly the three modes the reference supports
(SURVEY.md §2.3): q/k rotation (cos/sin supplied, cls token excluded),
additive logits bias [H, N, N], or neither.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from vit_rpe_rope_tpu.ops.rotary import apply_rotary_emb


def rotate_qk_skip_cls(q, k, freqs_cis):
    """Rotate q/k [B, H, N, D] on tokens 1..N-1, leaving the cls token
    (index 0) unrotated (/root/reference/models/vit.py:56-68)."""
    cos, sin = freqs_cis
    q_rot, k_rot = apply_rotary_emb(q[:, :, 1:], k[:, :, 1:], cos, sin)
    q = jnp.concatenate([q[:, :, :1], q_rot], axis=2)
    k = jnp.concatenate([k[:, :, :1], k_rot], axis=2)
    return q, k


def attention(q, k, v, scale, bias=None, freqs_cis=None, dropout_rate=0.0,
              dropout_key=None):
    """Scaled dot-product MHA over [B, H, N, D] inputs.

    bias: optional [H, N, N] additive logits bias (relative / polynomial).
    freqs_cis: optional (cos, sin) for rotary PE (axial / mixed).
    dropout_rate/dropout_key: optional train-mode dropout on the softmax
    probabilities (reference Attention.attn_drop,
    /root/reference/models/vit.py:36,85).
    Returns [B, H, N, D]. Softmax statistics are computed in float32.
    """
    if freqs_cis is not None:
        q, k = rotate_qk_skip_cls(q, k, freqs_cis)
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias[None].astype(logits.dtype)
    # checkpoint_name: identity in normal execution; under remat_policy
    # "softmax" (models.vit.remat_block_fn) the tagged f32 [B, H, N, N]
    # softmax intermediates are NOT saved for the backward — they are the
    # dense regime's dominant residual HBM traffic, and recomputing the
    # exp/normalize chain from the (saved) logits is nearly free VPU work.
    from jax.ad_checkpoint import checkpoint_name

    # One-pass normalization (round 5): probs = exp(logits - lse) emits the
    # normalized probabilities in a SINGLE full-size elementwise pass over
    # the f32 logits instead of exp-then-divide's two. The unnormalized
    # exp(logits - m) never reaches HBM (it only feeds the sum-reduce, so
    # XLA fuses it into the reduction); the divide's full-size f32
    # intermediate — written and re-read every attention, forward and
    # backward — disappears. The softmax chains were ~12% of stretch-step
    # device time in docs/logs/r5_profile_stretch_post.json. lse is the
    # max-shifted stable form; values agree with exp/sum to f32 rounding.
    if os.environ.get("ATTN_TWO_PASS_SOFTMAX"):  # A/B: pre-round-5 form
        probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    else:
        m = jax.lax.stop_gradient(
            jnp.max(logits, axis=-1, keepdims=True))
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
        probs = jnp.exp(logits - lse)
    probs = checkpoint_name(probs, "attn_softmax")
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, jnp.zeros_like(probs))
    return jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
