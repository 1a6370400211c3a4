"""Pallas fused flash attention with in-kernel PE (placeholder).

Will fuse: q/k rotary rotation (axial shared / mixed per-head cos-sin),
additive [H, L, L] bias tiles, online softmax — so the [B, H, N, N] logits
never round-trip HBM (SURVEY.md §2 #19). Until the kernel lands, this
delegates to the unfused jnp oracle so `attention_impl="flash"` stays valid.
"""

from __future__ import annotations

from vit_rpe_rope_tpu.ops import reference_attention


def flash_attention(q, k, v, scale, bias=None, freqs_cis=None):
    return reference_attention.attention(
        q, k, v, scale, bias=bias, freqs_cis=freqs_cis
    )
