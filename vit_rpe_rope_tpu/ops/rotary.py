"""Rotary rotation math — half-split convention
(/root/reference/models/rope_utils.py:1-66; SURVEY.md Q4).

Treats (x[..., :D/2], x[..., D/2:]) as (real, imaginary) halves and rotates by
the phase whose (cos, sin) are supplied:

    rot(x) = cat(x1·cos − x2·sin, x1·sin + x2·cos)

NOT the interleaved-pairs convention — checkpoint/numeric parity depends on
this. cos/sin broadcast as [S, D/2] (axial, shared across heads) or
[H, S, D/2] (mixed, per-head) against x of shape [..., H, S, D].
"""

from __future__ import annotations

import jax.numpy as jnp


def broadcast_freqs(cos, sin, ndim: int):
    """Insert leading axes so cos/sin broadcast against a rank-`ndim` [..., H,
    S, D/2] tensor: [S, D/2] -> [1, 1, S, D/2]; [H, S, D/2] -> [1, H, S, D/2]
    (reference reshape_for_broadcast, rope_utils.py:39-66)."""
    if cos.ndim not in (2, 3) or ndim != 4:
        raise ValueError(
            f"Unexpected tensor shapes: freqs rank {cos.ndim} vs target rank {ndim}"
        )
    while cos.ndim < ndim:
        cos, sin = cos[None], sin[None]
    return cos, sin


def rotate_half_split(x, cos, sin):
    """Apply the half-split rotation to x[..., D] with cos/sin[..., D/2]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def apply_rotary_emb(q, k, cos, sin):
    """Rotate q and k of shape [B, H, N, D]; cos/sin [S|H,S, D/2] where S = N
    (callers exclude the cls token before rotation — SURVEY.md Q2)."""
    cos, sin = broadcast_freqs(cos, sin, q.ndim)
    return rotate_half_split(q, cos, sin), rotate_half_split(k, cos, sin)
