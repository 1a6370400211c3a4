"""RoPE-Mixed: learnable per-head mixed-axis frequencies
(/root/reference/models/positional_encoding.py:247-351).

Learnable parameter "pos_embed.freqs" of shape [2, num_heads, head_dim/2]
(x-frequencies and y-frequencies). Init (per head h, random angle
a_h ~ U[0, 2π)):

    mag  = 1 / theta^(arange(0, dim, 4)[: dim//4] / dim)      # note: / dim
    fx_h = cat(mag·cos(a_h), mag·cos(π/2 + a_h))
    fy_h = cat(mag·sin(a_h), mag·sin(π/2 + a_h))

Phase: phase[h, s, :] = t_x[s]·fx_h + t_y[s]·fy_h -> cos/sin [H, S, dim/2].

Q1 quirk (SURVEY.md): the reference computes the phase with a broadcast matmul
yielding memory layout [H, S, D/2] but then reinterprets the raw buffer via
.view(S, H, -1).permute(1, 0, 2); when H != S this scrambles (head, position,
freq-slot) triples deterministically. The clean einsum is the default here;
cfg.rope_mixed_compat_scramble=True reproduces the reference reinterpretation
(both torch and jnp are row-major, so a reshape performs the identical
reinterpretation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_rpe_rope_tpu.configs import PE_KIND_QK_ROTATION
from vit_rpe_rope_tpu.pe.rope_axial import t_xy

KIND = PE_KIND_QK_ROTATION


def init_freqs(key, head_dim: int, num_heads: int, theta: float):
    """Initial [2, num_heads, head_dim/2] frequency parameter."""
    # Exponents arange(0, dim, 4)[: dim//4] / dim — denominator is the FULL
    # head_dim (not head_dim/4), per the reference (:271).
    exps = jnp.arange(0, head_dim, 4, dtype=jnp.float32)[: head_dim // 4]
    mag = 1.0 / (theta ** (exps / head_dim))  # [dim/4]
    angles = jax.random.uniform(
        key, (num_heads, 1), minval=0.0, maxval=2.0 * jnp.pi
    )  # one random phase angle per head
    fx = jnp.concatenate(
        [mag * jnp.cos(angles), mag * jnp.cos(jnp.pi / 2 + angles)], axis=-1
    )  # [H, dim/2]
    fy = jnp.concatenate(
        [mag * jnp.sin(angles), mag * jnp.sin(jnp.pi / 2 + angles)], axis=-1
    )
    return jnp.stack([fx, fy], axis=0)  # [2, H, dim/2]


def init_params(key, cfg):
    return {
        "pos_embed.freqs": init_freqs(
            key, cfg.head_dim, cfg.num_heads, cfg.rope_theta
        )
    }


def buffers(cfg):
    del cfg
    return {}


def freqs_cis(params, cfg):
    """-> (cos, sin), each [num_heads, num_patches, head_dim/2] float32."""
    freqs = params["pos_embed.freqs"].astype(jnp.float32)  # [2, H, D/2]
    t_x, t_y = t_xy(cfg.grid_size)  # [S]
    s, h = t_x.shape[0], cfg.num_heads
    # Clean semantics: phase[h, s, d] = t_x[s]·fx[h, d] + t_y[s]·fy[h, d].
    phase_x = jnp.einsum("s,hd->hsd", t_x, freqs[0])
    phase_y = jnp.einsum("s,hd->hsd", t_y, freqs[1])
    if cfg.rope_mixed_compat_scramble:
        # Reference memory reinterpretation (Q1): row-major [H, S, D/2]
        # buffer read back as [S, H, D/2], then transposed to [H, S, D/2].
        # (Not an identity even when H == S — it transposes (h, s) there.)
        d2 = phase_x.shape[-1]
        phase_x = phase_x.reshape(s, h, d2).transpose(1, 0, 2)
        phase_y = phase_y.reshape(s, h, d2).transpose(1, 0, 2)
    phases = phase_x + phase_y
    return jnp.cos(phases), jnp.sin(phases)
