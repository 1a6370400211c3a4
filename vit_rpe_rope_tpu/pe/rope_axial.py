"""RoPE-Axial: fixed axial frequency bands
(/root/reference/models/positional_encoding.py:173-245).

head_dim is split into 4 bands (x/y axis × re/im): half_dim = head_dim // 4
frequency bands per axis, inv_freq[i] = 1 / theta^(i / half_dim). Phases are
cat(t_x ⊗ inv_freq, t_y ⊗ inv_freq) -> [S, head_dim/2]; the rotation itself is
half-split (NOT interleaved) — SURVEY.md Q4. inv_freq is a non-trainable torch
buffer in the reference state_dict ("pos_embed.inv_freq").

No trainable parameters.
"""

from __future__ import annotations

import jax.numpy as jnp

from vit_rpe_rope_tpu.configs import PE_KIND_QK_ROTATION

KIND = PE_KIND_QK_ROTATION


def init_params(key, cfg):
    del key, cfg
    return {}


def inv_freq(cfg):
    half_dim = cfg.head_dim // 4
    return 1.0 / (
        cfg.rope_theta ** (jnp.arange(half_dim, dtype=jnp.float32) / half_dim)
    )


def buffers(cfg):
    return {"pos_embed.inv_freq": inv_freq(cfg)}


def t_xy(grid_size: int):
    """Flat-index -> (column, row) coordinates of the square patch grid."""
    t = jnp.arange(grid_size * grid_size, dtype=jnp.float32)
    return t % grid_size, t // grid_size


def freqs_cis(params, cfg):
    """-> (cos, sin), each [num_patches, head_dim/2] float32."""
    del params  # no trainables; frequencies derive from theta alone
    inv = inv_freq(cfg)
    t_x, t_y = t_xy(cfg.grid_size)
    phases = jnp.concatenate(
        [jnp.outer(t_x, inv), jnp.outer(t_y, inv)], axis=-1
    )  # [S, head_dim/2]
    return jnp.cos(phases), jnp.sin(phases)
