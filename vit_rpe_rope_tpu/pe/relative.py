"""1-D relative position bias table
(/root/reference/models/positional_encoding.py:42-95).

Learnable table [num_heads, 2L-1] where L = num_patches + 1 (cls INCLUDED in
the relative indexing, unlike polynomial — SURVEY.md Q2). The index matrix is
over the flattened 1-D token index, NOT 2-D bucketed (SURVEY.md Q3):
idx[i, j] = clamp(i - j + L - 1, 0, 2L-2). The index matrix is a registered
buffer named "pos_embed.relative_position_index" in the reference state_dict.
"""

from __future__ import annotations

import jax.numpy as jnp

from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
from vit_rpe_rope_tpu.utils.initializers import trunc_normal

KIND = PE_KIND_LOGITS_BIAS


def _index_matrix(seq_len: int):
    coords = jnp.arange(seq_len)
    rel = coords[:, None] - coords[None, :] + (seq_len - 1)
    return jnp.clip(rel, 0, 2 * seq_len - 2)


def init_params(key, cfg):
    table_size = 2 * cfg.seq_len - 1
    return {
        "pos_embed.relative_position_bias_table": trunc_normal(
            key, (cfg.num_heads, table_size), std=0.02
        )
    }


def buffers(cfg):
    return {
        "pos_embed.relative_position_index": _index_matrix(cfg.seq_len).astype(
            jnp.int32
        )
    }


def table_per_head(params, cfg):
    """[num_heads, 2L-1] learnable table — consumed by the streaming flash
    path, which expands Toeplitz bias tiles in-kernel from it instead of
    materializing [H, L, L] (ops/flash_attention._rel_tile)."""
    del cfg
    return params["pos_embed.relative_position_bias_table"]


def attn_bias(params, cfg):
    """-> [num_heads, L, L] gathered from the table."""
    table = params["pos_embed.relative_position_bias_table"]
    idx = _index_matrix(cfg.seq_len)
    return table[:, idx]
