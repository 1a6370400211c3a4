"""Learnable absolute positional encoding (APE)
(/root/reference/models/positional_encoding.py:23-40).

A learnable [1, max_len=5000, d_model] table, trunc_normal(0.02) init, added
to every token EXCEPT the cls token (token 0 receives no position — SURVEY.md
Q2/Q6). The reference mutates x in place; the functional equivalent is
x.at[:, 1:].add(...), numerically identical.
"""

from __future__ import annotations

from vit_rpe_rope_tpu.configs import PE_KIND_EMBED_ADDITIVE
from vit_rpe_rope_tpu.utils.initializers import trunc_normal

KIND = PE_KIND_EMBED_ADDITIVE
MAX_LEN = 5000  # reference default (/root/reference/models/positional_encoding.py:30)


def init_params(key, cfg):
    return {
        "pos_embed.pos_embed": trunc_normal(
            key, (1, MAX_LEN, cfg.embed_dim), std=0.02
        )
    }


def buffers(cfg):
    del cfg
    return {}


def add_embedding(params, x):
    """x: [B, L, E] with cls at index 0; adds table[:L-1] to tokens 1..L-1."""
    table = params["pos_embed.pos_embed"]
    n = x.shape[1]
    return x.at[:, 1:].add(table[:, : n - 1].astype(x.dtype))
