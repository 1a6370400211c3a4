"""Polynomial relative position bias (Poly-RPE)
(/root/reference/models/positional_encoding.py:97-171).

bias[h, p, q] = sum_k coeff[(h,)k] * L1(p, q)^k over patch-grid coordinates,
zero row/col for the cls token (SURVEY.md Q2). Coefficients are learnable:
[degree+1] shared across heads, or [num_heads, degree+1] per-head.

The reference recomputes this bias inside EVERY block's attention per forward
(SURVEY.md Q5); here it is generated once per step and reused (pure win — XLA
would CSE it anyway under jit).

Grid-coordinate note: the reference names its axes so "y" varies fastest
(repeat) and "x" slowest (repeat_interleave) — the opposite of the RoPE
modules — but the L1 distance is symmetric in the two axes, so the bias is
identical either way; we use (p % g, p // g).
"""

from __future__ import annotations

import jax.numpy as jnp

from vit_rpe_rope_tpu.configs import PE_KIND_LOGITS_BIAS
from vit_rpe_rope_tpu.utils.initializers import trunc_normal

KIND = PE_KIND_LOGITS_BIAS


def init_params(key, cfg):
    if cfg.poly_shared_heads:
        shape = (cfg.poly_degree + 1,)
    else:
        shape = (cfg.num_heads, cfg.poly_degree + 1)
    return {"pos_embed.coefficients": trunc_normal(key, shape, std=0.02)}


def buffers(cfg):
    del cfg
    return {}


def coeff_per_head(params, cfg):
    """[num_heads, degree+1] float32 coefficients (shared coeffs broadcast —
    the broadcast is transposable, so per-head gradients sum back onto the
    shared parameter automatically). Consumed by the streaming flash path,
    which generates the bias in-kernel from these instead of materializing
    the [H, N, N] tensor (ops/flash_attention._poly_tile)."""
    coeff = params["pos_embed.coefficients"].astype(jnp.float32)
    if coeff.ndim == 1:
        coeff = jnp.broadcast_to(coeff[None], (cfg.num_heads, coeff.shape[0]))
    return coeff


def _l1_distance(grid_size: int):
    p = jnp.arange(grid_size * grid_size)
    a, b = p % grid_size, p // grid_size
    return (
        jnp.abs(a[:, None] - a[None, :]) + jnp.abs(b[:, None] - b[None, :])
    ).astype(jnp.float32)


def attn_bias(params, cfg):
    """-> [num_heads, L, L] with zeroed cls row/col."""
    coeff = params["pos_embed.coefficients"]
    g, n = cfg.grid_size, cfg.num_patches
    l1 = _l1_distance(g)  # [P, P]
    # poly_features[p, q, k] = l1^k, k = 0..degree (l1^0 == 1)
    powers = jnp.stack(
        [l1**k for k in range(cfg.poly_degree + 1)], axis=-1
    )  # [P, P, deg+1]
    if cfg.poly_shared_heads:
        patch_bias = powers @ coeff  # [P, P]
        patch_bias = jnp.broadcast_to(patch_bias, (cfg.num_heads, n, n))
    else:
        patch_bias = jnp.einsum("pqk,hk->hpq", powers, coeff)
    # cls token gets zero bias against everything (row/col 0).
    return jnp.zeros((cfg.num_heads, n + 1, n + 1), patch_bias.dtype).at[
        :, 1:, 1:
    ].set(patch_bias)
