"""PE similarity analytics — numpy port of the reference's per-method
similarity matrices (/root/reference/pe_similarity_visualizer.py:180-423).

Each function returns (similarity [S, S] float array, grid_size). Semantics
mirror the reference exactly:
* absolute — cosine similarity of the learned embeddings (zeros probe through
  the additive table, cls stripped);
* relative / polynomial — get_bias() averaged over heads, cls row/col
  stripped, normalized by the absolute max into [-1, 1];
* rope-axial / rope-mixed — rotate an all-ones probe vector to every
  position, cosine similarity between positions (mixed selects one head).
"""

from __future__ import annotations

import numpy as np

from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.pe import polynomial, relative, rope_axial, rope_mixed


def _cfg(grid_size, num_heads, head_dim=32, poly_degree=3,
         poly_shared=True, rope_theta=100.0, pe="none", compat=False):
    return ViTConfig(
        img_size=grid_size * 4, patch_size=4, embed_dim=num_heads * head_dim,
        num_heads=num_heads, depth=1, pos_encoding=pe,
        poly_degree=poly_degree, poly_shared_heads=poly_shared,
        rope_theta=rope_theta, rope_mixed_compat_scramble=compat)


def _cosine_sim(x):
    x = np.asarray(x, np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.maximum(norms, 1e-12)
    return (xn @ xn.T).astype(np.float32)


def absolute_similarity(table, grid_size):
    """table: [1, max_len, d] learned APE. Embeddings for patch tokens are
    rows 0..S-1 of the table (the cls token receives no position)."""
    s = grid_size * grid_size
    emb = np.asarray(table)[0, :s, :]
    return _cosine_sim(emb), grid_size


def _bias_similarity(bias):
    bias = np.asarray(bias, np.float32)
    if bias.ndim == 3:
        bias = bias.mean(axis=0)
    seq = bias.shape[0] - 1
    grid = int(np.sqrt(seq))
    bias = bias[1:, 1:]  # strip cls row/col
    peak = np.abs(bias).max()
    if peak > 0:
        bias = bias / peak
    return bias, grid


def relative_similarity(table, grid_size):
    del grid_size  # grid comes from the table itself
    seq_len = (table.shape[1] + 1) // 2
    cfg = _cfg(int(np.sqrt(seq_len - 1)), table.shape[0], pe="relative")
    bias = relative.attn_bias(
        {"pos_embed.relative_position_bias_table": table}, cfg)
    return _bias_similarity(np.asarray(bias))


def polynomial_similarity(coeff, grid_size, num_heads=6):
    coeff = np.asarray(coeff)
    shared = coeff.ndim == 1
    heads = num_heads if shared else coeff.shape[0]
    cfg = _cfg(grid_size, heads, poly_degree=coeff.shape[-1] - 1,
               poly_shared=shared, pe="polynomial")
    bias = polynomial.attn_bias({"pos_embed.coefficients": coeff}, cfg)
    return _bias_similarity(np.asarray(bias))


def _rotated_ones(cos, sin):
    """Rotate the all-ones probe to every position: [S, D] given [S, D/2]."""
    ones = np.ones_like(cos)
    return np.concatenate([ones * cos - ones * sin, ones * sin + ones * cos],
                          axis=-1)


def rope_axial_similarity(inv_freq, grid_size, rope_theta=100.0):
    head_dim = 4 * int(np.asarray(inv_freq).shape[0])
    cfg = _cfg(grid_size, 1, head_dim=head_dim, rope_theta=rope_theta,
               pe="rope-axial")
    cos, sin = rope_axial.freqs_cis({}, cfg)
    rot = _rotated_ones(np.asarray(cos), np.asarray(sin))
    return _cosine_sim(rot), grid_size


def rope_mixed_similarity(freqs, grid_size, head_idx=0, compat_scramble=False):
    """compat_scramble reproduces the reference's Q1 (head, position) memory
    reinterpretation — required when introspecting reference-trained or
    compat-trained checkpoints."""
    freqs = np.asarray(freqs)
    num_heads, head_dim = freqs.shape[1], 2 * freqs.shape[2]
    cfg = _cfg(grid_size, num_heads, head_dim=head_dim, pe="rope-mixed",
               compat=compat_scramble)
    cos, sin = rope_mixed.freqs_cis({"pos_embed.freqs": freqs}, cfg)
    rot = _rotated_ones(np.asarray(cos)[head_idx], np.asarray(sin)[head_idx])
    return _cosine_sim(rot), grid_size


def similarity_for(pe_model, grid_size=None, head_idx=0, num_heads=6,
                   rope_theta=100.0, compat_scramble=False):
    """Dispatch on an introspect.PEModel (or method + params dict)."""
    g = grid_size or pe_model.grid_size
    m, p = pe_model.method, pe_model.params
    if m == "absolute":
        return absolute_similarity(p["pos_embed.pos_embed"], g)
    if m == "relative":
        return relative_similarity(
            np.asarray(p["pos_embed.relative_position_bias_table"]), g)
    if m == "polynomial":
        return polynomial_similarity(
            np.asarray(p["pos_embed.coefficients"]), g,
            num_heads=pe_model.num_heads or num_heads)
    if m == "rope-axial":
        return rope_axial_similarity(
            np.asarray(p["pos_embed.inv_freq"]), min(g, 8),
            rope_theta=rope_theta)
    if m == "rope-mixed":
        return rope_mixed_similarity(
            np.asarray(p["pos_embed.freqs"]), min(g, 8), head_idx=head_idx,
            compat_scramble=compat_scramble)
    raise ValueError(f"No similarity defined for method {m}")


def block_matrix(sim, grid_size):
    """Compact full-matrix view: canvas [g², g²] where block (i, j) holds the
    similarity map of position (i, j) against all positions, reshaped [g, g]
    (/root/reference/pe_similarity_visualizer.py:632-680)."""
    g = grid_size
    canvas = np.zeros((g * g, g * g), np.float32)
    for i in range(g):
        for j in range(g):
            p = i * g + j
            canvas[i * g:(i + 1) * g, j * g:(j + 1) * g] = sim[p].reshape(g, g)
    return canvas
