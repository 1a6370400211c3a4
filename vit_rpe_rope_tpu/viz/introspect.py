"""Checkpoint introspection: rebuild PE state from a saved state dict by
shape-sniffing the reference key contract (SURVEY.md Q9, §2 #14).

Mirrors the reference loaders' observable behavior
(/root/reference/pe_similarity_visualizer.py:101-178,
/root/reference/rope_visualizer.py:196-297):
* embed_dim inferred from patch_embed.weight [E, C, P, P] or *.qkv.weight
  [3E, E];
* per-method grid/head inference: relative table [H, 2L-1] → L; polynomial
  per-head coefficients [H, deg+1]; rope-axial inv_freq (head_dim = 4·len);
  rope-mixed freqs [2, H, head_dim/2];
* the reference hard-codes grid_size 8 whenever the checkpoint filename
  contains 'cifar10' (:506-509) — preserved.

Reads BOTH our .npz checkpoints and reference torch .pth ones
(utils.checkpoint.load_state handles each).
"""

from __future__ import annotations

import math
import os

import numpy as np

from vit_rpe_rope_tpu.utils import checkpoint


class PEModel:
    """Introspected PE state: method, pe params (pos_embed.* keys),
    architecture facts inferred from shapes."""

    def __init__(self, method, params, embed_dim, num_heads, head_dim,
                 grid_size, extra=None):
        self.method = method
        self.params = params
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.grid_size = grid_size
        self.extra = extra or {}


def infer_embed_dim(state: dict) -> int | None:
    if "patch_embed.weight" in state:
        return int(state["patch_embed.weight"].shape[0])
    for k, v in state.items():
        if k.endswith(".qkv.weight"):
            return int(v.shape[1])
        if k.endswith(".qkv.bias"):
            return int(v.shape[0]) // 3
    return None


def grid_from_filename(path: str, default: int) -> int:
    """Reference quirk: 'cifar10' in the checkpoint name forces grid 8."""
    if "cifar10" in os.path.basename(path):
        return 8
    return default


def load_pe_model(path: str, method: str, grid_size: int = 14,
                  num_heads: int = 6, rope_theta: float = 100.0) -> PEModel:
    state = checkpoint.load_state(path)
    pe_params = {k: np.asarray(v) for k, v in state.items()
                 if k.startswith("pos_embed.")}
    embed_dim = infer_embed_dim(state) or 192
    grid = grid_from_filename(path, grid_size)
    head_dim = embed_dim // num_heads

    required = {
        "absolute": "pos_embed.pos_embed",
        "relative": "pos_embed.relative_position_bias_table",
        "polynomial": "pos_embed.coefficients",
        "rope-axial": "pos_embed.inv_freq",
        "rope-mixed": "pos_embed.freqs",
    }
    need = required.get(method)
    if need is not None and need not in pe_params:
        guesses = [m for m, k in required.items() if k in pe_params]
        raise ValueError(
            f"checkpoint {path} has no '{need}' — it does not look like a "
            f"'{method}' model (pos_embed keys present: "
            f"{sorted(pe_params) or 'none'}"
            + (f"; looks like {guesses}" if guesses else "") + ")")

    if method == "relative":
        table = pe_params["pos_embed.relative_position_bias_table"]
        num_heads = int(table.shape[0])
        seq_len = (int(table.shape[1]) + 1) // 2  # 2L-1 -> L
        g = int(math.isqrt(seq_len - 1))
        if g * g == seq_len - 1:
            grid = g
        head_dim = embed_dim // num_heads
    elif method == "polynomial":
        coeff = pe_params["pos_embed.coefficients"]
        if coeff.ndim == 2:
            num_heads = int(coeff.shape[0])
        head_dim = embed_dim // num_heads
    elif method == "rope-axial":
        inv_freq = pe_params["pos_embed.inv_freq"]
        head_dim = 4 * int(inv_freq.shape[0])
    elif method == "rope-mixed":
        freqs = pe_params["pos_embed.freqs"]
        num_heads = int(freqs.shape[1])
        head_dim = 2 * int(freqs.shape[2])
    elif method == "absolute":
        pass  # max_len table carries no grid information
    else:
        raise ValueError(f"Unsupported model_config: {method}")
    return PEModel(method, pe_params, embed_dim, num_heads, head_dim, grid)


def discover_checkpoints(ckpt_dir: str, methods) -> dict:
    """Auto-discovery: {method: path} for every
    {ckpt_dir}/cifar10_{method}_best.{npz,pth} that exists
    (/root/reference/pe_similarity_visualizer.py:874-896)."""
    found = {}
    for m in methods:
        p = checkpoint.find_checkpoint(ckpt_dir, "cifar10", m)
        if p:
            found[m] = p
    return found
