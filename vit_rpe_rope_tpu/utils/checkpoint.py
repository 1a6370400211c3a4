"""Checkpointing with reference-compatible logical keys (SURVEY.md Q9, §5.4).

The reference saves a raw torch state_dict to
{ckpt_dir}/{dataset}_{pos_encoding}_best.pth (/root/reference/train.py:207-209)
and its visualizers infer architecture from exact key names and shapes
(patch_embed.weight, *.qkv.weight, pos_embed.inv_freq, pos_embed.freqs, ...).

We keep the identical flat key/shape contract but serialize as .npz (the
TPU-native stack has no torch dependency at train time). The loader reads BOTH:
  *.npz  — our format (flat dict of arrays)
  *.pth  — reference torch checkpoints (imported via torch, CPU, if available)
so reference-trained checkpoints drop straight into the rebuilt visualizers.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def save(path: str, params: dict, buffers: dict | None = None,
         aliases: dict | None = None) -> str:
    """Write params (+ non-trainable buffers) as one flat .npz state dict.

    aliases: optional {alias_key: canonical_key} (models.vit.reference_alias_keys)
    — the reference state_dict duplicates every shared-PE tensor under
    blocks.{i}.attn.pos_encoding.*; writing those too makes our key set
    byte-identical to the reference's (Q9).

    Returns the actual path written (suffix normalized to .npz)."""
    if path.endswith(".pth"):
        path = path[:-4] + ".npz"
    elif not path.endswith(".npz"):
        path = path + ".npz"
    state = {k: np.asarray(v) for k, v in params.items()}
    for k, v in (buffers or {}).items():
        state[k] = np.asarray(v)
    for alias, canonical in (aliases or {}).items():
        if canonical in state:
            state[alias] = state[canonical]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **state)
    return path


def load_state(path: str) -> dict:
    """Load a flat state dict (numpy arrays) from .npz or torch .pth."""
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch  # optional dependency, only for reference-ckpt import

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def split_state(state: dict, buffer_keys) -> tuple[dict, dict]:
    """Split a flat state dict into (trainable params, buffers) given the
    buffer key set for the architecture (e.g. models.vit.buffers(cfg))."""
    buffer_keys = set(buffer_keys)
    params = {k: jnp.asarray(v) for k, v in state.items()
              if k not in buffer_keys and not k.startswith("__")
              and ".attn.pos_encoding." not in k}  # shared-PE alias duplicates
    bufs = {k: jnp.asarray(v) for k, v in state.items() if k in buffer_keys}
    return params, bufs


def save_train_state(path: str, params: dict, opt_state, epoch: int,
                     best_acc: float) -> str:
    """Full resumable train state: params + flattened optimizer leaves +
    loop progress (a capability the reference lacks — it always restarts
    from scratch, SURVEY.md §5.3; extension, not reference surface)."""
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    state = {k: np.asarray(v) for k, v in params.items()}
    for i, leaf in enumerate(leaves):
        state[f"__opt.{i}"] = np.asarray(leaf)
    state["__epoch"] = np.asarray(epoch, np.int64)
    state["__best_acc"] = np.asarray(best_acc, np.float64)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **state)
    return path


def load_train_state(path: str, opt_state_template):
    """-> (params, opt_state, next_epoch, best_acc). The optimizer pytree is
    rebuilt from a template with the same structure (e.g. tx.init(params))."""
    import jax

    state = load_state(path)
    params = {k: jnp.asarray(v) for k, v in state.items()
              if not k.startswith("__")}
    treedef = jax.tree_util.tree_structure(opt_state_template)
    n_leaves = treedef.num_leaves
    n_stored = sum(1 for k in state if k.startswith("__opt."))
    if n_stored != n_leaves:
        raise ValueError(
            f"{path} stores {n_stored} optimizer leaves but the current "
            f"optimizer expects {n_leaves} — the file predates the canonical "
            "flat-moment format (or was written by a different optimizer). "
            "Delete the stale _last.npz (or retrain) to proceed.")
    leaves = [jnp.asarray(state[f"__opt.{i}"]) for i in range(n_leaves)]
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return (params, opt_state, int(state["__epoch"]) + 1,
            float(state["__best_acc"]))


def export_torch(npz_path: str, pth_path: str | None = None) -> str:
    """Convert one of our .npz checkpoints to a torch .pth state_dict loadable
    by the ORIGINAL reference model (strict load: the alias keys written by
    save(aliases=...) complete the reference key set). Requires torch."""
    import torch

    state = load_state(npz_path)
    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in state.items()
          if not k.startswith("__")}
    if pth_path is None:
        pth_path = npz_path[:-4] + ".pth" if npz_path.endswith(".npz") \
            else npz_path + ".pth"
    torch.save(sd, pth_path)
    return pth_path


def find_checkpoint(ckpt_dir: str, dataset: str, pos_encoding: str) -> str | None:
    """Locate a best-checkpoint by the reference naming contract, preferring
    our .npz but accepting reference .pth."""
    for ext in (".npz", ".pth"):
        p = os.path.join(ckpt_dir, f"{dataset}_{pos_encoding}_best{ext}")
        if os.path.exists(p):
            return p
    return None
