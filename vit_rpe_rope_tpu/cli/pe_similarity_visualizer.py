"""PE similarity visualizer — flag surface and outputs mirroring the
reference tool (/root/reference/pe_similarity_visualizer.py): per-position
grid-of-heatmaps, compact block-matrix heatmap, N-model side-by-side
comparison, and checkpoint auto-discovery
(checkpoints/cifar10_{method}_best.* flips the tool into compare mode).

Reads our .npz checkpoints AND reference torch .pth state dicts.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from vit_rpe_rope_tpu.viz import introspect, similarity  # noqa: E402

METHODS_ALL = ["absolute", "relative", "polynomial", "rope-axial", "rope-mixed"]


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Positional Encoding Similarity Visualizer")

    # Visualization configuration
    parser.add_argument("--grid_size", type=int, default=14,
                        help="Size of grid for visualization (default: 14)")
    parser.add_argument("--dim", type=int, default=192,
                        help="Embedding dimension (default: 192)")
    parser.add_argument("--num_heads", type=int, default=6,
                        help="Number of attention heads (default: 6)")

    # Encoding method selection
    parser.add_argument("--methods", type=str, nargs="+", default=METHODS_ALL,
                        help="Positional encoding methods to visualize")

    # Polynomial RPE parameters
    parser.add_argument("--poly_degree", type=int, default=3,
                        help="Degree for polynomial RPE (default: 3)")
    parser.add_argument("--poly_shared_heads", type=bool, default=True,
                        help="Whether to share polynomial coefficients across "
                             "heads (default: True)")

    # RoPE configuration
    parser.add_argument("--rope_theta", type=float, default=100.0,
                        help="Theta parameter for RoPE variants (default: 100.0)")
    parser.add_argument("--rope_head_idx", type=int, default=0,
                        help="Head index to visualize for RoPE-Mixed (default: 0)")

    # Model loading parameters
    parser.add_argument("--load_model", action="store_true",
                        help="Load a trained model to visualize its learned "
                             "positional encodings")
    parser.add_argument("--model_path", type=str, default=None,
                        help="Path to the trained model checkpoint")
    parser.add_argument("--model_config", type=str, default="absolute",
                        choices=METHODS_ALL,
                        help="Positional encoding method of the model")

    # Model comparison settings
    parser.add_argument("--compare_models", action="store_true",
                        help="Compare multiple models side by side")
    parser.add_argument("--model_paths", type=str, nargs="+", default=None,
                        help="List of model paths to compare")
    parser.add_argument("--model_configs", type=str, nargs="+", default=None,
                        help="List of model configs corresponding to model_paths")
    parser.add_argument("--model_names", type=str, nargs="+", default=None,
                        help="Custom names for models in comparison (optional)")

    # Output configuration
    parser.add_argument("--output_dir", type=str, default="visualizations",
                        help="Directory to save visualizations")
    parser.add_argument("--dpi", type=int, default=300,
                        help="DPI for saved figures (default: 300)")
    parser.add_argument("--cmap", type=str, default="viridis",
                        choices=["viridis", "plasma", "inferno", "magma",
                                 "cividis", "coolwarm"],
                        help="Colormap for visualization")
    return parser.parse_args(argv)


def _random_pe_model(method, args):
    """Fresh randomly-initialized PE state (no checkpoint), reference default
    behavior when no model is loaded."""
    import jax

    from vit_rpe_rope_tpu import pe as pe_registry
    from vit_rpe_rope_tpu.configs import ViTConfig

    cfg = ViTConfig(
        img_size=args.grid_size * 4, patch_size=4, embed_dim=args.dim,
        num_heads=args.num_heads, depth=1, pos_encoding=method,
        poly_degree=args.poly_degree, poly_shared_heads=args.poly_shared_heads,
        rope_theta=args.rope_theta)
    mod = pe_registry.get(method)
    params = {k: np.asarray(v) for k, v in
              mod.init_params(jax.random.PRNGKey(0), cfg).items()}
    params.update({k: np.asarray(v) for k, v in mod.buffers(cfg).items()})
    return introspect.PEModel(method, params, args.dim, args.num_heads,
                              args.dim // args.num_heads, args.grid_size)


def _save(fig, args, name):
    os.makedirs(args.output_dir, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = os.path.join(args.output_dir, f"pe_similarity_{name}_{ts}.png")
    fig.savefig(path, dpi=args.dpi, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved visualization to {path}")
    return path


def visualize_grid(sim, grid, method, args):
    """Per-position grid of heatmaps: cell (i, j) shows how position (i, j)
    relates to every other position."""
    fig, axes = plt.subplots(grid, grid, figsize=(1.2 * grid, 1.2 * grid))
    vmin, vmax = sim.min(), sim.max()
    for i in range(grid):
        for j in range(grid):
            ax = axes[i, j] if grid > 1 else axes
            ax.imshow(sim[i * grid + j].reshape(grid, grid), cmap=args.cmap,
                      vmin=vmin, vmax=vmax)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle(f"{method} positional similarity (per position)", y=0.92)
    return _save(fig, args, f"grid_{method}")


def visualize_compact(sim, grid, method, args):
    block = similarity.block_matrix(sim, grid)
    fig, ax = plt.subplots(figsize=(8, 8))
    im = ax.imshow(block, cmap=args.cmap)
    for g in range(grid, grid * grid, grid):  # block boundaries
        ax.axhline(g - 0.5, color="w", lw=0.4)
        ax.axvline(g - 0.5, color="w", lw=0.4)
    ax.set_title(f"{method} positional similarity (compact)")
    fig.colorbar(im, fraction=0.046)
    return _save(fig, args, f"compact_{method}")


def visualize_comparison(models, names, args):
    n = len(models)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 6))
    if n == 1:
        axes = [axes]
    for ax, model, name in zip(axes, models, names):
        sim, grid = similarity.similarity_for(
            model, head_idx=args.rope_head_idx, num_heads=args.num_heads,
            rope_theta=args.rope_theta)
        ax.imshow(similarity.block_matrix(sim, grid), cmap=args.cmap)
        ax.set_title(name)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.suptitle("Positional encoding similarity comparison", y=0.98)
    return _save(fig, args, "comparison")


def _load_models_tolerant(triples, args):
    """Load (path, method, display_name) checkpoints for comparison,
    warning and SKIPPING any that fail to load or shape-check — the
    reference's multi-model behavior
    (/root/reference/pe_similarity_visualizer.py:557-572 warns and skips on
    mismatch instead of aborting the whole comparison). Display names stay
    aligned with their surviving models."""
    models, names = [], []
    for path, method, name in triples:
        try:
            models.append(introspect.load_pe_model(
                path, method, args.grid_size, args.num_heads,
                args.rope_theta))
            names.append(name)
        except Exception as e:  # noqa: BLE001 — tool-level resilience
            print(f"Warning: could not load {path} as '{method}': {e}")
            print(f"Skipping {method}.")
    return models, names


def main(argv=None):
    args = get_args(argv)

    if args.compare_models and args.model_paths:
        configs = args.model_configs or [args.model_config] * len(args.model_paths)
        display = (args.model_names
                   if args.model_names
                   and len(args.model_names) == len(args.model_paths)
                   else configs)
        models, names = _load_models_tolerant(
            list(zip(args.model_paths, configs, display)), args)
        if not models:
            raise SystemExit("No models could be loaded for comparison.")
        return visualize_comparison(models, names, args)

    if args.load_model and args.model_path:
        model = introspect.load_pe_model(
            args.model_path, args.model_config, args.grid_size,
            args.num_heads, args.rope_theta)
        sim, grid = similarity.similarity_for(
            model, head_idx=args.rope_head_idx, num_heads=args.num_heads,
            rope_theta=args.rope_theta)
        visualize_grid(sim, grid, model.method, args)
        return visualize_compact(sim, grid, model.method, args)

    # Auto-discovery (reference behavior): trained CIFAR-10 checkpoints
    # under ./checkpoints flip the tool into comparison mode.
    found = introspect.discover_checkpoints("checkpoints", args.methods)
    if found:
        print(f"Auto-discovered checkpoints: {sorted(found)}")
        models, names = _load_models_tolerant(
            [(p, m, m) for m, p in found.items()], args)
        if models:
            return visualize_comparison(models, names, args)
        print("No discovered checkpoint could be loaded; falling back to "
              "random-init visualization.")

    # No checkpoints: visualize randomly-initialized encodings per method.
    for method in args.methods:
        model = _random_pe_model(method, args)
        sim, grid = similarity.similarity_for(
            model, head_idx=args.rope_head_idx, num_heads=args.num_heads,
            rope_theta=args.rope_theta)
        visualize_grid(sim, grid, method, args)
        visualize_compact(sim, grid, method, args)


if __name__ == "__main__":
    main()
