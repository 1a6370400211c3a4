"""CLI for the cross-framework training-trajectory parity harness
(vit_rpe_rope_tpu/utils/trajectory_parity.py): trains the REAL torch
reference and the JAX build from an identical imported init on identical
synthetic data/batch order, per PE mode, and writes a JSON report.

Usage:
  python scripts/trajectory_parity.py --pe all --dataset mnist --steps 200
  python scripts/trajectory_parity.py --pe polynomial --dataset cifar10 \
      --steps 400 --out /tmp/poly_traj.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALL_PES = ["none", "absolute", "relative", "polynomial", "rope-axial",
           "rope-mixed"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pe", default="all",
                    choices=ALL_PES + ["all"])
    ap.add_argument("--dataset", default="mnist",
                    choices=["mnist", "cifar10"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--embed_dim", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--num_heads", type=int, default=4)
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--patch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # fp32 CPU on both sides

    from vit_rpe_rope_tpu.utils.trajectory_parity import run_trajectory_parity

    pes = ALL_PES if args.pe == "all" else [args.pe]
    results = []
    for pe in pes:
        r = run_trajectory_parity(
            pe=pe, dataset=args.dataset, steps=args.steps,
            batch_size=args.batch_size, epochs=args.epochs,
            embed_dim=args.embed_dim, depth=args.depth,
            num_heads=args.num_heads, img_size=args.img_size,
            patch_size=args.patch_size, lr=args.lr, seed=args.seed)
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
