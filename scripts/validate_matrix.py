"""Reproduce the VALIDATION.md end-to-end matrix: every PE mode x both
datasets through fit() on the real chip (2 epochs, batch 128, reference
hyperparameters, --synthetic data).

Usage: python scripts/validate_matrix.py [--epochs 2] [--out matrix.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PES = ["none", "absolute", "relative", "polynomial", "rope-axial",
       "rope-mixed"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--datasets", nargs="+", default=["mnist", "cifar10"])
    ap.add_argument("--pes", nargs="+", default=PES)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default="/tmp/validate_matrix")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vit_rpe_rope_tpu.configs import TrainConfig, ViTConfig
    from vit_rpe_rope_tpu.train.loop import fit

    rows = []
    for dataset in args.datasets:
        for pe in args.pes:
            cfg = ViTConfig(pos_encoding=pe,
                            in_chans=1 if dataset == "mnist" else 3)
            tcfg = TrainConfig(
                dataset=dataset, epochs=args.epochs, synthetic_data=True,
                log_dir=os.path.join(args.workdir, "logs"),
                ckpt_dir=os.path.join(args.workdir, "ckpts"))
            s = fit(cfg, tcfg, verbose=False)
            ips = (s["history"][-1]["images_per_sec"]
                   if s["history"] else None)
            row = dict(dataset=dataset, pos_encoding=pe,
                       best_acc=round(s["best_acc"], 2),
                       images_per_sec=round(ips, 0) if ips else None,
                       params=s["num_params"])
            rows.append(row)
            print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
