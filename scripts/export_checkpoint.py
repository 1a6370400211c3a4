"""Convert checkpoints between this framework's .npz and the reference's
torch .pth — both directions, strict-load compatible (SURVEY.md Q9 key
contract; the alias keys blocks.{i}.attn.pos_encoding.* written by
checkpoint.save complete the reference's exact state_dict key set).

Usage:
  python scripts/export_checkpoint.py checkpoints/cifar10_rope-axial_best.npz
  python scripts/export_checkpoint.py ref_model.pth --out imported.npz
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help=".npz (ours) or .pth (reference) checkpoint")
    ap.add_argument("--out", default=None,
                    help="output path (default: swap the extension)")
    args = ap.parse_args()

    from vit_rpe_rope_tpu.utils import checkpoint

    if args.path.endswith(".npz"):
        out = checkpoint.export_torch(args.path, args.out)
        print(f"wrote torch state_dict: {out}")
    elif args.path.endswith((".pth", ".pt")):
        import numpy as np

        state = checkpoint.load_state(args.path)
        out = args.out or (os.path.splitext(args.path)[0] + ".npz")
        np.savez(out, **{k: np.asarray(v) for k, v in state.items()})
        print(f"wrote npz state dict: {out} ({len(state)} tensors)")
    else:
        raise SystemExit(f"unrecognized checkpoint extension: {args.path}")


if __name__ == "__main__":
    main()
