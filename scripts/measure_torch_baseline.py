"""Measure the reference PyTorch model's CPU training throughput on this
host — the anchor for bench.py's vs_baseline (BASELINE.md: reference
publishes no throughput anywhere, so it must be measured; SURVEY.md §6).

Runs the ACTUAL reference model (/root/reference/models/vit.py) with a
minimal timm stub (timm is not installed here), CIFAR-10 shapes, the
reference recipe: batch 128, CrossEntropy, AdamW(1e-3, wd 0.01), fwd+bwd+step
(/root/reference/train.py:108-116). Writes tests/../BASELINE_MEASURED.json.

Usage: python scripts/measure_torch_baseline.py [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("VIT_PE_REFERENCE", "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--pos_encoding", default=None)
    ap.add_argument("--stretch", action="store_true",
                    help="measure the ViT-S/16@224 stretch config instead "
                        "(BASELINE.json config 5); merged into the same "
                        "JSON under a _stretch key. Throughput is per-image"
                        " so a small batch keeps the run tractable on CPU.")
    args = ap.parse_args()
    if args.pos_encoding is None:
        args.pos_encoding = "rope-mixed" if args.stretch else "rope-axial"
    if args.batch_size is None:
        args.batch_size = 8 if args.stretch else 128

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests", "golden"))
    from generate_fixtures import install_timm_stub

    install_timm_stub()
    sys.path.insert(0, REFERENCE)
    from models.vit import VisionTransformer

    torch.manual_seed(0)
    if args.stretch:
        img, patch, embed, depth, heads = 224, 16, 384, 12, 6
    else:
        img, patch, embed, depth, heads = 32, 4, 192, 6, 6
    model = VisionTransformer(
        img_size=img, patch_size=patch, in_chans=3, num_classes=10,
        embed_dim=embed, depth=depth, num_heads=heads,
        pos_encoding=args.pos_encoding, rope_theta=100.0)
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
    x = torch.randn(args.batch_size, 3, img, img)
    y = torch.randint(0, 10, (args.batch_size,))

    def step():
        opt.zero_grad()
        loss = criterion(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    ips = args.batch_size * args.steps / dt
    suffix = "_stretch" if args.stretch else ""
    result = {
        f"pytorch_cpu_images_per_sec{suffix}": ips,
        f"batch_size{suffix}": args.batch_size,
        f"pos_encoding{suffix}": args.pos_encoding,
        f"steps{suffix}": args.steps,
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "note": "reference model fwd+bwd+AdamW on a synthetic batch; "
                "measured on the bench host (reference publishes no "
                "throughput numbers)",
    }
    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    merged = {}  # keep both configs' entries, suffix-namespaced
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged.update(result)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
