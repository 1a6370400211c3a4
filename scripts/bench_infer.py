"""Serving/inference throughput on the real chip: images/sec for the jitted
Predictor path (uint8 in -> logits out, preprocessing fused), chained
dispatches (unchained micro-timings through the dispatch tunnel are garbage —
see CLAUDE.md).

  python scripts/bench_infer.py            # headline ViT-tiny/4 @32, bs128
  python scripts/bench_infer.py --stretch  # ViT-S/16 @224, bs64
  python scripts/bench_infer.py --dtype bfloat16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stretch", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--int8", action="store_true",
                    help="quantized path (quant.py; see --int8_mode)")
    ap.add_argument("--int8_mode", default="w8a8",
                    choices=["w8a8", "w8a8-static", "w8a16"],
                    help="w8a8: int8 MXU (dynamic per-token scales); "
                         "w8a8-static: int8 MXU, offline-calibrated "
                         "per-tensor scales (calibrates on one synthetic "
                         "batch here); w8a16: weight-only int8 -> bf16")
    ap.add_argument("--batch", type=int, default=0, help="0 = config default")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    from vit_rpe_rope_tpu import serving
    from vit_rpe_rope_tpu.configs import ViTConfig
    from vit_rpe_rope_tpu.data.datasets import NORMALIZATION
    from vit_rpe_rope_tpu.models import vit

    if args.stretch:
        cfg = ViTConfig(pos_encoding="rope-mixed", img_size=224,
                        patch_size=16, embed_dim=384, depth=12, in_chans=3,
                        compute_dtype=args.dtype)
        batch, native, name = args.batch or 64, 224, "ViT-S/16 @224"
    else:
        cfg = ViTConfig(pos_encoding="rope-axial", in_chans=3,
                        compute_dtype=args.dtype)
        batch, native, name = args.batch or 128, 32, "ViT-tiny/4 @32"

    mean, std = NORMALIZATION["cifar10"]
    int8 = args.int8_mode if args.int8 else False
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    if int8 == "w8a8-static":
        # Calibrate the per-tensor activation scales offline on one batch
        # drawn from the same synthetic distribution the benchmark serves
        # (scales don't change the program's speed, only its grid).
        from vit_rpe_rope_tpu import quant
        from vit_rpe_rope_tpu.train import train_step as ts

        crng = np.random.default_rng(7)
        calib_u8 = crng.integers(0, 256, (min(args.batch or 64, 64), native,
                                          native, 3), dtype=np.uint8)
        pre = ts.make_preprocess(cfg, mean, std, native)
        params = quant.quantize_params(
            params, cfg, calib_images=pre(jax.numpy.asarray(calib_u8)))
    pred = serving.Predictor.from_params(params, cfg, mean, std, native,
                                         int8=int8)

    rng = np.random.default_rng(0)
    # A few distinct device-resident batches so chained dispatches don't
    # collapse into one cached result.
    batches = [jax.device_put(rng.integers(0, 256, (batch, native, native, 3),
                                           dtype=np.uint8))
               for _ in range(4)]
    out = pred._call(batches[0])
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = pred._call(batches[i % len(batches)])
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * args.steps / dt
    kind = int8 if int8 else args.dtype
    print(json.dumps({
        "metric": f"{name} {kind} serving images/sec/chip "
                  f"(uint8 in -> logits, bs{batch})",
        "value": round(ips, 1), "unit": "images/sec/chip",
        "batch_ms": round(1e3 * dt / args.steps, 3)}))


if __name__ == "__main__":
    main()
