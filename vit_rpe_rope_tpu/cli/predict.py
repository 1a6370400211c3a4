"""Inference / deployment CLI — [extension], no reference counterpart
(the reference's only inference path is the visualizers' torch.load +
eager forward, /root/reference/pe_similarity_visualizer.py:101-178).

Three things, composable in one invocation:
  * classify:  --input images.npz         (npz: 'images' uint8 NHWC
               [+ optional 'labels' to score accuracy])
  * export:    --export model.stablehlo   (self-contained batch-polymorphic
               AOT artifact; replayable with only jax installed)
  * serve an artifact: --artifact model.stablehlo (instead of a checkpoint)

The model architecture is reconstructed from the checkpoint's shapes alone
(viz.introspect.infer_vit_config — the whole-model generalization of the
reference tools' shape-sniffing), so reference-trained .pth files work
directly:

  python -m vit_rpe_rope_tpu.cli.predict checkpoints/cifar10_rope-axial_best.npz \\
      --input batch.npz --export rope_axial.stablehlo
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="ViT inference: classify images / export an AOT artifact")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="trained checkpoint (.npz ours / .pth reference); "
                        "omit when using --artifact")
    p.add_argument("--dataset", type=str, default="auto",
                   choices=["auto", "mnist", "cifar10"],
                   help="normalization/native-size contract (auto: by the "
                        "checkpoint's in_chans — 1=mnist, 3=cifar10)")
    p.add_argument("--input", type=str, default=None,
                   help="npz with 'images' (uint8 NHWC or HWC) and optional "
                        "'labels'")
    p.add_argument("--export", type=str, default=None,
                   help="write a StableHLO serving artifact here")
    p.add_argument("--artifact", type=str, default=None,
                   help="serve from a saved artifact (no checkpoint/model "
                        "code needed)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_heads", type=int, default=6,
                   help="fallback when the checkpoint doesn't pin it")
    p.add_argument("--grid_size", type=int, default=None,
                   help="patch grid when the checkpoint's shapes don't pin "
                        "it (default: 8, incl. the reference's cifar10-"
                        "filename quirk; an explicit value always wins)")
    p.add_argument("--rope_mixed_compat_scramble", action="store_true",
                   help="interpret rope-mixed learned frequencies with the "
                        "reference's (head,position) memory scramble "
                        "(SURVEY.md Q1) — use for reference-trained .pth")
    p.add_argument("--export_data_parallel", type=int, default=1,
                   help="export a SHARDED artifact: batch partitioned over "
                        "this many devices ('data' axis); replay requires "
                        "the same device count (serving.export_model mesh=)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization (quant.py); mode "
                        "per --int8_mode")
    p.add_argument("--int8_mode", type=str, default="w8a8",
                   choices=["w8a8", "w8a8-static", "w8a16"],
                   help="w8a8: int8 MXU matmuls with dynamic per-token "
                        "activation scales; w8a8-static: int8 MXU with "
                        "offline-calibrated per-tensor scales (--calib, "
                        "default: the --input batch) — no dynamic "
                        "quantization chain at serve time; w8a16: "
                        "weight-only — int8 weights dequantized into bf16 "
                        "matmuls (wins in the weight-bound small-batch/"
                        "latency regime)")
    p.add_argument("--calib", type=str, default=None,
                   help="npz with 'images' (uint8) for w8a8-static "
                        "activation-scale calibration; defaults to --input")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.artifact is None and args.checkpoint is None:
        build_parser().error("need a checkpoint or --artifact")
    if args.artifact is not None and (args.checkpoint is not None
                                      or args.export or args.int8):
        # An artifact is already lowered: there is nothing to re-export or
        # quantize, and a checkpoint alongside it would be ignored — reject
        # instead of silently dropping what was asked for.
        build_parser().error(
            "--artifact serves a finished artifact and cannot be combined "
            "with a checkpoint, --export, or --int8")

    import numpy as np

    from vit_rpe_rope_tpu import serving

    int8 = args.int8_mode if args.int8 else False
    if args.artifact is not None:
        predictor = serving.Predictor.from_artifact(args.artifact)
        print(f"Loaded artifact {args.artifact} "
              f"(input {predictor.in_shape}, batch-polymorphic)")
    else:
        calib_u8 = None
        if int8 == "w8a8-static":
            calib_src = args.calib or args.input
            if calib_src is None:
                build_parser().error(
                    "--int8_mode w8a8-static needs calibration images: "
                    "pass --calib images.npz (or --input, used as fallback)")
            with np.load(calib_src) as z:
                calib_u8 = z["images"]
        # int8=... quantizes ONCE here; classify + export share the result.
        params, cfg, mean, std, native, dataset = serving.load_serving_state(
            args.checkpoint, dataset=args.dataset, num_heads=args.num_heads,
            grid_size=args.grid_size,
            rope_mixed_compat_scramble=args.rope_mixed_compat_scramble,
            int8=int8, calib_images_u8=calib_u8)
        print(f"{args.checkpoint}: {cfg.pos_encoding} ViT d{cfg.embed_dim} "
              f"depth {cfg.depth} heads {cfg.num_heads} patch "
              f"{cfg.patch_size} @ {cfg.img_size}px ({dataset} contract)")
        predictor = None
        if args.input:
            predictor = serving.Predictor.from_params(
                params, cfg, mean, std, native, int8=int8)
        if args.export:
            mesh = None
            if args.export_data_parallel > 1:
                from vit_rpe_rope_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(num_devices=args.export_data_parallel)
                if mesh.devices.size != args.export_data_parallel:
                    raise SystemExit(
                        f"--export_data_parallel {args.export_data_parallel}"
                        f": only {mesh.devices.size} devices visible")
            exported = serving.export_model(params, cfg, mean, std, native,
                                            int8=int8, mesh=mesh)
            path = serving.save_artifact(args.export, exported)
            import os

            shard_note = (f", sharded over {exported.nr_devices} devices"
                          if exported.nr_devices > 1 else "")
            print(f"Exported {path} ({os.path.getsize(path):,} bytes, "
                  f"platforms {exported.platforms}, symbolic batch"
                  f"{shard_note})")

    if args.input:
        with np.load(args.input) as z:
            images = z["images"]
            labels = z["labels"] if "labels" in z.files else None
        if images.ndim == 3:
            images = images[None]
        preds = []
        for s in range(0, len(images), args.batch_size):
            preds.append(predictor.predict(images[s:s + args.batch_size]))
        preds = np.concatenate(preds)
        print("predictions:", " ".join(str(int(c)) for c in preds[:64])
              + (" ..." if len(preds) > 64 else ""))
        if labels is not None:
            acc = 100.0 * float((preds == np.asarray(labels)).mean())
            print(f"accuracy: {acc:.2f}% ({len(preds)} examples)")
        return preds
    return None


if __name__ == "__main__":
    main()
