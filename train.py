"""Entry-point shim: `python train.py ...` exactly like the reference
(/root/reference/train.py), backed by the TPU-native implementation."""

from vit_rpe_rope_tpu.cli.train import main

if __name__ == "__main__":
    main()
