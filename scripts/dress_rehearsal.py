"""Real-data dress rehearsal (VERDICT r2 "What's missing" #1 / next-round #8).

This machine has zero egress and no MNIST/CIFAR-10 files, so the published-
accuracy recipes can't be reproduced bit-for-bit. This script closes the
CODE-PATH half of that gap: it synthesizes byte-exact-FORMAT archives at the
real datasets' full sizes and filenames —
  * MNIST IDX (train-images-idx3-ubyte[.gz] 60,000×28×28, labels, t10k)
  * CIFAR-10 python pickles (cifar-10-batches-py/data_batch_1..5 +
    test_batch, 10,000×3072 uint8 rows + b"labels")
  * CIFAR-10 binary (cifar-10-batches-bin/data_batch_1..5.bin, 3073-byte
    records)
— then runs the REAL product CLI (`train.py --dataset ... --data_dir ...`,
no --synthetic) end to end on each: full loader stack (C++ fast paths with
numpy fallbacks), normalization, training, eval, checkpoint. After this,
only the pixel VALUES — not any code path — separate a run here from the
published recipes (data/datasets.py decodes the genuine archives
identically; formats per the reference's torchvision dependency,
/root/reference/train.py:60-78).

Usage: python scripts/dress_rehearsal.py [--small] [--root DIR]
  --small: 1/50-size archives (CPU-friendly); default full-size.
Prints one JSON line per leg.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pickle
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_idx(path: str, arr: np.ndarray, gz: bool = False) -> None:
    """IDX: magic 0x0000080D (ubyte, D dims) + big-endian dims + raw bytes."""
    magic = 0x00000800 | arr.ndim
    header = struct.pack(">I", magic) + struct.pack(
        f">{arr.ndim}I", *arr.shape)
    payload = header + arr.astype(np.uint8).tobytes()
    if gz:
        with gzip.open(path + ".gz", "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def gen_mnist(root: str, n_train: int, n_test: int, gz: bool) -> None:
    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    tx = rng.integers(0, 256, (n_train, 28, 28), dtype=np.uint8)
    ty = (np.arange(n_train) % 10).astype(np.uint8)
    ex = rng.integers(0, 256, (n_test, 28, 28), dtype=np.uint8)
    ey = (np.arange(n_test) % 10).astype(np.uint8)
    write_idx(os.path.join(raw, "train-images-idx3-ubyte"), tx, gz)
    write_idx(os.path.join(raw, "train-labels-idx1-ubyte"), ty, gz)
    write_idx(os.path.join(raw, "t10k-images-idx3-ubyte"), ex, gz)
    write_idx(os.path.join(raw, "t10k-labels-idx1-ubyte"), ey, gz)


def gen_cifar_py(root: str, per_batch: int) -> None:
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, (per_batch, 3072), dtype=np.uint8)
        labels = [int(v) for v in np.arange(per_batch) % 10]
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels,
                         b"batch_label": name.encode()}, f)


def gen_cifar_bin(root: str, per_batch: int) -> None:
    d = os.path.join(root, "cifar-10-batches-bin")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(2)
    for name in ([f"data_batch_{i}.bin" for i in range(1, 6)]
                 + ["test_batch.bin"]):
        rec = np.empty((per_batch, 3073), dtype=np.uint8)
        rec[:, 0] = np.arange(per_batch) % 10
        rec[:, 1:] = rng.integers(0, 256, (per_batch, 3072), dtype=np.uint8)
        rec.tofile(os.path.join(d, name))


def run_cli(dataset: str, data_dir: str, out: str, tag: str) -> dict:
    from vit_rpe_rope_tpu.cli import train as cli_train

    summary = cli_train.main([
        "--dataset", dataset, "--pos_encoding", "rope-axial",
        "--img_size", "16", "--patch_size", "4",
        "--embed_dim", "64", "--depth", "2", "--num_heads", "4",
        "--epochs", "1", "--batch_size", "128",
        "--data_dir", data_dir,
        "--log_dir", os.path.join(out, "logs", tag),
        "--ckpt_dir", os.path.join(out, "ckpts", tag)])
    ckpt = os.path.join(out, "ckpts", tag,
                        f"{dataset}_rope-axial_best.npz")
    assert os.path.exists(ckpt), ckpt
    assert os.path.exists(summary["log_file"]), summary["log_file"]
    return dict(leg=tag, dataset=dataset,
                train_loss=round(summary["history"][0]["train_loss"], 4),
                images_per_sec=round(
                    summary["history"][0]["images_per_sec"]),
                best_acc=summary["best_acc"], ckpt=True, csv=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/50-size archives (CPU-friendly)")
    ap.add_argument("--root", default="/tmp/dress_rehearsal")
    args = ap.parse_args()
    scale = 50 if args.small else 1
    n_train, n_test, per_batch = 60000 // scale, 10000 // scale, \
        10000 // scale

    legs = []
    r = os.path.join(args.root, "mnist_plain")
    gen_mnist(r, n_train, n_test, gz=False)
    legs.append(("mnist", r, "mnist-idx"))
    r = os.path.join(args.root, "mnist_gz")
    gen_mnist(r, n_train, n_test, gz=True)
    legs.append(("mnist", r, "mnist-idx-gz"))
    r = os.path.join(args.root, "cifar_py")
    gen_cifar_py(r, per_batch)
    legs.append(("cifar10", r, "cifar10-pickle"))
    r = os.path.join(args.root, "cifar_bin")
    gen_cifar_bin(r, per_batch)
    legs.append(("cifar10", r, "cifar10-binary"))

    for dataset, data_dir, tag in legs:
        print(json.dumps(run_cli(dataset, data_dir, args.root, tag)),
              flush=True)


if __name__ == "__main__":
    main()
