"""Dataset decoder tests: IDX / CIFAR formats round-trip through synthetic
files; procedural dataset determinism; normalization constants."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from vit_rpe_rope_tpu.data import datasets


def write_idx(path, arr):
    ndim = arr.ndim
    with open(path, "wb") as f:
        f.write(struct.pack(">I", (0x08 << 8) | ndim))
        f.write(struct.pack(f">{ndim}I", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    tr_x = rng.integers(0, 256, (8, 28, 28), dtype=np.uint8)
    te_x = rng.integers(0, 256, (4, 28, 28), dtype=np.uint8)
    write_idx(raw / "train-images-idx3-ubyte", tr_x)
    write_idx(raw / "train-labels-idx1-ubyte", np.arange(8, dtype=np.uint8))
    write_idx(raw / "t10k-images-idx3-ubyte", te_x)
    write_idx(raw / "t10k-labels-idx1-ubyte", np.arange(4, dtype=np.uint8))
    b = datasets.load_mnist(str(tmp_path))
    np.testing.assert_array_equal(b.train_x[..., 0], tr_x)
    np.testing.assert_array_equal(b.test_x[..., 0], te_x)
    assert b.train_y.dtype == np.int32 and b.in_chans == 1


def test_mnist_gzipped(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    arr = np.ones((2, 28, 28), np.uint8)
    for name, a in [("train-images-idx3-ubyte", arr),
                    ("train-labels-idx1-ubyte", np.zeros(2, np.uint8)),
                    ("t10k-images-idx3-ubyte", arr),
                    ("t10k-labels-idx1-ubyte", np.zeros(2, np.uint8))]:
        tmp = tmp_path / "tmpfile"
        write_idx(tmp, a)
        with open(tmp, "rb") as fin, gzip.open(str(raw / name) + ".gz", "wb") as fout:
            fout.write(fin.read())
    b = datasets.load_mnist(str(tmp_path))
    assert b.train_x.shape == (2, 28, 28, 1)


def test_cifar10_pickle_roundtrip(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    os.makedirs(d)
    rng = np.random.default_rng(1)

    def write_batch(name, n):
        data = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
        with open(d / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": list(range(n))}, f)
        return data

    batches = [write_batch(f"data_batch_{i}", 4) for i in range(1, 6)]
    test = write_batch("test_batch", 4)
    b = datasets.load_cifar10(str(tmp_path))
    assert b.train_x.shape == (20, 32, 32, 3)
    # channel-first 3072 layout → NHWC
    np.testing.assert_array_equal(
        b.train_x[0], batches[0][0].reshape(3, 32, 32).transpose(1, 2, 0))
    np.testing.assert_array_equal(
        b.test_x[0], test[0].reshape(3, 32, 32).transpose(1, 2, 0))


def test_cifar10_binary_roundtrip(tmp_path):
    d = tmp_path / "cifar-10-batches-bin"
    os.makedirs(d)
    rng = np.random.default_rng(2)
    recs = {}
    for i in range(1, 6):
        rec = rng.integers(0, 256, (2, 3073), dtype=np.uint8)
        rec[:, 0] = rec[:, 0] % 10
        rec.tofile(d / f"data_batch_{i}.bin")
        recs[i] = rec
    rec = rng.integers(0, 256, (2, 3073), dtype=np.uint8)
    rec[:, 0] %= 10
    rec.tofile(d / "test_batch.bin")
    b = datasets.load_cifar10(str(tmp_path))
    assert b.train_x.shape == (10, 32, 32, 3)
    np.testing.assert_array_equal(b.train_y[:2], recs[1][:, 0].astype(np.int32))


def test_missing_data_raises_helpful_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic"):
        datasets.get_dataset("mnist", str(tmp_path))


def test_synthetic_deterministic_and_balanced():
    a = datasets.synthetic("cifar10", n_train=100, n_test=20, seed=5)
    b = datasets.synthetic("cifar10", n_train=100, n_test=20, seed=5)
    np.testing.assert_array_equal(a.train_x, b.train_x)
    np.testing.assert_array_equal(a.train_y, b.train_y)
    assert a.train_x.shape == (100, 32, 32, 3) and a.train_x.dtype == np.uint8
    counts = np.bincount(a.train_y, minlength=10)
    assert counts.min() == 10 and counts.max() == 10


def test_normalization_constants_match_reference():
    m, s = datasets.NORMALIZATION["mnist"]
    np.testing.assert_allclose(m, [0.1307]); np.testing.assert_allclose(s, [0.3081])
    m, s = datasets.NORMALIZATION["cifar10"]
    np.testing.assert_allclose(m, [0.4914, 0.4822, 0.4465])
    np.testing.assert_allclose(s, [0.2023, 0.1994, 0.2010])
