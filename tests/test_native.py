"""Native C++ data-pipeline library: build, decode parity vs numpy paths,
and graceful-fallback behavior."""

import gzip
import os

import numpy as np
import pytest

from vit_rpe_rope_tpu.utils import native
from tests.test_data import write_idx

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native toolchain unavailable")


def test_idx_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (7, 28, 28), dtype=np.uint8)
    p = tmp_path / "images-idx3-ubyte"
    write_idx(p, arr)
    out = native.idx_decode(str(p))
    np.testing.assert_array_equal(out, arr)


def test_idx_decode_gzip(tmp_path):
    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    raw = tmp_path / "f"
    write_idx(raw, arr)
    gz = tmp_path / "g-idx3-ubyte"
    with open(raw, "rb") as fin, gzip.open(str(gz) + ".gz", "wb") as fout:
        fout.write(fin.read())
    out = native.idx_decode(str(gz))  # resolves the .gz twin
    np.testing.assert_array_equal(out, arr)


def test_idx_decode_rejects_garbage(tmp_path):
    p = tmp_path / "bad"
    p.write_bytes(b"\x01\x02\x03")
    assert native.idx_decode(str(p)) is None


def test_cifar_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    rec = rng.integers(0, 256, (5, 3073), dtype=np.uint8)
    rec[:, 0] %= 10
    p = tmp_path / "data_batch_1.bin"
    rec.tofile(p)
    images, labels = native.cifar_decode(str(p))
    np.testing.assert_array_equal(labels, rec[:, 0].astype(np.int32))
    expect = rec[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(images, expect)


def test_chw_to_hwc_matches_numpy():
    rng = np.random.default_rng(2)
    chw = rng.integers(0, 256, (4, 3, 8, 8), dtype=np.uint8)
    out = native.chw_to_hwc(chw)
    np.testing.assert_array_equal(out, chw.transpose(0, 2, 3, 1))


def test_shuffled_indices_is_permutation_and_seeded():
    a = native.shuffled_indices(1000, seed=7)
    b = native.shuffled_indices(1000, seed=7)
    c = native.shuffled_indices(1000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))


def test_dataset_loaders_use_native(tmp_path):
    """End-to-end: the dataset module decodes through the native path with
    identical results to the numpy fallback."""
    from vit_rpe_rope_tpu.data import datasets

    d = tmp_path / "cifar-10-batches-bin"
    os.makedirs(d)
    rng = np.random.default_rng(3)
    for i in range(1, 6):
        rec = rng.integers(0, 256, (3, 3073), dtype=np.uint8)
        rec[:, 0] %= 10
        rec.tofile(d / f"data_batch_{i}.bin")
    rec = rng.integers(0, 256, (3, 3073), dtype=np.uint8)
    rec[:, 0] %= 10
    rec.tofile(d / "test_batch.bin")
    b = datasets.load_cifar10(str(tmp_path))
    assert b.train_x.shape == (15, 32, 32, 3)
    np.testing.assert_array_equal(
        b.test_x[0], rec[0, 1:].reshape(3, 32, 32).transpose(1, 2, 0))
