"""ctypes bindings for the native C++ data-pipeline library (native/dataio.cpp).

Builds on first use with the in-repo Makefile (g++) and caches the .so;
callers fall back to pure-numpy paths when the toolchain or library is
unavailable, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load():
    """Returns the loaded library or None (after one build attempt)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.idx_decode.restype = ctypes.c_int64
        lib.idx_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.cifar_decode_batch.restype = ctypes.c_int64
        lib.cifar_decode_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.chw_to_hwc.restype = None
        lib.chw_to_hwc.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.shuffled_indices.restype = None
        lib.shuffled_indices.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64]
        _lib = lib
        return _lib


def idx_decode(path: str) -> np.ndarray | None:
    """Decode an IDX file (raw or .gz) to a uint8 ndarray, or None."""
    lib = load()
    if lib is None:
        return None
    # The library opens `path` via gzopen which handles both raw and .gz;
    # prefer the .gz twin when only it exists (parity with the numpy path).
    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        path = path + ".gz"
    dims = (ctypes.c_int64 * 4)()
    ndim = ctypes.c_int32()
    size = lib.idx_decode(path.encode(), None, 0, dims, ctypes.byref(ndim))
    if size < 0:
        return None
    out = np.empty(size, np.uint8)
    got = lib.idx_decode(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                         size, dims, ctypes.byref(ndim))
    if got != size:
        return None
    return out.reshape(tuple(dims[i] for i in range(ndim.value)))


def cifar_decode(path: str):
    """Decode one CIFAR-10 binary batch -> (images NHWC uint8, labels int32),
    or None."""
    lib = load()
    if lib is None:
        return None
    n = lib.cifar_decode_batch(path.encode(), None, None, 0)
    if n < 0:
        return None
    images = np.empty((n, 32, 32, 3), np.uint8)
    labels = np.empty((n,), np.int32)
    got = lib.cifar_decode_batch(
        path.encode(), images.ctypes.data_as(ctypes.c_void_p),
        labels.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    return images, labels


def chw_to_hwc(chw: np.ndarray) -> np.ndarray | None:
    """[N, C, H, W] uint8 -> [N, H, W, C], or None."""
    lib = load()
    if lib is None:
        return None
    n, c, h, w = chw.shape
    chw = np.ascontiguousarray(chw)
    out = np.empty((n, h, w, c), np.uint8)
    lib.chw_to_hwc(chw.ctypes.data_as(ctypes.c_void_p),
                   out.ctypes.data_as(ctypes.c_void_p), n, c, h * w)
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    out = np.empty(n, np.int32)
    lib.shuffled_indices(out.ctypes.data_as(ctypes.c_void_p), n, seed)
    return out
