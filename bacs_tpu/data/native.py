"""ctypes bindings for the native label-ops library (native/fastlabel.cpp).

Builds the shared library on first use (g++ is in the image); every entry
point has a numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_repo_root(), "native", "fastlabel.cpp")
    out = os.path.join(_repo_root(), "native", "libfastlabel.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.class_presence.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.remap_labels.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.class_histogram.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.resize_nearest_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.unpack_bitplanes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def class_presence(labels: np.ndarray) -> np.ndarray:
    """[N, ...] uint8 label maps → [N, 256] bool presence matrix."""
    labels = np.ascontiguousarray(labels, np.uint8)
    n = labels.shape[0]
    per = int(labels.size // max(n, 1))
    lib = _build_and_load()
    if lib is not None:
        out = np.zeros((n, 256), np.uint8)
        lib.class_presence(
            labels.ctypes.data, n, per, out.ctypes.data
        )
        return out.astype(bool)
    out = np.zeros((n, 256), bool)
    flat = labels.reshape(n, -1)
    for i in range(n):
        out[i, np.unique(flat[i])] = True
    return out


def class_sets_from_presence(presence: np.ndarray) -> List[np.ndarray]:
    """presence [N,256] → per-image arrays of fg class ids (no 0/255)."""
    sets = []
    for row in presence:
        ids = np.where(row)[0]
        sets.append(ids[(ids != 0) & (ids != 255)].astype(np.int32))
    return sets


def remap_labels(labels: np.ndarray, table: np.ndarray) -> np.ndarray:
    labels = np.ascontiguousarray(labels, np.uint8)
    table = np.ascontiguousarray(table, np.int32)
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(labels.shape, np.int32)
        lib.remap_labels(
            labels.ctypes.data, table.ctypes.data, labels.size, out.ctypes.data
        )
        return out
    return table[labels]


def unpack_bitplanes(
    packed: np.ndarray, n: int, bits: int, groups: int, w: int
) -> Optional[np.ndarray]:
    """Serving-wire-format unpack (ops/bitpack.py); None if no toolchain."""
    lib = _build_and_load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty((n, groups * 8, w), np.uint8)
    lib.unpack_bitplanes(
        packed.ctypes.data, n, bits, groups, w, out.ctypes.data
    )
    return out


def resize_nearest_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw = src.shape
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((dh, dw), np.uint8)
        lib.resize_nearest_u8(src.ctypes.data, sh, sw, out.ctypes.data, dh, dw)
        return out
    ys = (np.arange(dh) * sh // dh).astype(np.int64)
    xs = (np.arange(dw) * sw // dw).astype(np.int64)
    return src[ys][:, xs]
