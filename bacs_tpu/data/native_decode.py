"""ctypes binding for the native batch decoder (native/fastdecode.cpp).

Decodes a whole (image, label) batch in parallel C++ threads — JPEG/PNG
decode + short-side resize + center crop, matching datasets._load_pair
geometry.  Builds the shared library on first use; returns None when the
toolchain or image libraries are unavailable so callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

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
    src = os.path.join(_repo_root(), "native", "fastdecode.cpp")
    out = os.path.join(_repo_root(), "native", "libfastdecode.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(
            src
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", out,
                 "-ljpeg", "-lpng"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.decode_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,  # img paths + offsets
            ctypes.c_char_p, ctypes.c_void_p,  # lbl paths + offsets
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.decode_batch.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _pack(paths: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    offsets = np.zeros((len(paths),), np.int64)
    blobs = []
    pos = 0
    for i, p in enumerate(paths):
        b = os.fsencode(p) + b"\0"
        offsets[i] = pos
        blobs.append(b)
        pos += len(b)
    return b"".join(blobs), offsets


def decode_batch(
    img_paths: Sequence[str],
    lbl_paths: Sequence[str],
    size: int,
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (images [n,s,s,3] u8, labels [n,s,s] u8, failed [n] bool) or
    None when the native library is unavailable.  Failed slots are zeroed —
    callers patch them via the PIL path."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(img_paths)
    img_blob, img_off = _pack(img_paths)
    lbl_blob, lbl_off = _pack(lbl_paths)
    imgs = np.zeros((n, size, size, 3), np.uint8)
    lbls = np.zeros((n, size, size), np.uint8)
    failed = np.zeros((n,), np.uint8)
    lib.decode_batch(
        img_blob, img_off.ctypes.data, lbl_blob, lbl_off.ctypes.data,
        n, size, n_threads,
        imgs.ctypes.data, lbls.ctypes.data, failed.ctypes.data,
    )
    return imgs, lbls, failed.astype(bool)
