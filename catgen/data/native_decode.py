"""ctypes binding for the native fastimage decoder (native/fastimage.cpp).

Auto-builds the shared library with the in-image toolchain on first use if
it is missing (``make -C native``); raises ImportError when neither the
library nor a compiler is available, and the loader falls back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastimage.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                   capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            _build()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise ImportError(f"cannot build libfastimage.so: {e}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fi_decode_batch.restype = ctypes.c_int
    lib.fi_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    lib.fi_abi_version.restype = ctypes.c_int
    assert lib.fi_abi_version() == 1
    _lib = lib
    return lib


def decode_batch(paths: Sequence[str], size: int,
                 threads: int = 0) -> np.ndarray:
    """Decodes JPEGs into (n, size, size, 3) uint8 with a native thread
    pool. Files that fail to decode come back zero-filled."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    ok = np.empty((n,), np.uint8)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() for p in paths])
    lib.fi_decode_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads)
    return out


def decode_batch_checked(paths: Sequence[str], size: int,
                         threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Like decode_batch but also returns the per-file ok mask."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    ok = np.empty((n,), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fi_decode_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads)
    return out, ok.astype(bool)
