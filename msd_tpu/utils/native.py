"""Native (C++) runtime components, loaded via ctypes.

Build: ``python -m msd_tpu.utils.native`` (or automatic on first use).
Falls back to the pure-Python implementations when a compiler is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmsdnative.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    src = os.path.join(_CSRC, "image_prep.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_LIB_PATH) and not force \
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except Exception:
        # retry without openmp/march (portable fallback)
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", _LIB_PATH], check=True, capture_output=True)
        except Exception:
            return None
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.image_prep.restype = ctypes.c_int
        lib.image_prep.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def image_prep_native(img: np.ndarray, out_size: int, mean: np.ndarray,
                      std: np.ndarray, pad_square: bool = True
                      ) -> Optional[np.ndarray]:
    """uint8 HWC -> normalized float32 CHW via the native pipeline.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    assert c == 3
    out = np.empty((3, out_size, out_size), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    rc = lib.image_prep(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out_size,
        int(pad_square),
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


if __name__ == "__main__":
    p = build(force=True)
    print("built:", p)
