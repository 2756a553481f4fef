"""ctypes binding for the native PNG decoder (native/fast_png.cpp).

Why it exists: the dataset build decodes one PNG per window row
(utils/data_loaders.py:337-367 in the reference — its #1 hot loop).  PIL
holds the GIL through most of a decode, so Python thread pools don't scale
it; ctypes RELEASES the GIL for the duration of the C call, so this decoder
+ a thread pool scales with host cores.  The decode is lossless and the
resize stays in PIL, so outputs are bit-identical to the pure-PIL path.

Any failure (no compiler, no libpng, alpha channel) falls back to PIL per
image — the pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "fast_png.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libfastpng.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-lpng", "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            stale = (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            )
            if stale and not _build():
                _lib_failed = True
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            intp = ctypes.POINTER(ctypes.c_int)
            lib.fast_png_dims.argtypes = [ctypes.c_char_p, intp, intp, intp]
            lib.fast_png_dims.restype = ctypes.c_int
            lib.fast_png_decode.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                ctypes.c_long, intp, intp, intp,
            ]
            lib.fast_png_decode.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def decode(path: str) -> Optional[np.ndarray]:
    """Decode to a uint8 (H, W, 3) or (H, W) array, exactly like
    np.asarray(PIL.Image.open(path)) for alpha-free PNGs.  Returns None when
    the native path can't handle the file (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.fast_png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c)) != 0:
        return None
    buf = np.empty(h.value * w.value * c.value, dtype=np.uint8)
    rc = lib.fast_png_decode(path.encode(), buf, buf.nbytes,
                             ctypes.byref(h), ctypes.byref(w),
                             ctypes.byref(c))
    if rc != 0:
        return None
    arr = buf.reshape(h.value, w.value, c.value)
    return arr[..., 0] if c.value == 1 else arr


def decode_resized(path: str, size=(32, 24)) -> np.ndarray:
    """Native decode (GIL-free) + PIL resize — bit-identical to
    np.asarray(Image.open(path).resize(size)); falls back to the pure-PIL
    path when native decode is unavailable."""
    from PIL import Image

    arr = decode(path)
    if arr is None:
        return np.asarray(Image.open(path).resize(size))
    return np.asarray(Image.fromarray(arr).resize(size))
