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
from typing import Optional

import numpy as np

from icra2021_multimodal_ad_tpu.data.native_lib import (
    NativeLib,
    repo_native_src,
)

_SRC = repo_native_src("fast_png.cpp")


def _configure(lib: ctypes.CDLL) -> None:
    intp = ctypes.POINTER(ctypes.c_int)
    lib.fast_png_dims.argtypes = [ctypes.c_char_p, intp, intp, intp]
    lib.fast_png_dims.restype = ctypes.c_int
    lib.fast_png_decode.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long, intp, intp, intp,
    ]
    lib.fast_png_decode.restype = ctypes.c_int


_loader = NativeLib(
    _SRC, os.path.join(os.path.dirname(_SRC), "libfastpng.so"),
    ["-lpng"], _configure,
)


def get_lib() -> Optional[ctypes.CDLL]:
    return _loader.get()


#: scratch size covering the robot cameras' largest frames (640x480 RGB);
#: images above this take one retry with an exact-size buffer
_SCRATCH_BYTES = 640 * 480 * 3


def decode(path: str) -> Optional[np.ndarray]:
    """Decode to a uint8 (H, W, 3) or (H, W) array, exactly like
    np.asarray(PIL.Image.open(path)) for plain 8-bit PNGs.  Returns None
    when the native path can't handle the file (caller falls back to PIL).

    One C call in the common case: decode straight into a typical-size
    scratch buffer (the separate dims() probe would double the per-image
    open+header-parse cost of the hot loop); fast_png_decode fills the dims
    even on buffer-too-small, so oversized images retry exactly once."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = np.empty(_SCRATCH_BYTES, dtype=np.uint8)
    rc = lib.fast_png_decode(path.encode(), buf, buf.nbytes,
                             ctypes.byref(h), ctypes.byref(w),
                             ctypes.byref(c))
    if rc == -3:  # larger than the scratch: dims are filled in, retry exact
        buf = np.empty(h.value * w.value * c.value, dtype=np.uint8)
        rc = lib.fast_png_decode(path.encode(), buf, buf.nbytes,
                                 ctypes.byref(h), ctypes.byref(w),
                                 ctypes.byref(c))
    if rc != 0:
        return None
    arr = buf[: h.value * w.value * c.value].reshape(
        h.value, w.value, c.value)
    return arr[..., 0] if c.value == 1 else arr


def decode_resized(path: str, size=(32, 24)) -> np.ndarray:
    """Native decode (GIL-free) + PIL resize — bit-identical to
    np.asarray(Image.open(path).resize(size)); falls back to the pure-PIL
    path when native decode is unavailable."""
    from PIL import Image

    arr = decode(path)
    if arr is None:
        return np.asarray(Image.open(path).resize(size))
    if arr.shape[:2] == (size[1], size[0]):
        # already target-sized (synthetic/pre-scaled datasets): PIL's own
        # resize short-circuits to a copy here, so skipping the
        # fromarray/resize/asarray round trip (26 us/image measured) is
        # bit-identical
        return arr
    return np.asarray(Image.fromarray(arr).resize(size))
