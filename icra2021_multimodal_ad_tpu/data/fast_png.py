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
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fast_png_decode_batch.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long, i32p, i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.fast_png_decode_batch.restype = ctypes.c_int


_loader = NativeLib(
    _SRC, os.path.join(os.path.dirname(_SRC), "libfastpng.so"),
    # -pthread: decode_batch spawns std::thread; without it, glibc < 2.34
    # throws from thread construction and the exception would cross the
    # extern "C" boundary into std::terminate
    ["-lpng", "-pthread"], _configure,
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


#: per-chunk output budget for batch decodes — bounds peak memory when a
#: batch of full camera frames (640*480*3 ~ 0.9 MB each) comes through
_BATCH_BUDGET_BYTES = 256 * 1024 * 1024


def decode_batch(paths, n_threads: Optional[int] = None):
    """Decode many PNGs in ONE native call (per memory-bounded chunk),
    threaded across host cores inside the library (the GIL is released for
    the whole call).  Returns a list aligned with `paths`: uint8 (H, W, 3)
    / (H, W) arrays, with None for any image the native path can't handle
    (caller falls back to PIL per image).  Returns None wholesale when the
    native library is unavailable.

    Even single-core this amortizes the per-call Python/ctypes overhead of
    the per-row decode loop; multi-core it scales where a PIL thread pool
    cannot (PIL holds the GIL through most of a decode)."""
    lib = get_lib()
    if lib is None or not paths:
        return None if lib is None else []
    if n_threads is None:
        n_threads = min(32, os.cpu_count() or 1)

    # size the per-image slot from the first image's dims: frames from one
    # camera stream share a resolution, so one probe covers the batch; any
    # larger image comes back rc=-3 and is retried alone with exact size
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.fast_png_dims(paths[0].encode(), ctypes.byref(h),
                           ctypes.byref(w), ctypes.byref(c))
    cap_each = (h.value * w.value * c.value) if rc == 0 else _SCRATCH_BYTES
    cap_each = max(cap_each, 1)

    out: list = []
    chunk = max(1, _BATCH_BUDGET_BYTES // cap_each)
    for lo in range(0, len(paths), chunk):
        batch = paths[lo:lo + chunk]
        n = len(batch)
        encoded = [p.encode() for p in batch]
        offsets = np.zeros(n, dtype=np.int64)
        pos = 0
        for i, e in enumerate(encoded):
            offsets[i] = pos
            pos += len(e) + 1
        blob = b"\0".join(encoded) + b"\0"
        buf = np.empty(n * cap_each, dtype=np.uint8)
        hs = np.empty(n, dtype=np.int32)
        ws = np.empty(n, dtype=np.int32)
        cs = np.empty(n, dtype=np.int32)
        rcs = np.empty(n, dtype=np.int32)
        lib.fast_png_decode_batch(blob, offsets, n, buf, cap_each,
                                  hs, ws, cs, rcs, n_threads)
        for i in range(n):
            if rcs[i] == -3:  # bigger than the probed slot: exact retry
                out.append(decode(batch[i]))
                continue
            if rcs[i] != 0:
                out.append(None)
                continue
            npx = int(hs[i]) * int(ws[i]) * int(cs[i])
            arr = buf[i * cap_each: i * cap_each + npx].reshape(
                int(hs[i]), int(ws[i]), int(cs[i])).copy()
            out.append(arr[..., 0] if cs[i] == 1 else arr)
    return out


def decode_resized(path: str, size=(32, 24)) -> np.ndarray:
    """Native decode (GIL-free) + PIL resize — bit-identical to
    np.asarray(Image.open(path).resize(size)); falls back to the pure-PIL
    path when native decode is unavailable."""
    from PIL import Image

    return _resized(decode(path), path, size)


def _resized(arr: Optional[np.ndarray], path: str, size) -> np.ndarray:
    from PIL import Image

    if arr is None:
        return np.asarray(Image.open(path).resize(size))
    if arr.shape[:2] == (size[1], size[0]):
        # already target-sized (synthetic/pre-scaled datasets): PIL's own
        # resize short-circuits to a copy here, so skipping the
        # fromarray/resize/asarray round trip (26 us/image measured) is
        # bit-identical
        return arr
    return np.asarray(Image.fromarray(arr).resize(size))


def decode_resized_batch(paths, size=(32, 24),
                         n_threads: Optional[int] = None):
    """Batched decode_resized: one native call per memory-bounded chunk,
    PIL fallback per failed image, PIL resize for off-target sizes —
    outputs bit-identical to [decode_resized(p, size) for p in paths].
    Returns None when the native library is unavailable.  n_threads caps
    the in-library worker count (default: host cores)."""
    decoded = decode_batch(paths, n_threads=n_threads)
    if decoded is None:
        return None
    return [_resized(a, p, size) for a, p in zip(decoded, paths)]
