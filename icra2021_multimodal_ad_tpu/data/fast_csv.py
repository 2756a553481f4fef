"""ctypes binding for the native CSV reader (native/fast_csv.cpp).

Compiles the shared library on first use (g++ is part of the toolchain) and
caches it next to the source.  `read_columns` extracts named numeric columns
from a data_sum-schema CSV into a float32 matrix; any failure (no compiler,
parse error) falls back to pandas so the pipeline never hard-depends on the
native path.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from icra2021_multimodal_ad_tpu.data.native_lib import (
    NativeLib,
    repo_native_src,
)

_SRC = repo_native_src("fast_csv.cpp")


def _configure(lib: ctypes.CDLL) -> None:
    lib.fast_csv_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fast_csv_dims.restype = ctypes.c_int
    lib.fast_csv_read_f32.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long,
    ]
    lib.fast_csv_read_f32.restype = ctypes.c_long


_loader = NativeLib(
    _SRC, os.path.join(os.path.dirname(_SRC), "libfastcsv.so"),
    ["-pthread"], _configure,
)


def get_lib() -> Optional[ctypes.CDLL]:
    return _loader.get()


def read_header(path: str) -> List[str]:
    with open(path, "r") as f:
        return f.readline().rstrip("\r\n").split(",")


def dims(path: str) -> Tuple[int, int]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native csv reader unavailable")
    rows = ctypes.c_long()
    cols = ctypes.c_int()
    rc = lib.fast_csv_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"fast_csv_dims failed on {path}")
    return rows.value, cols.value


def read_columns(path: str, columns: Sequence[str]) -> np.ndarray:
    """(rows, len(columns)) float32 matrix of the named columns.
    Falls back to pandas when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return _pandas_fallback(path, columns)
    try:
        header = read_header(path)
        index = {name: i for i, name in enumerate(header)}
        sel = np.asarray([index[c] for c in columns], dtype=np.int32)
        n_rows, _ = dims(path)
        out = np.empty((n_rows, len(columns)), dtype=np.float32)
        got = lib.fast_csv_read_f32(path.encode(), sel, len(columns), out, n_rows)
        if got < 0:
            raise IOError(f"fast_csv_read_f32 rc={got}")
        return out[:got]
    except KeyError:
        raise
    except Exception:
        return _pandas_fallback(path, columns)


def _pandas_fallback(path: str, columns: Sequence[str]) -> np.ndarray:
    import pandas as pd

    df = pd.read_csv(path, usecols=list(columns))
    return df[list(columns)].to_numpy(dtype=np.float32)
