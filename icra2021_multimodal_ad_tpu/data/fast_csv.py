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
    lib.fast_csv_read_f64.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
    ]
    lib.fast_csv_read_f64.restype = ctypes.c_long
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.fast_csv_read_col_str.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        u8p,
        ctypes.c_long,
    ]
    lib.fast_csv_read_col_str.restype = ctypes.c_long
    lib.fast_csv_read_light.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.c_int,
        u8p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.fast_csv_read_light.restype = ctypes.c_long


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


def _str_caps(path: str, n_cols: int):
    """(initial, full) byte caps for one-column text extraction: start from
    a rows-derived estimate (a whole-file buffer would transiently allocate
    hundreds of MB to hold a ~0.1%-of-file column on canonical shards) and
    grow to the file size — a true upper bound — on a -3 retry."""
    size = os.path.getsize(path)
    bound = size // max(n_cols, 1) + 1  # rows <= size / min row bytes
    return min(size, max(4096, 32 * bound)), size


def read_string_column(path: str, column: str) -> Optional[List[str]]:
    """All values of one string column, in row order; None when the native
    path is unavailable (caller falls back to pandas)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        header = read_header(path)
        col_idx = header.index(column)
        for cap in _str_caps(path, len(header)):
            buf = np.empty(max(cap, 1), dtype=np.uint8)
            got = lib.fast_csv_read_col_str(path.encode(), col_idx, buf,
                                            cap)
            if got != -3:  # -3: buffer too small, retry with the full cap
                break
        if got < 0:
            raise IOError(f"fast_csv_read_col_str rc={got}")
        if got == 0:
            return []
        return buf[:got].tobytes().decode("utf-8").split("\n")
    except Exception:
        return None


def read_light_frame(path: str, columns: Sequence[str],
                     string_columns: Sequence[str] = ("data_dir",),
                     int_columns: Sequence[str] = (
                         "cur_depth_id", "cur_hand_id", "label")):
    """The light-column frame of one shard as a DataFrame with the columns
    in FILE order (matching pandas usecols semantics): numeric columns via
    the threaded float64 reader, string columns via the single-column
    extractor.  Returns None when the native path is unavailable or any
    column is missing — the caller falls back to pandas.  Measured ~2.7x
    the pandas usecols parse on the 984-column data_sum schema.

    `int_columns` names the ETL-schema columns pandas would infer as int64;
    they are cast back from the float64 parse when lossless (all present
    and integral) so the frame's dtypes — and therefore .feature_cache
    entries and ds.df consumers — don't depend on whether the native
    library or the pandas fallback built them.  (A file writing an id as
    `3.0` would be float64 under pandas and int64 here; the ETL never does.)
    """
    lib = get_lib()
    if lib is None:
        return None
    import pandas as pd

    try:
        header = read_header(path)
        want = [c for c in header if c in set(columns)]
        if sorted(want) != sorted(set(columns) & set(header)) or \
                len(want) != len(columns):
            return None  # missing columns: let pandas raise its own error
        strs = [c for c in want if c in set(string_columns)]
        numeric = [c for c in want if c not in set(string_columns)]
        sel = np.asarray([header.index(c) for c in numeric], dtype=np.int32)
        if len(strs) > 1:  # not a data_sum schema; take the simple path
            return _light_frame_multi_str(lib, path, header, want, strs,
                                          numeric, sel, int_columns)

        # rows <= file_size / minimal row bytes.  A row of EMPTY fields is
        # (total_cols-1) commas + '\n' = total_cols bytes, so size//cols is
        # a true upper bound even for shards whose NaNs pandas wrote as
        # empty cells (the earlier 2*cols-1 bound assumed 1-char fields and
        # silently truncated such shards).  Allocating for the bound lets
        # ONE native call do the whole read, instead of a dims() pre-pass
        # re-scanning the file just to size the buffer exactly.
        size = os.path.getsize(path)
        bound = size // max(len(header), 1) + 1
        out = np.empty((bound, max(len(numeric), 1)), dtype=np.float64)
        str_col = header.index(strs[0]) if strs else -1
        str_written = ctypes.c_long(0)
        caps = _str_caps(path, len(header)) if strs else (1,)
        for str_cap in caps:
            str_buf = np.empty(max(str_cap, 1), dtype=np.uint8)
            got = lib.fast_csv_read_light(path.encode(), sel, len(numeric),
                                          out, bound, str_col, str_buf,
                                          str_cap,
                                          ctypes.byref(str_written))
            if got != -3:  # -3: string buffer too small, retry full-size
                break
        if got < 0:
            raise IOError(f"fast_csv_read_light rc={got}")
        if got == 0 or got >= bound:
            # got==0: header-only shard (pandas produces its usual empty
            # frame).  got>=bound: the bound math failed — never trust a
            # possibly-capped read (silent truncation of training data).
            return None
        data = {}
        for c in want:
            if c in set(string_columns):
                vals = str_buf[: str_written.value].tobytes().decode(
                    "utf-8").split("\n")
                if len(vals) != got or "" in vals:
                    # empty cells (pandas-written NaNs): the fallback's
                    # NaN-in-object-column semantics are not worth
                    # replicating here; the ETL never writes them
                    return None
                data[c] = _infer_like_pandas(pd, vals)
            else:
                col = _int_cast(out[:got, numeric.index(c)],
                                c in set(int_columns))
                if col is None:
                    return None  # NaN/fractional id: pandas decides
                data[c] = col
        return pd.DataFrame(data)
    except Exception:
        return None


def _infer_like_pandas(pd, vals):
    """Run pandas' OWN inference on raw text values so the dtype matches
    the usecols fallback exactly: numeric episode names become int64
    there, and the objectsplit isin() filter compares str-vs-int64 to an
    all-False mask if handed Python strings instead."""
    import io

    ser = pd.read_csv(io.StringIO("\n".join(vals)), header=None,
                      skip_blank_lines=False)[0]
    return ser.to_numpy()


def _int_cast(col: np.ndarray, is_int_column: bool):
    """Lossless int64 cast for declared integer columns (dtype parity with
    the pandas fallback); None when values aren't all present+integral."""
    if not is_int_column:
        return col
    if not (np.isfinite(col).all() and (col == np.floor(col)).all()):
        return None
    return col.astype(np.int64)


def _light_frame_multi_str(lib, path, header, want, strs, numeric, sel,
                           int_columns):
    """>1 string columns (not the data_sum schema): per-column extraction.
    Same output contract as read_light_frame."""
    import pandas as pd

    n_rows, _ = dims(path)
    out = np.empty((n_rows, max(len(numeric), 1)), dtype=np.float64)
    got = lib.fast_csv_read_f64(path.encode(), sel, len(numeric), out,
                                n_rows)
    if got <= 0:
        if got < 0:
            raise IOError(f"fast_csv_read_f64 rc={got}")
        return None
    data = {}
    for c in want:
        if c in set(strs):
            vals = read_string_column(path, c)
            if vals is None or len(vals) != got or "" in vals:
                return None  # empty cells: pandas NaN semantics apply
            data[c] = _infer_like_pandas(pd, vals)
        else:
            col = _int_cast(out[:got, numeric.index(c)],
                            c in set(int_columns))
            if col is None:
                return None
            data[c] = col
    return pd.DataFrame(data)
