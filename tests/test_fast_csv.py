"""Native CSV reader vs pandas: correctness on the data_sum schema
(numeric columns, string column, quoted fields, NaN behavior) + speed sanity."""

import os
import time

import numpy as np
import pandas as pd
import pytest

from icra2021_multimodal_ad_tpu.data import fast_csv


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n),
        "mfcc00": rng.normal(size=n),
        "cur_hand_weight": rng.uniform(0, 400, n),
        "data_dir": [f"ep{i % 7:04d}" for i in range(n)],
        "LiDAR000": rng.uniform(0.2, 5, n),
        "label": rng.integers(0, 2, n),
    })
    p = str(tmp_path_factory.mktemp("csv") / "data_sum0.csv")
    df.to_csv(p, index=False)
    return p


def test_native_lib_builds():
    # a build/ABI regression must FAIL here, not silently skip the whole
    # native suite into the pandas fallback (g++ is part of the toolchain)
    assert fast_csv.get_lib() is not None, "native CSV reader failed to build"


def test_dims(csv_path):
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    rows, cols = fast_csv.dims(csv_path)
    assert rows == 500
    assert cols == 6


def test_read_columns_matches_pandas(csv_path):
    cols = ["mfcc00", "cur_hand_weight", "LiDAR000", "label"]
    ours = fast_csv.read_columns(csv_path, cols)
    ref = pd.read_csv(csv_path)[cols].to_numpy(dtype=np.float32)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_string_column_parses_to_nan(csv_path):
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    out = fast_csv.read_columns(csv_path, ["data_dir"])
    assert np.isnan(out).all()


def test_unknown_column_raises(csv_path):
    with pytest.raises(KeyError):
        fast_csv.read_columns(csv_path, ["nope"])


def test_quoted_fields(tmp_path):
    p = str(tmp_path / "q.csv")
    with open(p, "w") as f:
        f.write('a,b,c\n1.5,"hello, world",2.5\n3.0,"x",4.0\n')
    out = fast_csv.read_columns(p, ["a", "c"])
    np.testing.assert_allclose(out, [[1.5, 2.5], [3.0, 4.0]])


def test_quoted_newline_defers_to_pandas(tmp_path):
    """A quoted cell containing a newline would desync the native line
    splitter from pandas — quoted files are rejected by the C reader (-5)
    and read wholesale through the pandas fallback."""
    p = str(tmp_path / "qn.csv")
    with open(p, "w") as f:
        f.write('a,s,b\n1.5,"line one\nline two",2.5\n3.0,plain,4.0\n')
    out = fast_csv.read_columns(p, ["a", "b"])
    np.testing.assert_allclose(out, [[1.5, 2.5], [3.0, 4.0]])
    if fast_csv.get_lib() is not None:
        with pytest.raises(IOError):
            fast_csv.dims(p)  # native reader declines quoted files


def test_duplicate_column_request(csv_path):
    """Duplicate selections would clobber the native slot table (earlier
    copy stuck at NaN); the C reader rejects them and pandas serves both."""
    out = fast_csv.read_columns(csv_path, ["mfcc00", "mfcc00"])
    assert out.shape == (500, 2)
    np.testing.assert_allclose(out[:, 0], out[:, 1])
    assert not np.isnan(out).any()


def test_dims_matches_read_on_crlf_blank_lines(tmp_path):
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    p = str(tmp_path / "crlf2.csv")
    with open(p, "wb") as f:
        f.write(b"a,b\r\n1,2\r\n3,4\r\n\r\n")  # trailing '\r'-only line
    rows, _ = fast_csv.dims(p)
    out = fast_csv.read_columns(p, ["a", "b"])
    assert rows == len(out) == 2


def test_space_padded_fields_parse(tmp_path):
    """strtof skipped leading whitespace; from_chars does not — the reader
    must tolerate space-padded cells rather than silently yielding NaN."""
    p = str(tmp_path / "ws.csv")
    with open(p, "w") as f:
        f.write("a,b\n 1.5,\t2.5\n3.0, 4.0\n")
    out = fast_csv.read_columns(p, ["a", "b"])
    np.testing.assert_allclose(out, [[1.5, 2.5], [3.0, 4.0]])
    assert not np.isnan(out).any()


def test_crlf_and_trailing_newline(tmp_path):
    p = str(tmp_path / "crlf.csv")
    with open(p, "wb") as f:
        f.write(b"a,b\r\n1,2\r\n3,4\r\n\r\n")
    out = fast_csv.read_columns(p, ["a", "b"])
    np.testing.assert_allclose(out, [[1, 2], [3, 4]])


def test_speed_vs_pandas(tmp_path):
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    n, w = 4000, 400
    df = pd.DataFrame(rng.normal(size=(n, w)),
                      columns=[f"c{i:03d}" for i in range(w)])
    p = str(tmp_path / "wide.csv")
    df.to_csv(p, index=False)
    cols = list(df.columns)

    t0 = time.perf_counter()
    ours = fast_csv.read_columns(p, cols)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = pd.read_csv(p)[cols].to_numpy(dtype=np.float32)
    t_pandas = time.perf_counter() - t0

    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # native should not be slower than pandas by more than 2x (usually much
    # faster); this is a sanity bound, not a benchmark
    assert t_native < t_pandas * 2, (t_native, t_pandas)
