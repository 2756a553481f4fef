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


@pytest.fixture(scope="module")
def data_sum_path(tmp_path_factory):
    """A shard with the real data_sum column layout: light columns up
    front, 963 LiDAR columns in the middle, `label` last — the shape the
    head/tail split in parse_line is designed around."""
    rng = np.random.default_rng(3)
    n = 200
    cols = {"time": np.arange(n) * 0.1}
    for i in range(13):
        cols[f"mfcc{i:02d}"] = rng.normal(size=n)
    cols["cur_depth_id"] = rng.integers(0, 500, n)
    cols["cur_hand_id"] = rng.integers(0, 500, n)
    cols["cur_hand_weight"] = rng.uniform(0, 400, n)
    cols["data_dir"] = [f"2020_ep{i % 7:04d}" for i in range(n)]
    for i in range(963):
        cols[f"LiDAR{i:03d}"] = rng.uniform(0.2, 5, n)
    cols["label"] = rng.integers(0, 2, n)
    p = str(tmp_path_factory.mktemp("sum") / "data_sum0.csv")
    pd.DataFrame(cols).to_csv(p, index=False)
    return p


LIGHT = [f"mfcc{i:02d}" for i in range(13)] + [
    "cur_depth_id", "cur_hand_id", "cur_hand_weight", "data_dir", "label",
]


def test_light_frame_matches_pandas(data_sum_path):
    ours = fast_csv.read_light_frame(data_sum_path, LIGHT)
    if ours is None:
        pytest.skip("native lib unavailable")
    ref = pd.read_csv(data_sum_path, usecols=lambda c: c in LIGHT)
    assert list(ours.columns) == list(ref.columns)  # file order
    for c in ref.columns:
        if ours[c].dtype.kind in "if":
            # from_chars is correctly rounded; pandas' xstrtod is not —
            # they may differ in the last double ulp (narrowed to float32
            # downstream, where both round identically)
            np.testing.assert_allclose(
                ours[c].to_numpy().astype(float),
                ref[c].to_numpy().astype(float), rtol=1e-11, err_msg=c)
        else:
            assert ours[c].dtype == ref[c].dtype
            assert (ours[c] == ref[c]).all(), c


def test_light_frame_dtype_parity(data_sum_path):
    """Frame dtypes must not depend on whether the native reader or the
    pandas fallback built it (cache entries and ds.df consumers see both):
    int columns int64, floats float64, data_dir str."""
    ours = fast_csv.read_light_frame(data_sum_path, LIGHT)
    if ours is None:
        pytest.skip("native lib unavailable")
    ref = pd.read_csv(data_sum_path, usecols=lambda c: c in LIGHT)
    for c in ref.columns:
        assert ours[c].dtype == ref[c].dtype, (
            c, ours[c].dtype, ref[c].dtype)
    assert ours["label"].dtype == np.int64


def test_light_frame_header_only_falls_back(data_sum_path, tmp_path):
    """ETL killed right after writing the header: the native path must
    defer to pandas (which returns its usual empty frame), not raise."""
    p = str(tmp_path / "empty_sum0.csv")
    with open(data_sum_path) as f:
        open(p, "w").write(f.readline())
    assert fast_csv.read_light_frame(p, LIGHT) is None


def test_light_frame_numeric_data_dir_dtype(data_sum_path, tmp_path):
    """Numeric episode names must come back int64 exactly as pandas infers
    them — the objectsplit isin() filter compares str-vs-int64 to an
    all-False mask otherwise (silently empty dataset)."""
    df = pd.read_csv(data_sum_path)
    df["data_dir"] = np.arange(len(df)) + 20200000
    p = str(tmp_path / "num_sum0.csv")
    df.to_csv(p, index=False)
    ours = fast_csv.read_light_frame(p, LIGHT)
    if ours is None:
        pytest.skip("native lib unavailable")
    ref = pd.read_csv(p, usecols=lambda c: c in LIGHT)
    assert ours["data_dir"].dtype == ref["data_dir"].dtype == np.int64
    assert (ours["data_dir"] == ref["data_dir"]).all()


def test_light_frame_refuses_torn_tail_row(data_sum_path, tmp_path):
    """A row torn mid-write by a crashed appender would misattribute the
    backward-scanned `label` out of a LiDAR field — the reader must refuse
    the file (pandas fallback), not parse it."""
    lines = open(data_sum_path).read().splitlines()
    torn = lines[:51]
    torn.append(lines[51][: len(lines[51]) // 2])  # half a row
    p = str(tmp_path / "torn_sum0.csv")
    open(p, "w").write("\n".join(torn))
    assert fast_csv.read_light_frame(p, LIGHT) is None


def test_light_frame_empty_cells_not_truncated(data_sum_path, tmp_path):
    """Shards whose NaNs pandas wrote as EMPTY fields shrink each row well
    below the 1-char-per-field estimate — the row bound must still cover
    every row (an earlier bound silently returned 37 of 50 rows), and the
    values must match the pandas fallback."""
    df = pd.read_csv(data_sum_path)
    for i in range(963):
        df[f"LiDAR{i:03d}"] = np.nan  # -> empty cells on disk
    p = str(tmp_path / "nan_sum0.csv")
    df.to_csv(p, index=False)
    ours = fast_csv.read_light_frame(p, LIGHT)
    ref = pd.read_csv(p, usecols=lambda c: c in LIGHT)
    if ours is None:
        pytest.skip("native lib unavailable")
    assert len(ours) == len(ref) == len(df)
    for c in ref.columns:
        if ours[c].dtype.kind in "if":
            np.testing.assert_allclose(
                ours[c].to_numpy().astype(float),
                ref[c].to_numpy().astype(float), rtol=1e-11, err_msg=c)
        else:
            assert (ours[c] == ref[c]).all(), c


def test_light_frame_empty_data_dir_falls_back(data_sum_path, tmp_path):
    """An empty data_dir cell (trailing or mid-file) must defer to pandas
    — the fallback's NaN-in-object-column semantics — not crash with a
    length-mismatch ValueError from the frame constructor."""
    df = pd.read_csv(data_sum_path)
    df.loc[len(df) - 1, "data_dir"] = np.nan  # last row: empty cell
    p = str(tmp_path / "lastnan_sum0.csv")
    df.to_csv(p, index=False)
    assert fast_csv.read_light_frame(p, LIGHT) is None

    df2 = pd.read_csv(data_sum_path)
    df2.loc[3, "data_dir"] = np.nan  # mid-file empty cell
    p2 = str(tmp_path / "midnan_sum0.csv")
    df2.to_csv(p2, index=False)
    assert fast_csv.read_light_frame(p2, LIGHT) is None


def test_string_column_grow_retry(tmp_path):
    """Long string values overflow the rows-derived initial buffer; the
    -3 grow-and-retry must return the full column, not fail."""
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    n = 50
    long_vals = ["x" * 500 + f"{i:04d}" for i in range(n)]
    df = pd.DataFrame({"a": np.arange(n), "s": long_vals,
                       "b": np.arange(n) * 2.0})
    p = str(tmp_path / "long.csv")
    df.to_csv(p, index=False)
    got = fast_csv.read_string_column(p, "s")
    assert got == long_vals


def test_light_frame_missing_column_falls_back(data_sum_path):
    assert fast_csv.read_light_frame(data_sum_path, LIGHT + ["nope"]) is None


def test_label_reads_via_tail_scan(data_sum_path):
    """`label` is the final of 984 columns; the backward scan must hit it
    exactly (off-by-one here would silently swap it with LiDAR962)."""
    if fast_csv.get_lib() is None:
        pytest.skip("native lib unavailable")
    out = fast_csv.read_columns(data_sum_path, ["label", "LiDAR962"])
    ref = pd.read_csv(data_sum_path)[["label", "LiDAR962"]].to_numpy(
        dtype=np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


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
