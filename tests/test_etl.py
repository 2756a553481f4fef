"""ETL: raw episode trees -> aligned data_sum shards (concatdata_maker.py
parity): grid alignment, labeling, MFCC columns, sharding, crash-resume."""

import os

import numpy as np
import pandas as pd
import pytest

from icra2021_multimodal_ad_tpu.data import etl
from icra2021_multimodal_ad_tpu.data.synthetic import generate_raw_episodes


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw"))
    generate_raw_episodes(root, n_episodes=3, duration_s=4.0, n_lidar=50, seed=1)
    return root


def test_drop_burst_audio_clamps_out_of_range_drops():
    """Out-of-clip drop instants clamp into the clip instead of crashing
    on mismatched broadcast shapes or wrapping negatively."""
    from icra2021_multimodal_ad_tpu.data.synthetic import drop_burst_audio

    rng = np.random.default_rng(0)
    for drop_t in (-0.5, 0.0, 3.9, 10.0, None):
        out = drop_burst_audio(np.random.default_rng(0), 4.0, 44100, drop_t)
        assert out.shape == (4 * 44100, 2) and out.dtype == np.int16
    # too-short durations are rejected loudly by the episode generator
    import pytest

    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_raw_episodes,
    )

    with pytest.raises(ValueError, match="duration_s"):
        generate_raw_episodes("/tmp/never", duration_s=0.9)
    del rng


def test_align_stream_semantics():
    # sample must fall in [t, t + 0.1]
    timegaps = np.array([0.05, 0.17, 0.33, 0.41, 0.55])
    grid = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    idx = etl.align_stream(grid, timegaps)
    assert idx.tolist() == [1, -1, 2, 3, 4]


def test_calc_time_bound():
    assert etl.calc_time_bound([0.32], [0.11], [0.28]) == pytest.approx(0.3)


def test_process_episode_schema_and_labels(raw_root):
    ep = sorted(os.listdir(os.path.join(raw_root, "data")))[0]
    df = etl.process_episode(
        os.path.join(raw_root, "data", ep, "data"), ep, n_lidar=50
    )
    for col in ("mfcc00", "mfcc12", "cur_depth_id", "cur_hand_id",
                "cur_hand_weight", "data_dir", "now_timegap", "LiDAR000",
                "LiDAR049", "label"):
        assert col in df.columns
    # drop window: last 0.5 s labeled 1 == 6 grid steps (inclusive bounds)
    labels = df["label"].to_numpy()
    assert labels[-1] == 1 and labels[0] == 0
    assert 4 <= labels.sum() <= 7
    # weight drop visible exactly on the labeled rows
    w = df["cur_hand_weight"].to_numpy()
    assert w[labels == 1].mean() < w[labels == 0].mean() - 100
    # 10 Hz grid
    steps = np.diff(df["now_timegap"].to_numpy())
    np.testing.assert_allclose(steps, 0.1, atol=1e-6)


def test_hsr_preprocess_shards_and_resume(raw_root, tmp_path):
    out1 = str(tmp_path / "out1")
    written = etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out1, episodes_per_shard=2, n_lidar=50
    )
    # 3 episodes, shard size 2 -> data_sum0 (2 eps) + data_sum1 (1 ep)
    assert [os.path.basename(p) for p in written] == [
        "data_sum0.csv", "data_sum1.csv",
    ]
    df0 = pd.read_csv(os.path.join(out1, "data_sum0.csv"))
    assert df0["data_dir"].nunique() == 2
    journal = pd.read_csv(os.path.join(out1, "last_folder.csv"))
    assert len(journal) == 3

    # crash-resume: drop the journal's last entry + rerun -> only ep3 redone,
    # and the final shards are identical
    journal[:-1].to_csv(os.path.join(out1, "last_folder.csv"), index=False)
    etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out1, episodes_per_shard=2, n_lidar=50
    )
    df1 = pd.read_csv(os.path.join(out1, "data_sum1.csv"))
    assert df1["data_dir"].nunique() == 1

    # full rerun with intact journal is a no-op
    before = open(os.path.join(out1, "data_sum0.csv")).read()
    etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out1, episodes_per_shard=2, n_lidar=50
    )
    assert open(os.path.join(out1, "data_sum0.csv")).read() == before


def test_resume_reconciles_unjournaled_shard_rows(raw_root, tmp_path):
    """Crash between the shard append and the journal write leaves the
    in-flight episode's rows in the shard but not in the journal; resume
    must drop and reprocess them exactly once (no duplication, no second
    'id' column from the index round-trip)."""
    out = str(tmp_path / "o")
    etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out, episodes_per_shard=10, n_lidar=50
    )
    fresh = pd.read_csv(os.path.join(out, "data_sum0.csv"))
    # simulate the crash window: journal loses its last entry while the
    # shard keeps that episode's rows
    j = pd.read_csv(os.path.join(out, "last_folder.csv"))
    j[:-1].to_csv(os.path.join(out, "last_folder.csv"), index=False)
    etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out, episodes_per_shard=10, n_lidar=50
    )
    resumed = pd.read_csv(os.path.join(out, "data_sum0.csv"))
    assert list(resumed.columns).count("id") == 1
    assert not any(c.startswith("id.") for c in resumed.columns)
    pd.testing.assert_frame_equal(resumed, fresh)


def test_resume_with_numeric_episode_names(tmp_path):
    """Numeric episode dir names ('0000') must round-trip through the
    journal verbatim — a non-str read turns them into '0'/'1', defeating
    the resume filter and reprocessing every episode."""
    root = str(tmp_path / "raw")
    generate_raw_episodes(root, n_episodes=2, duration_s=2.0, n_lidar=20,
                          seed=3)
    for ep in sorted(os.listdir(os.path.join(root, "data"))):
        os.rename(os.path.join(root, "data", ep),
                  os.path.join(root, "data", ep.replace("ep", "")))
    out = str(tmp_path / "o")
    etl.hsr_preprocess(os.path.join(root, "data"), out,
                       episodes_per_shard=10, n_lidar=20)
    before = open(os.path.join(out, "data_sum0.csv")).read()
    etl.hsr_preprocess(os.path.join(root, "data"), out,
                       episodes_per_shard=10, n_lidar=20)
    assert open(os.path.join(out, "data_sum0.csv")).read() == before
    journal = pd.read_csv(os.path.join(out, "last_folder.csv"), dtype=str)
    assert journal["name"].tolist() == ["0000", "0001"]


def test_etl_output_feeds_dataset_loader(raw_root, tmp_path):
    """The ETL output must be directly consumable by the training pipeline
    (mic + force sensors; images stay in the episode tree)."""
    out = str(tmp_path / "out2")
    etl.hsr_preprocess(
        os.path.join(raw_root, "data"), out, episodes_per_shard=2, n_lidar=50
    )
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.dataset import TabularDataset

    cfg = Config(sensor="mic", data_folder_name=out + "/", slicing_size=60,
                 verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    ds = TabularDataset(cfg)
    assert ds.data.shape[1] == 128
    assert np.isfinite(np.asarray(ds.data)).all()


def _write_legacy_episode(root, name, drop_start=2.5, duration=3.6,
                          n_lidar=15, n_mic=8, seed=0):
    """Raw capture tree in the OLDER schema (datasets/data_preprocess.py):
    extra rgb.csv stream + Microphone.csv carrying per-row sample lists."""
    import os

    rng = np.random.default_rng(seed)
    ep = os.path.join(root, name, "data")
    os.makedirs(ep, exist_ok=True)

    def clock(hz, start):
        t = start + np.cumsum(rng.uniform(0.70 / hz, 0.95 / hz,
                                          int(duration * hz * 1.6)))
        return t[t < duration]

    for stream, start in (("rgb", 0.04), ("depth", 0.05), ("hand", 0.06)):
        t = clock(10, start)
        pd.DataFrame({"time": t, "id": np.arange(1, len(t) + 1),
                      "timegap": t}).to_csv(os.path.join(ep, f"{stream}.csv"))
    t = clock(10, 0.07)
    scans = ["[" + ",".join(f"{v:.3f}" for v in rng.uniform(0.2, 5, n_lidar))
             + "]" for _ in t]
    pd.DataFrame({"data": scans, "time": t, "timegap": t}).to_csv(
        os.path.join(ep, "LiDAR.csv"))
    t = clock(50, 0.02)
    w = np.where(t >= drop_start, 40.0, 210.0) + rng.normal(0, 1, len(t))
    pd.DataFrame({"datetime": t, "timegap": t,
                  "weight": np.round(w, 1)}).to_csv(
        os.path.join(ep, "hand_weight.csv"))
    t = clock(20, 0.03)
    mics = ["[" + ",".join(f"{v:.1f}" for v in rng.normal(0, 300, n_mic))
            + "]" for _ in t]
    pd.DataFrame({"data": mics, "time": t, "timegap": t}).to_csv(
        os.path.join(ep, "Microphone.csv"))
    pd.DataFrame([{"drop_end": drop_start + 0.5,
                   "drop_start": drop_start}]).to_csv(
        os.path.join(ep, "drop_time.csv"))


def test_legacy_etl_variant_schema_and_labels(tmp_path):
    """data_preprocess.py:82-168 parity: rgb-id column + per-row Mic sample
    columns, min-start+1 time bound, single unsharded data_sum.csv."""
    from icra2021_multimodal_ad_tpu.data.etl import (
        hsr_preprocess_legacy,
        process_episode_legacy,
    )

    root = str(tmp_path / "legacy")
    for i in range(2):
        _write_legacy_episode(root, f"ep{i}", seed=i)

    out = hsr_preprocess_legacy(root, str(tmp_path / "data_sum.csv"),
                                n_lidar=15)
    df = pd.read_csv(out)
    for col in ("now_timegap", "cur_rgb_id", "cur_depth_id", "cur_hand_id",
                "cur_hand_weight", "data_dir", "LiDAR000", "LiDAR014",
                "Mic0000", "Mic0007", "label"):
        assert col in df.columns, col
    assert set(df["data_dir"].unique()) == {"ep0", "ep1"}
    assert set(df["label"].unique()) == {0, 1}

    ep0 = df[df["data_dir"] == "ep0"]
    # legacy time bound: starts ~1 s after the earliest stream sample
    assert ep0["now_timegap"].iloc[0] >= 1.0
    # grid ends at drop_start + 0.5, labels exactly the trailing 0.5 s window
    assert ep0["now_timegap"].iloc[-1] <= 3.0 + 1e-6
    labeled = ep0[ep0["label"] == 1]["now_timegap"]
    assert labeled.min() >= 2.5 - 1e-6
    # intended behavior: Mic0000 carries the SAMPLE value, not the index
    # (the reference's data_preprocess.py:134-135 bug stored mi_idx)
    assert not np.allclose(df["Mic0000"], 0.0)

    one = process_episode_legacy(
        str(tmp_path / "legacy" / "ep0" / "data"), "ep0", n_lidar=15)
    assert len(one) == len(ep0)


def test_concatdata_cli_reaches_all_three_variants(tmp_path, monkeypatch):
    """The ETL CLI exposes every reference time-sync generation:
    data_preprocess.py via --variant legacy, the frame-driven prototype via
    --variant frames (concatdata_maker.py is the default path, covered by
    the resume tests)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import concatdata_maker

    root = str(tmp_path / "legacy")
    for i in range(2):
        _write_legacy_episode(root, f"ep{i}", seed=i)

    out1 = str(tmp_path / "out_legacy")  # not pre-created: CLI must mkdir
    monkeypatch.setattr(sys, "argv", [
        "concatdata_maker.py", "--data_dir", root, "--out_dir", out1,
        "--variant", "legacy", "--n_lidar", "15"])
    concatdata_maker.main()
    df = pd.read_csv(os.path.join(out1, "data_sum.csv"))
    assert "Mic0000" in df.columns and "cur_rgb_id" in df.columns

    out2 = str(tmp_path / "out_frames")  # not pre-created: CLI must mkdir
    monkeypatch.setattr(sys, "argv", [
        "concatdata_maker.py",
        "--data_dir", os.path.join(root, "ep0", "data"),
        "--out_dir", out2, "--variant", "frames"])
    concatdata_maker.main()
    df2 = pd.read_csv(os.path.join(out2, "timesync.csv"))
    assert "next_timegap" in df2.columns and len(df2) > 0


def test_no_drop_episode_builds_label0_dataset(tmp_path):
    """Normal (label-0) episodes — the detector's TRAINING data — must flow
    through collection -> ETL even though they have no drop_time.csv
    (review finding: the reference only ever recorded drop episodes)."""
    from icra2021_multimodal_ad_tpu.data.orchestration import (
        PickPlaceScript,
        collect_and_build,
    )

    out = str(tmp_path / "normal")
    shards = collect_and_build(out, n_episodes=2, seed=5, n_lidar=10,
                               episodes_per_shard=2,
                               script=PickPlaceScript(drop=False))
    df = pd.read_csv(shards[0])
    assert len(df) > 20
    assert set(df["label"].unique()) == {0}
    # weight stays in the carried regime (no drop signature)
    assert df["cur_hand_weight"].max() > 150


def test_frame_driven_timesync_prototype(tmp_path):
    """make_timesync_frames (youngjae/preprocess/make_timesync_csv_file.py
    parity): RGB frames define the sync windows; each row carries the first
    depth/LiDAR/weight sample inside its window; no labels."""
    from icra2021_multimodal_ad_tpu.data.etl import make_timesync_frames

    root = str(tmp_path / "proto")
    _write_legacy_episode(root, "ep0", n_lidar=8, seed=2)
    ep = os.path.join(root, "ep0", "data")
    df = make_timesync_frames(ep, out_path=str(tmp_path / "sync.csv"),
                              n_lidar=8)
    assert len(df) > 10
    for col in ("now_timegap", "next_timegap", "cur_rgb_id", "cur_depth_id",
                "cur_hand_weight", "LiDAR000", "LiDAR007"):
        assert col in df.columns, col
    assert "label" not in df.columns  # the prototype predates labels
    # windows are consecutive rgb frames
    assert (df["next_timegap"].values > df["now_timegap"].values).all()
    assert os.path.exists(str(tmp_path / "sync.csv"))
