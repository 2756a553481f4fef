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
