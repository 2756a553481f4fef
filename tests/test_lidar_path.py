"""LiDAR sensor mode: native CSV reader -> 2048-dim fused features -> AE."""

import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.data.dataset import TabularDataset
from icra2021_multimodal_ad_tpu.data.synthetic import generate_data_sum_shards


def test_lidar_dataset_build(tmp_path):
    root = str(tmp_path)
    generate_data_sum_shards(root, n_episodes=4, steps_per_episode=20,
                             n_shards=2, n_lidar=963, seed=3,
                             write_images=False)
    cfg = Config(sensor="LiDAR", data_folder_name=root, slicing_size=80,
                 verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    ds = TabularDataset(cfg)
    assert ds.data.shape == (80, 2048)
    assert np.isfinite(np.asarray(ds.data)).all()
    assert ds.targets.shape == (80,)
