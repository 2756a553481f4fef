#!/usr/bin/env python
"""Generate the checked-in golden evaluation fixture.

Capability parity with the reference's frozen regression artifacts
(SURVEY.md §4 / C22): `datasets/caltime_test.csv` (windows + precomputed
`nap_score` column), a trained model checkpoint, and the fitted NAP
whitening stats.  Together they pin the full eval path — any numerical
drift in fusion, the AE forward, RaPP diffs, SVD whitening, or scoring
shows up as a golden mismatch in tests/test_golden_fixture.py.

Run from the repo root (CPU is fine and preferred for determinism):
    JAX_PLATFORMS=cpu python scripts/make_golden_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.data.fixture import fixture_to_features
from icra2021_multimodal_ad_tpu.data.synthetic import generate_data_sum_shards
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
from icra2021_multimodal_ad_tpu.ops.scoring import (
    concat_diffs,
    nap_fit,
    nap_score_from_diffs,
    save_nap_stats,
)
from icra2021_multimodal_ad_tpu.train import NoveltyDetecter
from icra2021_multimodal_ad_tpu.utils.checkpoint import save_checkpoint

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "datasets", "golden")


def main():
    os.makedirs(OUT, exist_ok=True)
    tmp = os.path.join(OUT, "_raw")
    shard_paths = generate_data_sum_shards(
        tmp, n_episodes=8, steps_per_episode=30,
        n_shards=2, seed=7, write_images=False)

    cfg = Config(
        sensor="All", data_folder_name=tmp, slicing_size=240, batch_size=48,
        n_epochs=8, n_layers=3, btl_size=16, verbose=0, seed=7,
    )
    cfg = cfg.replace(input_size=get_input_size(cfg))
    # no images on disk -> the deterministic placeholder path is the contract
    model, params, state = get_model(cfg)

    # features via the fixture path (placeholder images), so the golden test
    # replays the exact same pipeline
    df_all = pd.concat(
        [pd.read_csv(p) for p in shard_paths], ignore_index=True,
    )
    x = fixture_to_features(df_all, cfg)
    y = df_all["label"].to_numpy()
    normal = np.where(y == 0)[0]

    det = NoveltyDetecter(cfg)
    res = det.train(model, params, state, x[normal[:150]], x[normal[150:]])

    train_diffs = get_diffs(x[normal[:150]], model, res.params, res.state)
    stats = nap_fit(concat_diffs(train_diffs))

    # fixture rows: 10 windows, mixed normal/drop, like caltime_test.csv.
    # NOTE on normalization: fixture_to_features min-max-normalizes over the
    # 10 fixture rows only — exactly what the reference's FullTest did to
    # caltime_test.csv (its local get_loaders normalized the 10-row batch,
    # FullTest.py:144-203), so the golden scores pin the same per-batch
    # normalization quirk rather than the 240-row training scaling.
    idx = list(np.where(y == 0)[0][:6]) + list(np.where(y == 1)[0][:4])
    fixture_df = df_all.iloc[idx].reset_index(drop=True)
    fx = fixture_to_features(fixture_df, cfg)
    scores = np.asarray(
        nap_score_from_diffs(stats, get_diffs(fx, model, res.params, res.state))
    )
    fixture_df["nap_score"] = scores

    fixture_df.to_csv(os.path.join(OUT, "caltime_test.csv"), index=False)
    save_checkpoint(os.path.join(OUT, "model"), res.params, res.state,
                    config=cfg)
    save_nap_stats(os.path.join(OUT, "nap_stats.npz"), stats)

    import shutil

    shutil.rmtree(tmp)
    print("golden fixture written:", sorted(os.listdir(OUT)))
    print("nap scores:", np.round(scores, 4))


if __name__ == "__main__":
    main()
