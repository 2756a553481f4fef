"""Golden-fixture regression: recompute NAP scores for the checked-in
caltime-style fixture with the checked-in model + whitening stats; they must
match the frozen `nap_score` column (the reference's caltime_test.csv
contract, SURVEY.md C22)."""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "datasets", "golden")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN, "caltime_test.csv")),
    reason="golden fixture not generated",
)
def test_nap_scores_match_golden_column():
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.fixture import fixture_to_features
    from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        load_nap_stats,
        nap_score_from_diffs,
    )
    from icra2021_multimodal_ad_tpu.utils.checkpoint import load_checkpoint

    df = pd.read_csv(os.path.join(GOLDEN, "caltime_test.csv"))
    golden = df["nap_score"].to_numpy()

    params, state, meta = load_checkpoint(os.path.join(GOLDEN, "model"))
    c = meta["config"]
    cfg = Config(sensor=c["sensor"], n_layers=c["n_layers"],
                 btl_size=c["btl_size"], seed=c["seed"])
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model = build_autoencoder(cfg)
    stats = load_nap_stats(os.path.join(GOLDEN, "nap_stats.npz"))

    x = fixture_to_features(df, cfg)
    scores = np.asarray(
        nap_score_from_diffs(stats, get_diffs(x, model, params, state))
    )
    # CPU (generation) vs any backend (replay): SVD-whitened scores agree to
    # float32 tolerance
    np.testing.assert_allclose(scores, golden, rtol=2e-3)
