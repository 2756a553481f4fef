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
def test_fixture_features_cover_lidar_sensor():
    """sensor='LiDAR' fixtures must build (the LiDAR columns are in the
    data_sum schema; the missing branch previously crashed inside fuse)."""
    import pandas as pd

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.fixture import fixture_to_features
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        paths = generate_data_sum_shards(root, n_episodes=2,
                                         steps_per_episode=10, n_shards=1,
                                         seed=0, write_images=False)
        df = pd.read_csv(paths[0])
    cfg = Config(sensor="LiDAR")
    cfg = cfg.replace(input_size=get_input_size(cfg))
    x = fixture_to_features(df, cfg)
    assert x.shape == (len(df), cfg.input_size)
    assert np.isfinite(np.asarray(x)).all()


def test_fixture_mixed_image_presence(tmp_path):
    """Rows with real PNGs decode; rows without get placeholders — decided
    per row (first-row-only probing crashed or placeholdered everything)."""
    import pandas as pd
    from PIL import Image

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.fixture import _images_or_placeholder

    root = tmp_path / "dsroot"
    img_dir = root / "data" / "ep0" / "data" / "img" / "hand"
    img_dir.mkdir(parents=True)
    # only frame 1 exists; frame 2 is missing
    Image.fromarray(np.full((24, 32, 3), 7, np.uint8)).save(img_dir / "1.png")

    cfg = Config(sensor="All", data_folder_name=str(root))
    cfg = cfg.replace(input_size=get_input_size(cfg))
    df = pd.DataFrame({"data_dir": ["ep0", "ep0"]})
    out = _images_or_placeholder(cfg, df, np.asarray([1, 2]), "hand",
                                 (24, 32, 3))
    assert out.shape == (2, 24, 32, 3)
    np.testing.assert_array_equal(np.asarray(out[0]), 7)  # real frame
    assert not np.all(np.asarray(out[1]) == 7)            # placeholder


def test_dryrun_child_requires_matching_nonce(monkeypatch):
    """A stale _GRAFT_DRYRUN_CHILD env value must not divert the dryrun
    into the parent process (the round-1 failure mode)."""
    import pytest

    import __graft_entry__ as g

    monkeypatch.setenv(g._CHILD_ENV_FLAG, "stale")
    with pytest.raises(RuntimeError, match="nonce"):
        g._dryrun_child(2, "expected-token")


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

def test_full_test_serving_fast_path(tmp_path):
    """run_full_test(--compute_dtype bfloat16 [--nap_quant int8]) scores
    the fixture through the guarded serving pipeline: finite scores,
    strong rank agreement with the exact path (the absolute values differ
    by design — floored effective-rank stats), layer windows rejected."""
    from full_test import run_full_test
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size

    base = Config(sensor="All", n_layers=5, btl_size=100,
                  saved_name=os.path.join(GOLDEN, "model"),
                  train_diffs=os.path.join(GOLDEN, "nap_stats.npz"))
    base = base.replace(input_size=get_input_size(base))
    fixture = os.path.join(GOLDEN, "caltime_test.csv")

    exact, _ = run_full_test(base, fixture)
    for quant in (None, "int8"):
        cfg = base.replace(compute_dtype="bfloat16", nap_quant=quant)
        fast, _ = run_full_test(cfg, fixture)
        assert fast.shape == exact.shape and np.all(np.isfinite(fast))
        # Pearson, not rank: the golden fit is degenerate, so flooring
        # reshuffles near-tied NORMAL windows (rank corr ~0.77) while the
        # anomaly-vs-normal structure — what the score is for — agrees
        corr = np.corrcoef(exact, fast)[0, 1]
        assert corr > 0.99, (quant, corr)

    with pytest.raises(ValueError, match="layer windows"):
        run_full_test(base.replace(compute_dtype="bfloat16",
                                   start_layer_index=1), fixture)

    # --guard_tol: certify against fp32 before scoring; an impossible
    # tolerance aborts.  The guard certifies the CLI's own bundle, so the
    # guarded scores equal the un-guarded fast-path scores exactly.
    cfg16 = base.replace(compute_dtype="bfloat16")
    scores, _ = run_full_test(cfg16, fixture, guard_tol=0.5)
    assert np.all(np.isfinite(scores))
    np.testing.assert_allclose(scores, run_full_test(cfg16, fixture)[0],
                               rtol=1e-6)
    with pytest.raises(ValueError, match="rel err"):
        run_full_test(cfg16, fixture, guard_tol=1e-12)

    # slip trace on the fast path: loss derived from the SAME nap_diffs
    # forward that produced the scores (no second forward dispatch)
    slip = str(tmp_path / "slip.png")
    s2, _ = run_full_test(cfg16, fixture, slip_plot_path=slip)
    assert os.path.exists(slip)
    np.testing.assert_allclose(s2, scores, rtol=1e-6)
