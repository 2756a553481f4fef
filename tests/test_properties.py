"""Property-based tests (hypothesis) for the pure-host numerics whose edge
cases example tests can't enumerate: ETL alignment vs a brute-force scan,
native curve metrics vs sklearn on arbitrary score/label draws, checkpoint
pytree round-trips on arbitrary nesting."""

import numpy as np
from hypothesis import given, settings, strategies as st

from icra2021_multimodal_ad_tpu.data.etl import align_stream

_settings = settings(max_examples=60, deadline=None)


@st.composite
def _stream_and_grid(draw):
    n = draw(st.integers(1, 40))
    gaps = draw(st.lists(st.floats(0.001, 0.3), min_size=n, max_size=n))
    timegaps = np.cumsum(np.asarray(gaps))
    g0 = draw(st.floats(0.0, 2.0))
    steps = draw(st.integers(1, 30))
    grid = np.round(g0 + 0.1 * np.arange(steps), 6)
    return timegaps, grid


@_settings
@given(_stream_and_grid())
def test_align_stream_matches_bruteforce(case):
    """align_stream == the reference's linear scan: index of the FIRST
    sample with t <= timegap <= t + 0.1, else -1 (concatdata_maker.py:
    64-105 semantics), for arbitrary jittered streams and grids."""
    timegaps, grid = case
    got = align_stream(grid, timegaps)
    for t, idx in zip(grid, got):
        inside = np.nonzero((timegaps >= t) & (timegaps <= t + 0.1))[0]
        expect = inside[0] if len(inside) else -1
        assert idx == expect, (t, idx, expect)


@_settings
@given(
    st.lists(st.floats(-1e3, 1e3), min_size=4, max_size=60),
    st.data(),
)
def test_curve_metrics_match_sklearn(scores, data):
    """Native ROC/PR AUC == sklearn on arbitrary draws, including heavy
    ties (scores rounded to force them)."""
    import sklearn.metrics as skm

    from icra2021_multimodal_ad_tpu.ops.metrics import (
        get_auc_prc,
        get_auc_roc,
    )

    n = len(scores)
    labels = np.asarray(
        data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    )
    if labels.all() or not labels.any():
        return  # degenerate labels covered by example tests
    s = np.round(np.asarray(scores), 1)  # force ties
    assert np.isclose(get_auc_roc(s, labels),
                      skm.roc_auc_score(labels, s), atol=1e-9)
    prec, rec, _ = skm.precision_recall_curve(labels, s)
    assert np.isclose(get_auc_prc(s, labels),
                      skm.auc(rec, prec), atol=1e-9)


_leaf = st.one_of(
    st.floats(-1e6, 1e6, allow_nan=False).map(
        lambda v: np.float32(v)),
    st.lists(st.floats(-10, 10), min_size=1, max_size=4).map(
        lambda v: np.asarray(v, np.float32)),
)
_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=122),
    min_size=1, max_size=6,
).filter(lambda k: "." not in k)
_tree = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.dictionaries(_keys, children, min_size=1, max_size=3),
        st.lists(children, min_size=1, max_size=3),
    ),
    max_leaves=12,
)


@_settings
@given(st.dictionaries(_keys, _tree, min_size=1, max_size=3))
def test_checkpoint_pytree_roundtrip(tree):
    """Arbitrary nested dict/list pytrees survive the flat-npz checkpoint
    format (structure AND values)."""
    import os
    import tempfile

    import jax

    from icra2021_multimodal_ad_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        _roundtrip(tree, path)


def _roundtrip(tree, path):
    import jax

    from icra2021_multimodal_ad_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    save_checkpoint(path, tree, {})
    back, _, _ = load_checkpoint(path)
    assert (jax.tree.structure(back, is_leaf=lambda x: isinstance(x, np.ndarray))
            == jax.tree.structure(tree, is_leaf=lambda x: isinstance(x, np.ndarray)))
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_anomaly_scale_controls_signature_not_noise():
    """The hardened-AUROC generator knobs (bench probe, VERDICT r5):
    same args => byte-identical shards (the probe data cache and the
    trained-params cache both key on content); anomaly_scale=0 with
    vary_severity erases the drop signature (labeled rows' hand-weight
    matches normal rows) while scale=1 separates them by the full
    100-180 g drop — i.e. the scale moves ONLY the anomaly deltas, the
    sensor noise floor stays put."""
    import os
    import tempfile

    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )

    def gen(d, scale):
        generate_data_sum_shards(
            d, n_episodes=6, steps_per_episode=20, n_shards=1,
            n_lidar=12, seed=3, write_images=False,
            anomaly_scale=scale, vary_severity=True)
        return os.path.join(d, "data_sum0.csv")

    with tempfile.TemporaryDirectory() as a, \
            tempfile.TemporaryDirectory() as b, \
            tempfile.TemporaryDirectory() as c:
        p0 = gen(a, 0.0)
        p0b = gen(b, 0.0)
        with open(p0, "rb") as f1, open(p0b, "rb") as f2:
            assert f1.read() == f2.read()  # determinism

        df0 = pd.read_csv(p0)
        df1 = pd.read_csv(gen(c, 1.0))
        w0_norm = df0[df0.label == 0].cur_hand_weight.mean()
        w0_drop = df0[df0.label == 1].cur_hand_weight.mean()
        w1_drop = df1[df1.label == 1].cur_hand_weight.mean()
        # scale 0: signature gone (weight noise is sigma=2 around a
        # per-episode baseline spread over U(150, 250))
        assert abs(w0_drop - w0_norm) < 25, (w0_drop, w0_norm)
        # scale 1: the 100-180 g drop (x severity >= 0.25) separates
        assert w0_norm - w1_drop > 30, (w0_norm, w1_drop)
