"""Native metric implementations vs sklearn (the reference's metric backend,
utils/metric.py:29-130)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from icra2021_multimodal_ad_tpu.ops import metrics as M


def _cases():
    rng = np.random.default_rng(0)
    cases = []
    # generic random scores
    y = rng.integers(0, 2, 200).astype(bool)
    s = rng.normal(size=200)
    cases.append((y, s))
    # heavy ties (quantized scores)
    s_tied = np.round(rng.normal(size=200), 1)
    cases.append((y, s_tied))
    # perfect separation
    y2 = np.r_[np.zeros(50, bool), np.ones(50, bool)]
    s2 = np.r_[rng.uniform(0, 0.4, 50), rng.uniform(0.6, 1.0, 50)]
    cases.append((y2, s2))
    # all-identical scores
    cases.append((y, np.ones(200)))
    # tiny
    cases.append((np.array([0, 1], bool), np.array([0.3, 0.7])))
    return cases


@pytest.mark.parametrize("case", range(5))
def test_auroc_matches_sklearn(case):
    y, s = _cases()[case]
    ours = M.get_auc_roc(s, y)
    ref = skm.roc_auc_score(y, s)
    assert ours == pytest.approx(ref, abs=1e-12)


@pytest.mark.parametrize("case", range(5))
def test_aupr_matches_sklearn(case):
    y, s = _cases()[case]
    ours = M.get_auc_prc(s, y)
    p, r, _ = skm.precision_recall_curve(y, s)
    ref = skm.auc(r, p)
    assert ours == pytest.approx(ref, abs=1e-12)


def test_roc_curve_points_match_sklearn():
    y, s = _cases()[1]
    fpr, tpr, thr = M.roc_curve(y, s)
    rf, rt, rthr = skm.roc_curve(y, s, drop_intermediate=False)
    np.testing.assert_allclose(fpr, rf, atol=1e-12)
    np.testing.assert_allclose(tpr, rt, atol=1e-12)
    # sklearn's first threshold is inf too
    np.testing.assert_allclose(thr[1:], rthr[1:], atol=1e-12)


def test_pr_curve_points_match_sklearn():
    y, s = _cases()[1]
    p, r, thr = M.precision_recall_curve(y, s)
    rp, rr, rthr = skm.precision_recall_curve(y, s)
    np.testing.assert_allclose(p, rp, atol=1e-12)
    np.testing.assert_allclose(r, rr, atol=1e-12)
    np.testing.assert_allclose(thr, rthr, atol=1e-12)


def test_degenerate_labels_return_zero():
    # single-class labels: reference returns 0.0 (utils/metric.py:41-42)
    s = np.random.default_rng(1).normal(size=10)
    assert M.get_auc_roc(s, np.zeros(10, bool)) == 0.0
    assert M.get_auc_prc(s, np.zeros(10, bool)) == 0.0


def test_f1_quantile_override():
    rng = np.random.default_rng(2)
    valid = rng.normal(size=1000)
    test = rng.normal(size=500) + 0.5
    label = rng.integers(0, 2, 500).astype(bool)
    f1, thr = M.get_f1_score(valid, test, label)
    # hardcoded 0.90 quantile (utils/metric.py:120)
    assert thr == pytest.approx(np.quantile(valid, 0.90))
    pred = test > thr
    p = (pred & label).sum() / pred.sum()
    r = (pred & label).sum() / label.sum()
    assert f1 == pytest.approx(2 * p * r / (p + r))


def test_f1_multi_quantile_escape_hatch():
    """quantile_override=None honors f1_quantiles — one scalar pair for a
    single quantile, parallel lists for several."""
    rng = np.random.default_rng(4)
    valid = rng.normal(size=1000)
    test = rng.normal(size=500) + 0.5
    label = rng.integers(0, 2, 500).astype(bool)
    f1, thr = M.get_f1_score(valid, test, label, f1_quantiles=(0.99,),
                             quantile_override=None)
    assert np.isscalar(thr) and thr == pytest.approx(np.quantile(valid, 0.99))
    f1s, thrs = M.get_f1_score(valid, test, label,
                               f1_quantiles=(0.90, 0.99),
                               quantile_override=None)
    assert len(f1s) == len(thrs) == 2
    assert thrs[0] == pytest.approx(np.quantile(valid, 0.90))
    assert thrs[1] == pytest.approx(np.quantile(valid, 0.99))


def test_confusion_matrix_matches_sklearn():
    rng = np.random.default_rng(3)
    s = rng.normal(size=300)
    y = rng.integers(0, 2, 300).astype(bool)
    thr = 0.1
    p, r = M.get_confusion_matrix(s, y, thr)
    pred = s >= thr
    tn, fp, fn, tp = skm.confusion_matrix(y, pred).ravel()
    assert p == pytest.approx(tp / (tp + fp))
    assert r == pytest.approx(tp / (tp + fn))


def test_auroc_device_matches_host():
    import jax.numpy as jnp

    for case in range(3):
        y, s = _cases()[case]
        dev = float(M.auroc_device(jnp.asarray(s), jnp.asarray(y)))
        ref = skm.roc_auc_score(y, s)
        assert dev == pytest.approx(ref, abs=1e-5)
