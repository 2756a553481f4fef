"""Native evaluation metrics: ROC / PR curves, AUC, F1, confusion matrix.

Capability parity with utils/metric.py:29-130 of the reference, which calls
sklearn.  Here the curves are computed natively (numpy on host for the exact
sklearn-tie semantics, plus a jittable on-device AUROC for the streaming
path).  Tie handling, threshold dedup, the (0,0) ROC anchor point, and the
PR-curve full-recall cutoff all match sklearn's definitions — verified by
tests/test_metrics.py against sklearn directly.

Reference quirks preserved where they define the output contract:
  * `get_f1_score` hardcodes the threshold quantile to 0.90 regardless of the
    `f1_quantiles` argument (utils/metric.py:120).  We keep the override but
    expose the argument honestly via `quantile_override`.
  * `get_confusion_matrix` binarizes at `score >= threshold`
    (utils/metric.py:94-99) while F1 uses `score > threshold`
    (utils/metric.py:122) — both inherited as-is.
  * AUROC/AUPR return 0.0 when the curve is undefined (single-class labels),
    mirroring the bare `except: return .0` at utils/metric.py:41-42.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_norm(x, norm_type: int = 2):
    """|x|^p elementwise (utils/metric.py:26-27)."""
    if isinstance(x, jax.Array):
        return jnp.abs(x) ** norm_type
    return np.abs(x) ** norm_type


# ---------------------------------------------------------------------------
# Curves (host numpy, exact sklearn semantics)
# ---------------------------------------------------------------------------


def _binary_curve(y_true: np.ndarray, score: np.ndarray):
    """Cumulative TP/FP counts at each distinct score threshold (descending)."""
    y_true = np.asarray(y_true).astype(bool).ravel()
    score = np.asarray(score, dtype=np.float64).ravel()
    order = np.argsort(-score, kind="stable")
    score = score[order]
    y_true = y_true[order]

    # indices where the score value changes -> one point per distinct threshold
    distinct = np.where(np.diff(score))[0]
    threshold_idxs = np.r_[distinct, y_true.size - 1]

    tps = np.cumsum(y_true)[threshold_idxs].astype(np.float64)
    fps = (1 + threshold_idxs) - tps
    thresholds = score[threshold_idxs]
    return fps, tps, thresholds


def roc_curve(y_true, score) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fpr, tpr, thresholds), matching sklearn.metrics.roc_curve
    (drop_intermediate=False; AUC is identical either way)."""
    fps, tps, thresholds = _binary_curve(y_true, score)
    # anchor point at (0, 0) with threshold +inf
    fps = np.r_[0.0, fps]
    tps = np.r_[0.0, tps]
    thresholds = np.r_[np.inf, thresholds]
    if tps[-1] <= 0 or fps[-1] <= 0:
        raise ValueError("roc_curve undefined: only one class present in y_true")
    return fps / fps[-1], tps / tps[-1], thresholds


def precision_recall_curve(y_true, score):
    """(precision, recall, thresholds), matching
    sklearn.metrics.precision_recall_curve."""
    fps, tps, thresholds = _binary_curve(y_true, score)
    if tps[-1] == 0:
        raise ValueError("precision_recall_curve undefined: no positive labels")
    precision = np.divide(tps, tps + fps, out=np.zeros_like(tps), where=(tps + fps) > 0)
    recall = tps / tps[-1]
    # keep points up to (and including) the first full-recall index
    last_ind = int(np.searchsorted(tps, tps[-1])) + 1
    sl = slice(last_ind - 1, None, -1)
    return (
        np.r_[precision[sl], 1.0],
        np.r_[recall[sl], 0.0],
        thresholds[sl],
    )


def auc(x, y) -> float:
    """Trapezoid area under (x, y); x may be increasing or decreasing
    (sklearn.metrics.auc semantics)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.size < 2:
        raise ValueError("auc needs >= 2 points")
    dx = np.diff(x)
    if np.all(dx <= 0):
        return float(-np.trapezoid(y, x))
    if np.all(dx >= 0):
        return float(np.trapezoid(y, x))
    raise ValueError("x is neither increasing nor decreasing")


# ---------------------------------------------------------------------------
# Reference-contract wrappers (utils/metric.py call surface)
# ---------------------------------------------------------------------------


def get_auc_roc(score, test_label, nap: bool = False) -> float:
    try:
        score = np.asarray(score)
        fprs, tprs, _ = roc_curve(test_label, score)
        value = auc(fprs, tprs)
        if nap:
            print("auroc", value)
        return value
    except Exception:
        return 0.0


def get_auc_prc(score, test_label) -> float:
    try:
        score = np.asarray(score)
        precisions, recalls, _ = precision_recall_curve(test_label, score)
        return auc(recalls, precisions)
    except Exception:
        return 0.0


def get_f1_score(valid_score, test_score, test_label, f1_quantiles=(0.99,),
                 quantile_override: float | None = 0.90):
    """F1 at a valid-set quantile threshold (utils/metric.py:115-130).

    The reference unconditionally overrides the quantile to 0.90
    (utils/metric.py:120); pass `quantile_override=None` to honor
    `f1_quantiles` instead.  With one quantile the return is the reference's
    scalar (f1, threshold) pair; with several, parallel lists (the
    reference's un-overridden multi-quantile path never worked — its
    array threshold cannot broadcast against the score vector).
    """
    qs = ([quantile_override] if quantile_override is not None
          else [float(q) for q in np.atleast_1d(f1_quantiles)])
    valid_score = np.asarray(valid_score)
    test_score = np.asarray(test_score)
    test_label = np.asarray(test_label).astype(bool)
    f1s, thresholds = [], []
    for q in qs:
        threshold = float(np.quantile(valid_score, q))
        predictions = test_score > threshold
        denom_p = float(predictions.sum())
        denom_r = float(test_label.sum())
        p = ((predictions & test_label).sum() / denom_p if denom_p
             else float("nan"))
        r = ((predictions & test_label).sum() / denom_r if denom_r
             else float("nan"))
        f1s.append(p * r * 2 / (p + r) if (p + r) else float("nan"))
        thresholds.append(threshold)
    if len(qs) == 1:
        return f1s[0], thresholds[0]
    return f1s, thresholds


def get_confusion_matrix(score, test_label, threshold, verbose: bool = False):
    """(precision, recall) of `score >= threshold` (utils/metric.py:94-110)."""
    score = np.asarray(score)
    test_label = np.asarray(test_label).astype(bool)
    pred = score >= threshold
    tp = int(np.sum(pred & test_label))
    fp = int(np.sum(pred & ~test_label))
    fn = int(np.sum(~pred & test_label))
    tn = int(np.sum(~pred & ~test_label))
    if verbose:
        print(f"Tn, Fp : {tn}, {fp}\nFn, Tp : {fn}, {tp}")
    precision = tp / (tp + fp) if (tp + fp) else float("nan")
    recall = tp / (tp + fn) if (tp + fn) else float("nan")
    return precision, recall


# ---------------------------------------------------------------------------
# On-device AUROC (jittable; used by the streaming path and bench)
# ---------------------------------------------------------------------------


@jax.jit
def auroc_device(score: jax.Array, label: jax.Array) -> jax.Array:
    """Exact AUROC via the rank-statistic (Mann-Whitney U) formulation with
    midrank tie correction — equals the trapezoid ROC AUC, fully on device."""
    score = score.astype(jnp.float32).ravel()
    label = label.astype(jnp.float32).ravel()
    n = score.shape[0]
    order = jnp.argsort(score)
    sorted_scores = score[order]
    sorted_labels = label[order]
    ranks_lo = jnp.searchsorted(sorted_scores, sorted_scores, side="left")
    ranks_hi = jnp.searchsorted(sorted_scores, sorted_scores, side="right")
    midranks = (ranks_lo + ranks_hi + 1.0) / 2.0  # 1-based midranks
    n_pos = jnp.sum(sorted_labels)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(midranks * sorted_labels)
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)
