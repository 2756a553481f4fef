"""Anomaly scores: BASE, SAP, NAP — the three-score evaluation contract.

Capability parity with utils/metric.py:132-238 of the reference:

  * BASE  (`get_recon_loss`):  mean squared input-space reconstruction error.
  * SAP   (`get_d_loss`):      mean of squares over ALL layer diffs, concat
                               on the feature axis.
  * NAP   (`get_d_norm_loss`): concat diffs -> mean-center + SVD rotation
                               (Rotater) -> per-column z-score (Standardizer)
                               -> mean |.|^p.

Each returns the reference's 6-tuple: (score, auroc, aupr, f1, precision,
recall).  Layer-range slicing start/end semantics including the clamping
rules (utils/metric.py:152-162,190-199) are preserved.

TPU-native design: the heavy pieces (concat, SVD fit, rotation matmul,
z-score, row-mean) are all jitted jnp; scores come back to host only for the
tiny curve metrics.  The whitening stats are an explicit, persistable pytree
(NapStats) — the reference pickled raw train diffs instead
(utils/metric.py:205); we persist the fitted stats, which is what the
streaming path actually needs.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.ops.metrics import (
    get_auc_prc,
    get_auc_roc,
    get_confusion_matrix,
    get_f1_score,
    get_norm,
)
from icra2021_multimodal_ad_tpu.ops.normalize import (
    RotaterStats,
    StandardizerStats,
    rotater_fit,
    rotater_fit_gram,
    rotater_run,
    standardizer_fit,
    standardizer_run,
)


class ScoreReport(NamedTuple):
    score: np.ndarray
    auroc: float
    aupr: float
    f1: float
    precision: float
    recall: float

    def astuple(self):
        return tuple(self)


class NapStats(NamedTuple):
    rotater: RotaterStats
    standardizer: StandardizerStats
    #: per-feature abs-max of the train diffs the stats were fitted on
    #: ((K,) fp32) — the int8 serving path's static quantization scales
    #: (ops/serving.nap_int8_pack).  Optional: stats persisted before this
    #: field existed load as None, and every fp32/bf16 path ignores it.
    feat_absmax: Optional[jax.Array] = None


def _slice_range(n_diffs: int, start_layer_index: int,
                 end_layer_index: Optional[int]):
    """Layer-range clamping (utils/metric.py:152-162)."""
    if end_layer_index is None:
        end_layer_index = n_diffs + 1
    if start_layer_index > n_diffs - 1:
        start_layer_index = n_diffs - 1
    if end_layer_index - start_layer_index < 1:
        end_layer_index = start_layer_index + 1
    return start_layer_index, end_layer_index


def concat_diffs(diffs: Sequence[jax.Array], start: int = 0,
                 end: Optional[int] = None) -> jax.Array:
    start, end = _slice_range(len(diffs), start, end)
    return jnp.concatenate([jnp.asarray(d) for d in diffs[start:end]], axis=-1)


@jax.jit
def mean_square_rows(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    return jnp.mean(x * x, axis=-1)


# ---------------------------------------------------------------------------
# BASE
# ---------------------------------------------------------------------------


def get_recon_loss(valid_diff, test_diff, test_label,
                   f1_quantiles=(0.90,)) -> ScoreReport:
    """BASE score (utils/metric.py:132-143): (diff^2).mean(axis=1) on the
    input-space diffs."""
    test_score = np.asarray(mean_square_rows(jnp.asarray(test_diff)))
    valid_score = np.asarray(mean_square_rows(jnp.asarray(valid_diff)))
    return _report(valid_score, test_score, test_label, f1_quantiles)


def _reject_unknown_kwargs(fn_name: str, unknown: dict) -> None:
    if unknown:
        raise TypeError(
            f"{fn_name}() got unexpected keyword argument(s) "
            f"{sorted(unknown)} — only the reference's gpu_id is tolerated "
            f"for signature parity"
        )


# ---------------------------------------------------------------------------
# SAP
# ---------------------------------------------------------------------------


def get_d_loss(train_diffs, valid_diffs, test_diffs, test_label,
               start_layer_index: int = 0,
               end_layer_index: Optional[int] = None,
               norm_type: int = 2,
               f1_quantiles=(0.90,),
               gpu_id: int = -1,
               **unknown) -> ScoreReport:
    """SAP score (utils/metric.py:145-181): mean of squares over concat
    diffs.  Signature-parity notes: `train_diffs` is accepted but unused,
    `norm_type` is accepted but IGNORED (SAP is always mean-of-squares),
    and `gpu_id` is tolerated — all exactly as in the reference
    (metric.py:151-152,171).  Any OTHER unknown kwarg is rejected so typos
    (e.g. method=) don't silently run the default path."""
    _reject_unknown_kwargs("get_d_loss", unknown)
    del train_diffs, gpu_id
    valid_cat = concat_diffs(valid_diffs, start_layer_index, end_layer_index)
    test_cat = concat_diffs(test_diffs, start_layer_index, end_layer_index)
    test_score = np.asarray(mean_square_rows(test_cat))
    valid_score = np.asarray(mean_square_rows(valid_cat))
    return _report(valid_score, test_score, test_label, f1_quantiles)


# ---------------------------------------------------------------------------
# NAP
# ---------------------------------------------------------------------------


def nap_fit(train_diffs_cat: jax.Array, method: str = "svd") -> NapStats:
    """Fit the NAP whitening on concatenated train diffs
    (utils/metric.py:210-214): rotation fit, then per-column standardization
    of the rotated training data.

    method="svd" (default) is the exact reference semantics; method="gram"
    fits the rotation from the d x d Gram matrix — mesh-shardable WITHOUT
    the ~1.2 GB all-gather (and measured slightly faster single-chip:
    1.58 s vs 1.99 s at 56k x 5312 on TPU v5e), at the cost of fidelity in
    numerically-null directions (see ops/normalize.rotater_fit_gram)."""
    if method == "gram":
        rot = rotater_fit_gram(train_diffs_cat)
    elif method == "svd":
        rot = rotater_fit(train_diffs_cat)
    else:
        raise ValueError(f"unknown NAP fit method {method!r}")
    rotated = rotater_run(rot, train_diffs_cat)
    std = standardizer_fit(rotated)
    return NapStats(rotater=rot, standardizer=std,
                    feat_absmax=jnp.max(jnp.abs(train_diffs_cat), axis=0))


def nap_fit_sharded(train_diffs, mesh,
                    start_layer_index: int = 0,
                    end_layer_index: Optional[int] = None,
                    method: str = "svd") -> NapStats:
    """Distributed NAP fit: per-shard diff matrices are all-gathered over ICI
    before the SVD (SURVEY.md §5 mapping of utils/metric.py:183-238 +
    normalize.py:52-70 to the mesh).  The gathered matrix is bit-identical to
    the single-device concat, so the fitted stats — and every downstream
    score — match the single-device path exactly."""
    cat = concat_diffs(train_diffs, start_layer_index, end_layer_index)
    if method == "gram":
        # the Gram contraction reduces over the mesh directly — no gather
        return nap_fit(cat, method="gram")
    from icra2021_multimodal_ad_tpu.parallel.mesh import all_gather

    return nap_fit(all_gather(mesh, cat))


@jax.jit
def nap_transform(stats: NapStats, x: jax.Array) -> jax.Array:
    return standardizer_run(stats.standardizer, rotater_run(stats.rotater, x))


@jax.jit
def nap_score_device(stats: NapStats, x: jax.Array) -> jax.Array:
    """Fused rotate + standardize + mean|.|^2 on device."""
    t = nap_transform(stats, x)
    return jnp.mean(t * t, axis=-1)


def get_d_norm_loss(train_diffs, valid_diffs, test_diffs, test_label,
                    config=None,
                    start_layer_index: int = 0,
                    end_layer_index: Optional[int] = None,
                    norm_type: int = 2,
                    f1_quantiles=(0.90,),
                    save_stats_path: Optional[str] = None,
                    verbose: bool = False,
                    mesh=None,
                    gpu_id: int = -1,
                    **unknown) -> ScoreReport:
    """NAP score (utils/metric.py:183-238).  `gpu_id` is tolerated for
    reference signature parity (novelty_detection.py:50-60 passes it);
    other unknown kwargs are rejected — the fit-method knob is
    `config.nap_fit_method`, and a stray `method=` must not silently run
    the default.  With `mesh`, diffs may be
    batch-sharded: the fit all-gathers the train diffs before the SVD
    (SURVEY.md §5), and the valid/test matrices are gathered before the
    whitening transform.  Gathering the transform inputs is deliberate:
    whitening divides by near-zero variances in the diff matrix's null
    directions, so LSB-level tiling differences between sharded and
    unsharded matmuls would be amplified catastrophically there — gathered,
    the NAP report is bit-identical to the single-device path.  The heavy
    compute (three AE forward passes per window in get_diffs) stays
    sharded; callers who want a fully-sharded transform at scale can use
    nap_transform on the sharded cat directly."""
    _reject_unknown_kwargs("get_d_norm_loss", unknown)
    del gpu_id
    valid_cat = concat_diffs(valid_diffs, start_layer_index, end_layer_index)
    test_cat = concat_diffs(test_diffs, start_layer_index, end_layer_index)

    method = (getattr(config, "nap_fit_method", "svd")
              if config is not None else "svd")
    if mesh is not None:
        from icra2021_multimodal_ad_tpu.parallel.mesh import all_gather

        stats = nap_fit_sharded(train_diffs, mesh,
                                start_layer_index, end_layer_index,
                                method=method)
        valid_cat = all_gather(mesh, valid_cat)
        test_cat = all_gather(mesh, test_cat)
    else:
        train_cat = concat_diffs(train_diffs, start_layer_index,
                                 end_layer_index)
        stats = nap_fit(train_cat, method=method)
    # save_stats_path: None -> fall back to config.train_diffs (the
    # reference persisted its train diffs there, utils/metric.py:205);
    # False -> do not persist (sweeps: parallel grid points would race-
    # overwrite the shared default path); a string -> that path.
    if save_stats_path is None and config is not None:
        save_stats_path = getattr(config, "train_diffs", None)
    if save_stats_path:
        save_nap_stats(save_stats_path, stats)

    valid_rotateds = nap_transform(stats, valid_cat)
    t0 = time.time()
    test_rotateds = nap_transform(stats, test_cat)
    if norm_type == 2:
        test_score = np.asarray(mean_square_rows(test_rotateds))
        valid_score = np.asarray(mean_square_rows(valid_rotateds))
    else:
        test_score = np.asarray(get_norm(test_rotateds, norm_type).mean(axis=-1))
        valid_score = np.asarray(get_norm(valid_rotateds, norm_type).mean(axis=-1))
    if verbose:
        print("nap cal", time.time() - t0)
    return _report(valid_score, test_score, test_label, f1_quantiles)


def nap_effective_stats(stats: NapStats, var_floor_rel: float) -> NapStats:
    """Serving-side whitening truncation ("effective-rank NAP").

    Whitening divides each rotated column by the train-diff std; directions
    whose train variance is below `var_floor_rel * max_variance` carry only
    numerical rounding noise (fp32 or bf16), which the divide amplifies by up
    to 1/std — measured >1e5x relative score error for bf16 diffs on a
    degenerate fit.  This sets those columns' variance to +inf (inv_std = 0),
    dropping them from the score while keeping the column count (the mean's
    denominator) identical between precisions.  Conceptually the serving-side
    analog of the reference's rank-k Truncater (utils/normalize.py:105-146).

    The exact eval path (get_d_norm_loss) never applies this — reference
    score parity is bit-for-fp32 there; this is for scoring against fitted
    stats at serving/streaming time, where bf16 needs it to be meaningful.
    Measured on a trained 1728-dim model with a 160-row (fully degenerate)
    fit: floor 1e-6 keeps 99/160 directions, bf16-vs-fp32 score error 4.2%,
    anomaly separation unchanged (1.7e4x both)."""
    var = stats.standardizer.var
    # floor relative to the max FINITE variance: already-floored stats carry
    # +inf sentinels, and a floor of inf*rel would silently zero EVERY score
    # on a re-floored bundle (idempotency: floor(floor(s)) == floor(s))
    finite_max = jnp.max(jnp.where(jnp.isfinite(var), var, 0.0))
    floor = var_floor_rel * finite_max
    var_f = jnp.where(var > floor, var, jnp.inf)
    return NapStats(
        rotater=stats.rotater,
        standardizer=StandardizerStats(mu=stats.standardizer.mu, var=var_f),
        feat_absmax=stats.feat_absmax,
    )


def nap_score_from_diffs(stats: NapStats, diffs,
                         start_layer_index: int = 0,
                         end_layer_index: Optional[int] = None) -> jax.Array:
    """Score-only NAP path against pre-fitted stats — the FullTest.py:15-52
    capability (cached whitening, no metric computation)."""
    cat = concat_diffs(diffs, start_layer_index, end_layer_index)
    return nap_score_device(stats, cat)


# ---------------------------------------------------------------------------
# Stats persistence (replaces torch.save of raw train diffs, metric.py:205)
# ---------------------------------------------------------------------------


def save_nap_stats(path: str, stats: NapStats) -> None:
    import os

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    extra = ({"feat_absmax": np.asarray(stats.feat_absmax)}
             if stats.feat_absmax is not None else {})
    np.savez(
        path,
        rot_mu=np.asarray(stats.rotater.mu),
        rot_v=np.asarray(stats.rotater.v),
        std_mu=np.asarray(stats.standardizer.mu),
        std_var=np.asarray(stats.standardizer.var),
        **extra,
    )


def load_nap_stats(path: str) -> NapStats:
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    return NapStats(
        rotater=RotaterStats(mu=jnp.asarray(z["rot_mu"]), v=jnp.asarray(z["rot_v"])),
        standardizer=StandardizerStats(
            mu=jnp.asarray(z["std_mu"]), var=jnp.asarray(z["std_var"])
        ),
        # absent in stats files written before the int8 serving path
        feat_absmax=(jnp.asarray(z["feat_absmax"])
                     if "feat_absmax" in z.files else None),
    )


# ---------------------------------------------------------------------------


def _report(valid_score, test_score, test_label, f1_quantiles) -> ScoreReport:
    auroc = get_auc_roc(test_score, test_label)
    aupr = get_auc_prc(test_score, test_label)
    f1, threshold = get_f1_score(valid_score, test_score, test_label,
                                 f1_quantiles=f1_quantiles)
    precision, recall = get_confusion_matrix(test_score, test_label, threshold)
    return ScoreReport(score=test_score, auroc=auroc, aupr=aupr, f1=f1,
                       precision=precision, recall=recall)
