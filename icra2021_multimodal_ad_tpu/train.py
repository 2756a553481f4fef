"""Training + evaluation engine — the NoveltyDetecter.

Capability parity with novelty_detection.py:10-127 of the reference, which
drives pytorch-ignite engines.  Here the epoch loop is plain Python over two
jitted step functions (shape-stable: one compile for the full batch, one for
the tail batch) and the parallelism the reference never had is first-class:
pass a `jax.sharding.Mesh` and the same step functions run data-parallel,
with XLA deriving the gradient all-reduce from the batch sharding.

Semantics matched:
  * optimizer: Adam(lr=1e-3) (novelty_detection.py:90), torch-default betas
    (0.9, 0.999) / eps 1e-8 == optax.adam defaults.
  * loss: MSE with sum reduction over the flattened batch
    (model_builder.py:40, auto_encoder.py:70).
  * train step runs BN in training mode and updates running stats; the
    validation pass runs in eval mode (auto_encoder.py:57-90).
  * best-model selection: keep the (params, state) snapshot with the lowest
    per-epoch validation loss; restore it after the last epoch
    (novelty_detection.py:108-125).  The reference tracks an ignite
    RunningAverage of per-batch losses; we track the exact epoch mean
    (sum of batch sums / rows), which selects the same minimizer for
    shape-stable epochs and is deterministic.
  * test(): binarize labels against target_class, extract RaPP diffs for
    train/valid/test, produce BASE / SAP / NAP reports
    (novelty_detection.py:15-85).
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models.autoencoder import AutoEncoder, ae_loss
from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
from icra2021_multimodal_ad_tpu.ops.scoring import (
    ScoreReport,
    get_d_loss,
    get_d_norm_loss,
    get_recon_loss,
)
from icra2021_multimodal_ad_tpu.parallel.mesh import (
    batch_sharding,
    replicate,
    shard_batch,
)


class TrainResult(NamedTuple):
    params: dict
    state: dict
    train_history: list
    valid_history: list


@partial(jax.jit, static_argnames=("model", "optimizer"), donate_argnums=(1, 2, 3))
def train_step(model: AutoEncoder, params, state, opt_state, x, optimizer):
    """One SGD step: train-mode BN, MSE-sum loss, Adam update
    (auto_encoder.py:57-77)."""

    def loss_of(p):
        loss, new_state = ae_loss(model, p, state, x, train=True)
        return loss, new_state

    (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_state, opt_state, loss


@partial(jax.jit, static_argnames=("model",))
def eval_step(model: AutoEncoder, params, state, x):
    """Validation loss in eval mode (auto_encoder.py:80-90)."""
    loss, _ = ae_loss(model, params, state, x, train=False)
    return loss


def _batch_slices(n: int, batch_size: int):
    return [(s, min(s + batch_size, n)) for s in range(0, n, batch_size)]


class NoveltyDetecter:
    """Train/test orchestration (novelty_detection.py:10-127)."""

    def __init__(self, config: Config, mesh=None):
        self.config = config
        self.mesh = mesh

    # -- training -----------------------------------------------------------

    def train(self, model: AutoEncoder, params, state, train_x, valid_x,
              rng: Optional[jax.Array] = None) -> TrainResult:
        cfg = self.config
        optimizer = optax.adam(cfg.lr)
        if self.mesh is not None:
            params = replicate(self.mesh, params)
            state = replicate(self.mesh, state)
        opt_state = optimizer.init(params)
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed + 1)

        train_x = jnp.asarray(train_x).reshape(len(train_x), -1)
        valid_x = jnp.asarray(valid_x).reshape(len(valid_x), -1)
        n = train_x.shape[0]
        batch = min(cfg.batch_size, n)

        train_history, valid_history = [], []
        best = {"loss": np.inf, "params": params, "state": state}

        for epoch in range(cfg.n_epochs):
            rng, k = jax.random.split(rng)
            perm = jax.random.permutation(k, n)
            shuffled = train_x[perm]

            total, rows = 0.0, 0
            for s, e in _batch_slices(n, batch):
                xb = self._put(shuffled[s:e])
                params, state, opt_state, loss = train_step(
                    model, params, state, opt_state, xb, optimizer
                )
                total += float(loss)
                rows += e - s
            train_loss = total / max(rows, 1)
            train_history.append(train_loss)

            vtotal, vrows = 0.0, 0
            for s, e in _batch_slices(valid_x.shape[0], batch):
                xb = self._put(valid_x[s:e])
                vtotal += float(eval_step(model, params, state, xb))
                vrows += e - s
            valid_loss = vtotal / max(vrows, 1)
            valid_history.append(valid_loss)

            if valid_loss < best["loss"]:
                # deep copy (the reference's deepcopy at novelty_detection.py
                # :117): train_step donates its input buffers, so a bare
                # reference here would be deleted by a later step
                best = {
                    "loss": valid_loss,
                    "params": jax.tree.map(jnp.copy, params),
                    "state": jax.tree.map(jnp.copy, state),
                }

            if cfg.verbose >= 1:
                print(
                    f"Epoch {epoch + 1} - loss={train_loss:.4e} "
                    f"valid={valid_loss:.4e} lowest={best['loss']:.4e}"
                )

        return TrainResult(
            params=best["params"],
            state=best["state"],
            train_history=train_history,
            valid_history=valid_history,
        )

    def _put(self, x):
        if self.mesh is not None:
            return shard_batch(self.mesh, x)
        return x

    # -- evaluation ---------------------------------------------------------

    def test(self, model: AutoEncoder, params, state,
             train_x, valid_x, test_x, test_y,
             save_stats_path: Optional[str] = None):
        """BASE/SAP/NAP evaluation (novelty_detection.py:15-85).

        Returns (base_report, sap_report, nap_report), each a ScoreReport
        (score, auroc, aupr, f1, precision, recall).
        """
        cfg = self.config
        test_y = np.asarray(test_y)
        target = _coerce_like(cfg.target_class, test_y)
        if cfg.unimodal_normal:
            label = ~np.isin(test_y, [target])
        else:
            label = np.isin(test_y, [target])

        bs = cfg.batch_size
        train_diffs = get_diffs(train_x, model, params, state, batch_size=bs)
        valid_diffs = get_diffs(valid_x, model, params, state, batch_size=bs)
        test_diffs = get_diffs(test_x, model, params, state, batch_size=bs)

        end = cfg.n_layers + 1 - cfg.end_layer_index
        base = get_recon_loss(valid_diffs[0], test_diffs[0], label)
        sap = get_d_loss(
            train_diffs, valid_diffs, test_diffs, label,
            start_layer_index=cfg.start_layer_index, end_layer_index=end,
        )
        nap = get_d_norm_loss(
            train_diffs, valid_diffs, test_diffs, label,
            config=cfg,
            start_layer_index=cfg.start_layer_index, end_layer_index=end,
            save_stats_path=save_stats_path,
        )
        return base, sap, nap


def _coerce_like(target, labels: np.ndarray):
    """CLI passes target_class as str; labels are numeric (the reference
    relies on json labels [0,1] and re-assignment at data_loaders.py:64-66)."""
    if isinstance(target, str):
        try:
            target = type(labels.ravel()[0].item())(float(target))
        except (ValueError, TypeError):
            pass
    return target


def report_dataframe(base: ScoreReport, sap: ScoreReport, nap: ScoreReport):
    """One result row in the reference's column layout
    (novelty_detection.py:75-83)."""
    import pandas as pd

    return pd.DataFrame(
        [
            {
                "base_auroc": base.auroc, "sap_auroc": sap.auroc,
                "nap_auroc": nap.auroc,
                "base_f1score": base.f1, "sap_f1score": sap.f1,
                "nap_f1score": nap.f1,
                "base_precision": base.precision, "sap_precision": sap.precision,
                "nap_precision": nap.precision,
                "base_recalls": base.recall, "sap_recalls": sap.recall,
                "nap_recalls": nap.recall,
                "base_aupr": base.aupr, "sap_aupr": sap.aupr,
                "nap_aupr": nap.aupr,
            }
        ]
    )
