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

from functools import lru_cache, partial
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


def save_train_checkpoint(path: str, epoch: int, params, state, opt_state,
                          best: dict, train_history, valid_history) -> str:
    """Mid-training checkpoint: params + BN state + optimizer state + epoch
    + best-so-far snapshot + loss histories.  The reference had no
    optimizer/epoch resume at all (SURVEY.md §5 checkpoint notes); this
    makes an interrupted run continue bit-exactly (the per-epoch shuffle is
    fold_in(seed, epoch), so epoch index alone restores the data order)."""
    from icra2021_multimodal_ad_tpu.utils.checkpoint import save_checkpoint

    extra = {
        "epoch": np.asarray(epoch),
        "opt_leaves": [np.asarray(x) for x in jax.tree.leaves(opt_state)],
        "best_loss": np.asarray(best["loss"]),
        "best_params": best["params"],
        "best_state": best["state"],
        "train_history": np.asarray(train_history, dtype=np.float64),
        "valid_history": np.asarray(valid_history, dtype=np.float64),
    }
    return save_checkpoint(path, params, state, extra=extra)


def load_train_checkpoint(path: str, optimizer):
    """Inverse of save_train_checkpoint; opt_state is rebuilt by grafting the
    saved leaves onto a freshly-initialized optimizer tree structure."""
    from icra2021_multimodal_ad_tpu.utils.checkpoint import load_checkpoint

    params, state, meta = load_checkpoint(path)
    extra = meta["extra"]
    # eval_shape: only the tree STRUCTURE is needed — don't allocate a full
    # device-resident Adam state just to graft the saved leaves onto it
    template = jax.eval_shape(optimizer.init, params)
    opt_state = jax.tree.unflatten(
        jax.tree.structure(template),
        [jnp.asarray(x) for x in extra["opt_leaves"]],
    )
    best = {
        "loss": float(extra["best_loss"]),
        "params": jax.tree.map(jnp.asarray, extra["best_params"]),
        "state": jax.tree.map(jnp.asarray, extra["best_state"]),
    }
    return {
        "params": jax.tree.map(jnp.asarray, params),
        "state": jax.tree.map(jnp.asarray, state),
        "opt_state": opt_state,
        "epoch": int(extra["epoch"]),
        "best": best,
        "train_history": [float(v) for v in np.atleast_1d(extra["train_history"])],
        "valid_history": [float(v) for v in np.atleast_1d(extra["valid_history"])],
    }


#: disjoint-stream tag for the VIB sampler keys (see _vib_epoch_key)
_VIB_STREAM_TAG = 0x5649_4221  # "VIB!"


def _vib_epoch_key(rng, epoch):
    """Per-epoch key for the VIB reparameterization sampler.  The stream is
    a constant-tag fold (NOT fold_in(rng, n_epochs + epoch)) so it is
    disjoint from the shuffle stream fold_in(rng, epoch) AND independent of
    the epoch budget — checkpoint-resume with an extended n_epochs replays
    the identical noise and stays bit-exact."""
    return jax.random.fold_in(jax.random.fold_in(rng, _VIB_STREAM_TAG), epoch)


@lru_cache(maxsize=None)
def _adam(lr: float):
    """One optimizer object per learning rate.  optax.adam returns a fresh
    NamedTuple of closures on every call; the trainer passes it as a STATIC
    jit argument, so a fresh object per NoveltyDetecter.train would make
    every training run recompile the whole epoch program (~20 s over the
    tunnel, measured).  Caching by lr restores jit-cache hits across runs
    (sweeps, repeated trainings in one process)."""
    return optax.adam(lr)


@partial(jax.jit, static_argnames=("model", "optimizer"), donate_argnums=(1, 2, 3))
def train_step(model: AutoEncoder, params, state, opt_state, x, optimizer,
               rng=None):
    """One SGD step: train-mode BN, MSE-sum loss, Adam update
    (auto_encoder.py:57-77).  `rng` feeds the VIB reparameterization sampler
    — required for distribution='normal' models, ignored by identity mode."""

    def loss_of(p):
        loss, new_state = ae_loss(model, p, state, x, train=True, rng=rng)
        return loss, new_state

    (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_state, opt_state, loss


@partial(jax.jit, static_argnames=("model",))
def eval_step(model: AutoEncoder, params, state, x):
    """Validation loss in eval mode (auto_encoder.py:80-90).  VIB models
    evaluate deterministically (z = mu) like eval_epoch, with k collapsed to
    1 — the k mu-broadcast copies are identical, so decoding one is
    equivalent and k-times cheaper."""
    if model.distribution is not None:
        model = model._replace(stochastic_inference=False, k=1)
    loss, _ = ae_loss(model, params, state, x, train=False)
    return loss


def _sgd_body(model, optimizer, data_sharding):
    """Scan body: one Adam step on one (batch, rng) pair; loss is the batch
    MSE sum.  The rng feeds the VIB reparameterization sampler when the
    model carries a distribution; identity-mode models ignore it."""

    def body(carry, xk):
        xb, kb = xk
        params, state, opt_state = carry
        if (
            data_sharding is not None
            and xb.shape[0] % data_sharding.mesh.devices.size == 0
        ):
            xb = jax.lax.with_sharding_constraint(xb, data_sharding)

        def loss_of(p):
            return ae_loss(model, p, state, xb, train=True, rng=kb)

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state), loss

    return body


@partial(
    jax.jit,
    static_argnames=("model", "optimizer", "batch", "data_sharding"),
    donate_argnums=(1, 2, 3),
)
def train_epoch(model: AutoEncoder, params, state, opt_state, train_x, perm,
                optimizer, batch: int, data_sharding=None, rng=None):
    """One full epoch as ONE device program: shuffle (gather by `perm`),
    lax.scan over the full batches, then the tail batch — all on device.
    Returns (params, state, opt_state, loss_sum).  Only the scalar loss sum
    crosses to host, once per epoch — the reference synced per batch through
    ignite (novelty_detection.py:92-107) and round 1 still fetched
    `float(loss)` per step.  Inside one traced program the tail batch's
    shape is static, so the two-shape invariant costs nothing here."""
    n = train_x.shape[0]
    n_full = n // batch
    shuffled = jnp.take(train_x, perm, axis=0)
    body = _sgd_body(model, optimizer, data_sharding)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, n_full + 1)

    carry, total = _run_epoch_batches(
        body, (params, state, opt_state), shuffled, keys, batch
    )
    params, state, opt_state = carry
    return params, state, opt_state, total


def _run_epoch_batches(body, carry, shuffled, keys, batch: int):
    """Shared full-batches-then-tail scaffolding of the two training loops —
    ONE op sequence by construction, which is what makes the per-epoch and
    fused modes numerically identical."""
    n = shuffled.shape[0]
    n_full = n // batch
    total = jnp.float32(0.0)
    if n_full:
        full = shuffled[: n_full * batch].reshape(n_full, batch, -1)
        carry, losses = jax.lax.scan(body, carry, (full, keys[:n_full]))
        total = total + jnp.sum(losses)
    if n - n_full * batch:
        carry, tail_loss = body(carry, (shuffled[n_full * batch:], keys[-1]))
        total = total + tail_loss
    return carry, total


@partial(jax.jit, static_argnames=("model", "batch"))
def eval_epoch(model: AutoEncoder, params, state, x, batch: int):
    """Eval-mode loss sum over all rows, scanned on device in one program.
    VIB models validate deterministically (z = mu, k collapsed to 1 — the k
    mu-broadcast copies are identical) so best-model selection is stable."""
    if model.distribution is not None:
        model = model._replace(stochastic_inference=False, k=1)
    n = x.shape[0]
    n_full = n // batch

    def body(tot, xb):
        loss, _ = ae_loss(model, params, state, xb, train=False)
        return tot + loss, None

    total = jnp.float32(0.0)
    if n_full:
        full = x[: n_full * batch].reshape(n_full, batch, -1)
        total, _ = jax.lax.scan(body, total, full)
    if n - n_full * batch:
        loss, _ = ae_loss(model, params, state, x[n_full * batch:], train=False)
        total = total + loss
    return total


@partial(
    jax.jit,
    static_argnames=("model", "optimizer", "batch", "n_epochs",
                     "data_sharding"),
    # no donation: params/state also seed the best-model copies, so the
    # buffers alias an output and XLA could not reuse them anyway
)
def train_all_epochs(model: AutoEncoder, params, state, opt_state,
                     train_x, valid_x, rng, optimizer, batch: int,
                     n_epochs: int, data_sharding=None):
    """The ENTIRE training run as one device program: lax.scan over epochs,
    per-epoch reshuffle from a folded-in PRNG key, and best-model selection
    (lowest validation loss, novelty_detection.py:108-125) done on device
    with a pytree select — zero host round-trips until the final fetch.

    Returns (best_params, best_state, train_losses[n_epochs],
    valid_losses[n_epochs]) where losses are per-row means."""
    n = train_x.shape[0]
    n_valid = valid_x.shape[0]
    n_full = n // batch
    body = _sgd_body(model, optimizer, data_sharding)

    def epoch(carry, e):
        params, state, opt_state, best_loss, best_params, best_state = carry
        perm = jax.random.permutation(jax.random.fold_in(rng, e), n)
        shuffled = jnp.take(train_x, perm, axis=0)
        # independent key stream for the VIB sampler (ignored by identity-
        # mode models); same stream as the per-epoch loop (_vib_epoch_key)
        keys = jax.random.split(_vib_epoch_key(rng, e), n_full + 1)

        inner, total = _run_epoch_batches(
            body, (params, state, opt_state), shuffled, keys, batch
        )
        params, state, opt_state = inner

        valid_total = eval_epoch(model, params, state, valid_x, batch)
        valid_loss = valid_total / max(n_valid, 1)

        better = valid_loss < best_loss
        best_loss = jnp.where(better, valid_loss, best_loss)
        best_params = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), params, best_params
        )
        best_state = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), state, best_state
        )
        carry = (params, state, opt_state, best_loss, best_params, best_state)
        return carry, (total / n, valid_loss)

    init = (
        params, state, opt_state,
        jnp.float32(jnp.inf),
        jax.tree.map(jnp.copy, params),
        jax.tree.map(jnp.copy, state),
    )
    carry, (train_losses, valid_losses) = jax.lax.scan(
        epoch, init, jnp.arange(n_epochs)
    )
    _, _, _, _, best_params, best_state = carry
    return best_params, best_state, train_losses, valid_losses


class NoveltyDetecter:
    """Train/test orchestration (novelty_detection.py:10-127)."""

    def __init__(self, config: Config, mesh=None):
        self.config = config
        self.mesh = mesh

    # -- training -----------------------------------------------------------

    def train(self, model: AutoEncoder, params, state, train_x, valid_x,
              rng: Optional[jax.Array] = None,
              fused: Optional[bool] = None,
              checkpoint_path: Optional[str] = None,
              checkpoint_every: int = 0,
              resume: bool = False) -> TrainResult:
        """Device-resident training loop.

        NOTE: the underlying epoch programs donate their (params, state,
        opt_state) buffers — the arrays passed in are consumed.  Use the
        returned TrainResult; pass jnp.copy'd trees if you need to call
        train twice from the same initialization.

        Two modes, numerically identical (same op sequence):
          * per-epoch (default with verbose >= 1): one `train_epoch` program
            + one `eval_epoch` program per epoch; two scalar fetches per
            epoch (live progress printing stays possible).
          * fused (default with verbose == 0, or fused=True): the whole run
            is ONE `train_all_epochs` program — scan over epochs, device-side
            best-model selection, a single host fetch at the end.  This is
            the mode the tunneled-device bench exercises (dispatch RTT would
            otherwise dominate, CLAUDE.md timing rules).
        """
        cfg = self.config
        optimizer = _adam(cfg.lr)
        if rng is None:
            rng = jax.random.PRNGKey(cfg.seed + 1)

        train_x = jnp.asarray(train_x).reshape(len(train_x), -1)
        valid_x = jnp.asarray(valid_x).reshape(len(valid_x), -1)
        train_dtype = getattr(cfg, "train_dtype", "float32")
        if train_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"train_dtype must be 'float32' or 'bfloat16', got "
                f"{train_dtype!r}"
            )
        if train_dtype == "bfloat16":
            # mixed-precision training: bf16 batches select the low-
            # precision branch of fc_layer_apply at trace time (bf16 matmul
            # operands, fp32 MXU accumulation, fp32 BN stats/loss/Adam on
            # fp32 master params).  Eval/NAP-fit later runs the exact fp32
            # path on the fp32 masters — nothing downstream changes.
            train_x = train_x.astype(jnp.bfloat16)
            valid_x = valid_x.astype(jnp.bfloat16)
        n = train_x.shape[0]
        batch = min(cfg.batch_size, n)

        data_sharding = None
        if self.mesh is not None:
            params = replicate(self.mesh, params)
            state = replicate(self.mesh, state)
            n_dev = self.mesh.devices.size
            # pre-stage the datasets sharded when divisible (replicated
            # otherwise — a non-divisible batch cannot be row-sharded)
            train_x = self._put(train_x)
            valid_x = self._put(valid_x)
            if batch % n_dev == 0:
                data_sharding = batch_sharding(self.mesh)
        checkpointing = bool(checkpoint_path) and (checkpoint_every > 0
                                                   or resume)
        # params may be None only when resuming purely from a checkpoint
        if params is None and not (resume and checkpoint_path):
            raise ValueError(
                "no params: pass (params, state) or resume=True with an "
                "existing checkpoint_path"
            )
        # optimizer state is built lazily: the resume path supplies its own
        # (initializing here would allocate a full Adam tree just to discard)
        opt_state = None

        if fused is None:
            fused = cfg.verbose < 1 and not checkpointing
        if checkpointing:
            fused = False  # mid-run checkpoints need the per-epoch loop
        if fused:
            opt_state = optimizer.init(params)
            best_params, best_state, tr, va = train_all_epochs(
                model, params, state, opt_state, train_x, valid_x, rng,
                optimizer, batch, cfg.n_epochs, data_sharding,
            )
            return TrainResult(
                params=best_params,
                state=best_state,
                train_history=[float(v) for v in np.asarray(tr)],
                valid_history=[float(v) for v in np.asarray(va)],
            )

        train_history, valid_history = [], []
        # deep-copy the initial snapshot: train_epoch donates its buffers,
        # and a run whose every valid loss is NaN would otherwise return
        # references to deleted arrays instead of surfacing the divergence
        best = {
            "loss": np.inf,
            "params": jax.tree.map(jnp.copy, params),
            "state": jax.tree.map(jnp.copy, state),
        }
        start_epoch = 0

        if resume and checkpoint_path:
            import os

            from icra2021_multimodal_ad_tpu.utils.checkpoint import (
                _is_dir_path,
            )

            if _is_dir_path(checkpoint_path):
                ckpt = checkpoint_path  # Orbax directory checkpoint
                found = os.path.exists(
                    os.path.join(checkpoint_path.rstrip(os.sep), "tree")
                )
            else:
                ckpt = (checkpoint_path if checkpoint_path.endswith(".npz")
                        else checkpoint_path + ".npz")
                found = os.path.exists(ckpt)
            if found:
                loaded = load_train_checkpoint(ckpt, optimizer)
                params, state = loaded["params"], loaded["state"]
                opt_state = loaded["opt_state"]
                best = loaded["best"]
                train_history = loaded["train_history"]
                valid_history = loaded["valid_history"]
                start_epoch = loaded["epoch"]
                if self.mesh is not None:
                    # loaded trees are host arrays — re-replicate onto the
                    # mesh like the fresh-start path, or the first epoch
                    # runs with GSPMD-chosen layouts and reshards on entry
                    params = replicate(self.mesh, params)
                    state = replicate(self.mesh, state)
                    opt_state = replicate(self.mesh, opt_state)
                if cfg.verbose >= 1:
                    print(f"resumed from {ckpt} at epoch {start_epoch}")

        if params is None:
            raise ValueError(
                "no params: pass (params, state) or resume=True with an "
                "existing checkpoint_path"
            )
        if opt_state is None:
            opt_state = optimizer.init(params)

        for epoch in range(start_epoch, cfg.n_epochs):
            perm = jax.random.permutation(jax.random.fold_in(rng, epoch), n)
            params, state, opt_state, total = train_epoch(
                model, params, state, opt_state, train_x, perm,
                optimizer, batch, data_sharding,
                rng=_vib_epoch_key(rng, epoch),
            )
            train_loss = float(total) / max(n, 1)
            train_history.append(train_loss)

            vtotal = eval_epoch(model, params, state, valid_x, batch)
            valid_loss = float(vtotal) / max(valid_x.shape[0], 1)
            valid_history.append(valid_loss)

            if valid_loss < best["loss"]:
                # deep copy (the reference's deepcopy at novelty_detection.py
                # :117): train_epoch donates its input buffers, so a bare
                # reference here would be deleted by a later epoch
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

            if (checkpoint_path and checkpoint_every > 0
                    and (epoch + 1) % checkpoint_every == 0):
                save_train_checkpoint(
                    checkpoint_path, epoch + 1, params, state, opt_state,
                    best, train_history, valid_history,
                )

        return TrainResult(
            params=best["params"],
            state=best["state"],
            train_history=train_history,
            valid_history=valid_history,
        )

    def _put(self, x):
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            if x.shape[0] % n_dev == 0:
                return shard_batch(self.mesh, x)
            return jax.device_put(
                x, jax.sharding.NamedSharding(self.mesh,
                                              jax.sharding.PartitionSpec())
            )
        return x

    # -- evaluation ---------------------------------------------------------

    def test(self, model: AutoEncoder, params, state,
             train_x, valid_x, test_x, test_y,
             save_stats_path: Optional[str] = None):
        """BASE/SAP/NAP evaluation (novelty_detection.py:15-85).

        Returns (base_report, sap_report, nap_report), each a ScoreReport
        (score, auroc, aupr, f1, precision, recall).

        When the detecter was built with a mesh, the whole eval path runs
        data-parallel: RaPP diffs are extracted on mesh-sharded batches and
        the NAP fit all-gathers the train diffs before the SVD — numerically
        identical to the single-device path (SURVEY.md §5).
        """
        cfg = self.config
        mesh = self.mesh
        label = binarize_labels(cfg, test_y)

        if mesh is not None:
            params = replicate(mesh, params)
            state = replicate(mesh, state)

        bs = cfg.batch_size
        train_diffs = get_diffs(train_x, model, params, state,
                                batch_size=bs, mesh=mesh)
        valid_diffs = get_diffs(valid_x, model, params, state,
                                batch_size=bs, mesh=mesh)
        test_diffs = get_diffs(test_x, model, params, state,
                               batch_size=bs, mesh=mesh)

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
            mesh=mesh,
        )
        return base, sap, nap


def binarize_labels(config: Config, test_y) -> np.ndarray:
    """Anomaly-label binarization (novelty_detection.py:31-34): positive
    where the label equals target_class, inverted under unimodal_normal.
    The single source of truth — NoveltyDetecter.test and the plotting
    paths must agree on it."""
    test_y = np.asarray(test_y)
    target = _coerce_like(config.target_class, test_y)
    label = np.isin(test_y, [target])
    return ~label if config.unimodal_normal else label


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
