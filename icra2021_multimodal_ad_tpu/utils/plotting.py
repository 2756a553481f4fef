"""Visualization parity: live score plotter, ROC/PR curve plots, and the
per-window reconstruction-loss slip visualizer.

Capability parity with the reference's three plotting paths:
  * live_plotter (test_file/realtime_tester.py:206-228) — rolling score line
    updated per streaming tick -> `LiveScorePlotter`.
  * ROC / PR plots behind `show` flags (utils/metric.py:49-60,102-113)
    -> `plot_roc` / `plot_pr`.
  * show_detect_slip (test_file/FullTest.py:54-98) — per-window MSE trace
    over the label trace -> `show_detect_slip`.

All three render headlessly to a file when `save_path` is given (the Agg
backend is forced when no display is present), and interactively via
plt.show()/plt.pause() when `show=True` — the robot-side behavior.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt(show: bool):
    import matplotlib

    if not show or not os.environ.get("DISPLAY"):
        matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    return plt


def _finish(plt, fig, save_path: Optional[str], show: bool):
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
    if show and os.environ.get("DISPLAY"):
        plt.show()
    else:
        # close unconditionally when nothing displays — show=True on a
        # headless host would otherwise leak one open figure per call
        plt.close(fig)
    return save_path


class LiveScorePlotter:
    """Rolling per-tick score line (realtime_tester.py:206-228: plt.ion,
    set_ydata, y-limit widening by one std, plt.pause).

    update(score) pushes one tick's score; in interactive mode the figure
    refreshes each call, headless callers save() at the end."""

    def __init__(self, window: int = 100, identifier: str = "anomaly score",
                 pause_time: float = 0.01, interactive: Optional[bool] = None):
        self.window = window
        self.identifier = identifier
        self.pause_time = pause_time
        if interactive is None:
            interactive = bool(os.environ.get("DISPLAY"))
        self.interactive = interactive
        self._plt = _plt(show=interactive)
        self._y = np.zeros(window, dtype=np.float64)
        self._fig = None
        self._line = None
        self.history: list = []

    def _ensure_figure(self):
        plt = self._plt
        if self._fig is None:
            if self.interactive:
                plt.ion()
            self._fig = plt.figure(figsize=(13, 6))
            ax = self._fig.add_subplot(111)
            (self._line,) = ax.plot(
                np.arange(self.window), self._y, "-o", alpha=0.8
            )
            ax.set_ylabel("score")
            ax.set_title(f"Title: {self.identifier}")
            if self.interactive:
                plt.show()

    def update(self, score: float) -> None:
        self._ensure_figure()
        self.history.append(float(score))
        self._y = np.roll(self._y, -1)
        self._y[-1] = float(score)
        self._line.set_ydata(self._y)
        ax = self._line.axes
        lo, hi = ax.get_ylim()
        if self._y.min() <= lo or self._y.max() >= hi:
            std = self._y.std() or 1.0
            ax.set_ylim(self._y.min() - std, self._y.max() + std)
        if self.interactive:
            self._plt.pause(self.pause_time)

    def save(self, save_path: str) -> str:
        """Snapshot the current figure to a file.  The figure stays LIVE —
        _finish would close it, which would leave subsequent update() calls
        drawing into a dead figure — so save renders directly and keeps the
        interactive session going."""
        self._ensure_figure()
        os.makedirs(os.path.dirname(os.path.abspath(save_path)),
                    exist_ok=True)
        self._fig.savefig(save_path, dpi=110, bbox_inches="tight")
        return save_path

    def close(self) -> None:
        if self._fig is not None:
            self._plt.close(self._fig)
            self._fig = None


def plot_roc(score, test_label, save_path: Optional[str] = None,
             show: bool = False) -> Optional[str]:
    """ROC curve plot (utils/metric.py:49-60 behind the `show` flag)."""
    from icra2021_multimodal_ad_tpu.ops.metrics import auc, roc_curve

    fpr, tpr, _ = roc_curve(np.asarray(test_label), np.asarray(score))
    plt = _plt(show)
    fig = plt.figure()
    plt.plot(fpr, tpr, label=f"AUROC = {auc(fpr, tpr):.4f}")
    plt.plot([0, 1], [0, 1], "k--", alpha=0.4)
    plt.xlabel("False positive rate")
    plt.ylabel("True positive rate")
    plt.title("ROC")
    plt.legend(loc="lower right")
    return _finish(plt, fig, save_path, show)


def plot_pr(score, test_label, save_path: Optional[str] = None,
            show: bool = False) -> Optional[str]:
    """Precision-recall plot (utils/metric.py:102-113 behind `show`)."""
    from icra2021_multimodal_ad_tpu.ops.metrics import (
        auc,
        precision_recall_curve,
    )

    precision, recall, _ = precision_recall_curve(
        np.asarray(test_label), np.asarray(score)
    )
    plt = _plt(show)
    fig = plt.figure()
    plt.plot(recall, precision, label=f"AUPR = {auc(recall, precision):.4f}")
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("Precision-Recall")
    plt.legend(loc="lower left")
    return _finish(plt, fig, save_path, show)


def show_detect_slip(per_window_loss: Sequence[float],
                     labels: Sequence[int],
                     save_path: Optional[str] = None,
                     show: bool = False,
                     verbose: bool = False) -> Optional[str]:
    """Per-window reconstruction-loss trace over the label trace
    (FullTest.py:54-98: subplot 1 'RaPP Loss' per window, subplot 2 the 0/1
    labels; the reference also prints each (i, loss, label))."""
    loss = np.asarray(per_window_loss, dtype=np.float64)
    labels = np.asarray(labels).astype(int)
    if verbose:
        for i, (l, y) in enumerate(zip(loss, labels)):
            print(i, l, y)
    plt = _plt(show)
    fig = plt.figure(figsize=(10, 6))
    ax1 = fig.add_subplot(2, 1, 1)
    ax1.plot(np.arange(len(loss)), loss)
    ax1.set_title("RaPP Loss")
    ax2 = fig.add_subplot(2, 1, 2)
    ax2.plot(np.arange(len(labels)), labels)
    ax2.set_title("Label")
    fig.tight_layout()
    return _finish(plt, fig, save_path, show)


def per_window_recon_loss(model, params, state, x) -> np.ndarray:
    """Per-window MSE-sum reconstruction loss, the quantity show_detect_slip
    plots (FullTest.py:73-78: loss_fn = MSELoss(reduction='sum') per
    window) — computed in one batched device program instead of the
    reference's per-window python loop."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward

    x = jnp.asarray(x).reshape(len(x), -1)
    x_hat, _ = ae_forward(model, params, state, x, train=False)
    d = (x_hat - x).astype(jnp.float32)
    return np.asarray(jnp.sum(d * d, axis=-1))
