"""Visualization parity: live score plotter, ROC/PR plots, slip visualizer —
all rendered headlessly to files (realtime_tester.py:206-228,
utils/metric.py:49-60,102-113, FullTest.py:54-98)."""

import os

import numpy as np

from icra2021_multimodal_ad_tpu.utils.plotting import (
    LiveScorePlotter,
    plot_pr,
    plot_roc,
    show_detect_slip,
)


def test_live_score_plotter_headless(tmp_path):
    p = LiveScorePlotter(window=20, interactive=False)
    for i in range(30):
        p.update(1.0 + (5.0 if i > 20 else 0.0) + 0.1 * i)
    out = str(tmp_path / "live.png")
    assert p.save(out) == out
    assert os.path.getsize(out) > 1000
    assert len(p.history) == 30
    p.close()


def test_roc_pr_plots(tmp_path):
    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, 200).astype(bool)
    score = label * 2.0 + rng.normal(0, 1, 200)
    roc = plot_roc(score, label, save_path=str(tmp_path / "roc.png"))
    pr = plot_pr(score, label, save_path=str(tmp_path / "pr.png"))
    assert os.path.getsize(roc) > 1000
    assert os.path.getsize(pr) > 1000


def test_show_detect_slip(tmp_path, capsys):
    loss = np.concatenate([np.ones(20), np.full(5, 9.0)])
    labels = np.concatenate([np.zeros(20, int), np.ones(5, int)])
    out = show_detect_slip(loss, labels,
                           save_path=str(tmp_path / "slip.png"),
                           verbose=True)
    assert os.path.getsize(out) > 1000
    printed = capsys.readouterr().out.splitlines()
    assert len(printed) == 25  # the reference prints each (i, loss, label)


def test_per_window_recon_loss_matches_manual():
    import jax
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.utils.plotting import per_window_recon_loss

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 64)), jnp.float32)
    loss = per_window_recon_loss(model, params, state, x)
    x_hat, _ = ae_forward(model, params, state, x, train=False)
    ref = np.sum((np.asarray(x_hat) - np.asarray(x)) ** 2, axis=-1)
    np.testing.assert_allclose(loss, ref, rtol=1e-5)
