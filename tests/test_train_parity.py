"""Training-engine parity: our jitted Adam/MSE-sum/BN-train step must track a
torch reference (stock nn.Linear/LeakyReLU/BatchNorm1d + optim.Adam) built
with identical weights and driven with identical batches, per the reference's
training semantics (novelty_detection.py:88-127, auto_encoder.py:57-77)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as nn

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models import ae_init, build_autoencoder
from icra2021_multimodal_ad_tpu.train import NoveltyDetecter, eval_step, train_step


def _build_pair(input_size=20, btl=4, n_layers=2, seed=0):
    """Our AE + a torch twin with copied weights."""
    cfg = Config(input_size=input_size, btl_size=btl, n_layers=n_layers,
                 seed=seed)
    model = build_autoencoder(cfg)
    params, state = ae_init(jax.random.PRNGKey(seed), model)

    def make_side(spec, side):
        mods = []
        for li, layer in enumerate(spec.layers):
            lin = nn.Linear(layer.in_size, layer.out_size)
            p = params[side][li]
            lin.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
            lin.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
            mods.append(lin)
            if layer.act == "leakyrelu":
                mods.append(nn.LeakyReLU(0.2))
            if layer.bn:
                mods.append(nn.BatchNorm1d(layer.out_size))
        return mods

    tmodel = nn.Sequential(
        *make_side(model.encoder, "encoder"), *make_side(model.decoder, "decoder")
    )
    return model, params, state, tmodel


def test_train_step_tracks_torch_adam():
    model, params, state, tmodel = _build_pair()
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    topt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    loss_fn = nn.MSELoss(reduction="sum")

    rng = np.random.default_rng(0)
    ours_losses, torch_losses = [], []
    for step in range(5):
        xb = rng.normal(size=(32, 20)).astype(np.float32)
        params, state, opt_state, loss = train_step(
            model, params, state, opt_state, jnp.asarray(xb), optimizer
        )
        ours_losses.append(float(loss))

        tmodel.train()
        topt.zero_grad()
        xt = torch.from_numpy(xb)
        tl = loss_fn(tmodel(xt), xt)
        tl.backward()
        topt.step()
        torch_losses.append(float(tl))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=2e-3)

    # eval loss (BN running stats) after training also agrees
    xb = rng.normal(size=(16, 20)).astype(np.float32)
    ours_eval = float(eval_step(model, params, state, jnp.asarray(xb)))
    tmodel.eval()
    with torch.no_grad():
        torch_eval = float(loss_fn(tmodel(torch.from_numpy(xb)),
                                   torch.from_numpy(xb)))
    assert ours_eval == pytest.approx(torch_eval, rel=5e-3)


def test_best_params_selection_restores_lowest_valid():
    """Best-model restore semantics (novelty_detection.py:108-125): the
    returned params must reproduce the minimum of the valid history."""
    cfg = Config(input_size=12, btl_size=3, n_layers=2, batch_size=16,
                 n_epochs=6, lr=1e-2, verbose=0, seed=1)
    model = build_autoencoder(cfg)
    params, state = ae_init(jax.random.PRNGKey(1), model)
    rng = np.random.default_rng(1)
    train_x = rng.normal(size=(64, 12)).astype(np.float32)
    valid_x = rng.normal(size=(32, 12)).astype(np.float32)

    det = NoveltyDetecter(cfg)
    res = det.train(model, params, state, train_x, valid_x)
    best_epoch_loss = min(res.valid_history)
    restored = float(
        eval_step(model, res.params, res.state, jnp.asarray(valid_x))
    ) / len(valid_x)
    assert restored == pytest.approx(best_epoch_loss, rel=1e-5)


def test_trainer_does_not_recompile_across_runs():
    """optax.adam returns fresh closure objects; the trainer must reuse one
    per lr or every det.train() recompiles the epoch program (measured ~20 s
    per run over the TPU tunnel)."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.train import _adam, train_all_epochs

    assert _adam(1e-3) is _adam(1e-3)
    assert _adam(1e-3) is not _adam(3e-3)

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0,
                 n_epochs=2, batch_size=16, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    x = jnp.ones((32, 64), jnp.float32)
    xv = jnp.ones((16, 64), jnp.float32)

    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    before = train_all_epochs._cache_size()
    for _ in range(2):
        model, params, state = get_model(cfg)
        NoveltyDetecter(cfg).train(model, params, state, x, xv, fused=True)
    added = train_all_epochs._cache_size() - before
    assert added <= 1, f"trainer recompiled across identical runs ({added})"


def test_checkpoint_resume_is_bit_exact(tmp_path):
    """Interrupt training at epoch 3 of 6, resume from the mid-run
    checkpoint: histories and final best params must equal the
    uninterrupted run exactly (the per-epoch shuffle key is fold_in(seed,
    epoch), so the epoch index alone restores the schedule; the reference
    had no optimizer/epoch resume at all)."""
    import jax
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0,
                 batch_size=20, seed=0, lr=3e-3)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 64)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(20, 64)), jnp.float32)

    # uninterrupted 6-epoch run (loop mode to match the checkpointing path)
    model, p0, s0 = get_model(cfg)
    full = NoveltyDetecter(cfg.replace(n_epochs=6)).train(
        model, p0, s0, x, xv, fused=False)

    # interrupted: 3 epochs with checkpointing, then resume to 6
    ckpt = str(tmp_path / "mid")
    model, p1, s1 = get_model(cfg)
    NoveltyDetecter(cfg.replace(n_epochs=3)).train(
        model, p1, s1, x, xv,
        checkpoint_path=ckpt, checkpoint_every=3)
    resumed = NoveltyDetecter(cfg.replace(n_epochs=6)).train(
        model, None, None, x, xv,  # params come from the checkpoint
        checkpoint_path=ckpt, resume=True)

    np.testing.assert_array_equal(full.valid_history, resumed.valid_history)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_orbax_directory_checkpoint(tmp_path):
    """Directory checkpoint_path (Orbax) must resume, not silently restart
    (review finding: the resume check hardcoded '.npz')."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0,
                 batch_size=16, seed=0, lr=3e-3)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, 64)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)

    ckpt = str(tmp_path / "orbax_mid") + "/"
    model, p, s = get_model(cfg)
    NoveltyDetecter(cfg.replace(n_epochs=2)).train(
        model, p, s, x, xv, checkpoint_path=ckpt, checkpoint_every=2)
    resumed = NoveltyDetecter(cfg.replace(n_epochs=4)).train(
        model, None, None, x, xv, checkpoint_path=ckpt, resume=True)
    assert len(resumed.valid_history) == 4  # 2 loaded + 2 new epochs


# -- mixed-precision training (config.train_dtype="bfloat16") ---------------


def _mp_cfg(**kw):
    from icra2021_multimodal_ad_tpu.config import get_input_size

    base = dict(sensor="force_torque", n_layers=3, btl_size=8, verbose=0,
                n_epochs=8, batch_size=32, seed=0)
    base.update(kw)
    cfg = Config(**base)
    return cfg.replace(input_size=get_input_size(cfg))


def test_mixed_precision_training_tracks_fp32():
    """bf16 training must keep fp32 master params + fp32 BN stats and track
    the fp32 run's loss trajectory closely (loss math is fp32 by
    construction; only matmul operands stream bf16)."""
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = _mp_cfg(train_dtype="bfloat16")
    model, params, state = get_model(cfg)
    p2 = jax.tree.map(jnp.copy, params)
    s2 = jax.tree.map(jnp.copy, state)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(200, cfg.input_size)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(60, cfg.input_size)), jnp.float32)

    r16 = NoveltyDetecter(cfg).train(model, params, state, x, xv)
    r32 = NoveltyDetecter(cfg.replace(train_dtype="float32")).train(
        model, p2, s2, x, xv)

    for leaf in jax.tree.leaves(r16.params):
        assert leaf.dtype == jnp.float32
    assert r16.state["encoder"][0]["bn_mean"].dtype == jnp.float32
    rel = abs(r16.train_history[-1] - r32.train_history[-1]) / abs(
        r32.train_history[-1])
    assert rel < 5e-3, (r16.train_history[-1], r32.train_history[-1])
    vrel = abs(r16.valid_history[-1] - r32.valid_history[-1]) / abs(
        r32.valid_history[-1])
    assert vrel < 5e-3


def test_mixed_precision_train_step_matmul_precision():
    """The bf16 branch must lower to single-pass matmuls (no HIGHEST — that
    is the entire speedup), while the fp32 branch keeps the HIGHEST
    invariant.  Checked on the lowered HLO of train_step."""
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = _mp_cfg()
    model, params, state = get_model(cfg)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    x32 = jnp.zeros((16, cfg.input_size), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)

    def lower_txt(x):
        return train_step.lower(
            model, params, state, opt_state, x, optimizer).as_text()

    def dot_precisions(txt):
        return ["HIGHEST" if "HIGHEST" in ln else "DEFAULT"
                for ln in txt.splitlines() if "dot_general" in ln]

    prec16 = dot_precisions(lower_txt(x16))
    prec32 = dot_precisions(lower_txt(x32))
    assert prec16 and all(p == "DEFAULT" for p in prec16), prec16
    assert prec32 and all(p == "HIGHEST" for p in prec32), prec32


def test_mixed_precision_end_to_end_auroc():
    """A bf16-trained model must detect the same synthetic anomalies as the
    fp32-trained one: train on 'normal' windows, score normal + shifted
    windows with the exact fp32 BASE score, compare AUROCs."""
    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.metrics import get_auc_roc

    rng = np.random.default_rng(2)
    d = 64
    normal = rng.normal(size=(260, d)) @ (rng.normal(size=(d, d)) * 0.3)
    anom = normal[:50] + rng.normal(2.5, 1.0, size=(50, d))
    x = jnp.asarray(normal[:200], jnp.float32)
    xv = jnp.asarray(normal[200:260], jnp.float32)
    test_x = jnp.concatenate(
        [jnp.asarray(normal[150:200], jnp.float32),
         jnp.asarray(anom, jnp.float32)])
    labels = np.r_[np.zeros(50), np.ones(50)]

    aurocs = {}
    for td in ("float32", "bfloat16"):
        cfg = _mp_cfg(train_dtype=td, n_epochs=30)
        model, params, state = get_model(cfg)
        r = NoveltyDetecter(cfg).train(model, params, state, x, xv)
        xh, _ = ae_forward(model, r.params, r.state, test_x, train=False)
        scores = np.asarray(jnp.mean((xh - test_x) ** 2, axis=-1))
        aurocs[td] = float(get_auc_roc(scores, labels))

    assert aurocs["float32"] > 0.9, aurocs
    assert aurocs["bfloat16"] > 0.9, aurocs
    assert abs(aurocs["float32"] - aurocs["bfloat16"]) < 0.03, aurocs
