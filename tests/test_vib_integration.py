"""VIB wired into the model path — torch-oracle + end-to-end coverage.

The reference decorates every FCModule.forward with the variational
information bottleneck (modules/fc_module.py:59-61,
decorators/variational_info_bottleneck.py:19-42) and FCLayer's BatchNorm
flattens the k-sample leading dim (layers/fc_layer.py:40-45).  Here the AE's
encoder carries the head (config --distribution normal --k N), the encoder's
last layer is double-width, and training/eval/scoring all route through
vib_forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models import (
    FCLayerSpec,
    ae_forward,
    ae_loss,
    fc_layer_apply,
    fc_layer_init,
    fc_module_init,
    fc_module_spec,
)
from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder, get_model
from icra2021_multimodal_ad_tpu.models.vib import vib_forward


def _torch_decorated_forward(net, x, distribution=None, k=1,
                             stochastic_inference=True):
    """The reference decorator's exact semantics
    (variational_info_bottleneck.py:19-42), on stock torch modules."""
    output = net(x)
    if distribution is None:
        return output
    mu, logvar = output.split(output.size(-1) // 2, dim=-1)
    if torch.is_grad_enabled() or stochastic_inference:
        sigma = (logvar * 0.5).exp()
        expanded = sigma.unsqueeze(0).expand(k, *sigma.size())
        z = torch.randn_like(expanded).mul(expanded) + mu
    else:
        z = mu.unsqueeze(0).expand(k, *mu.size())
    return {"z": z, "mu": mu, "logvar": logvar}


def _paired_modules(seed=0, in_size=9, hidden=11, out_size=8):
    """A jax FC module and a torch twin with copied weights (last layer is
    Linear-only per fc_module.py:50-57; out_size is even = 2 * btl)."""
    spec = fc_module_spec(in_size, out_size, [hidden], use_batch_norm=False,
                          act="leakyrelu")
    params, state = fc_module_init(jax.random.PRNGKey(seed), spec)

    lin1 = nn.Linear(in_size, hidden)
    lin2 = nn.Linear(hidden, out_size)
    lin1.weight.data = torch.from_numpy(np.asarray(params[0]["w"]).T.copy())
    lin1.bias.data = torch.from_numpy(np.asarray(params[0]["b"]).copy())
    lin2.weight.data = torch.from_numpy(np.asarray(params[1]["w"]).T.copy())
    lin2.bias.data = torch.from_numpy(np.asarray(params[1]["b"]).copy())
    net = nn.Sequential(lin1, nn.LeakyReLU(0.2), lin2)
    return spec, params, state, net


def test_vib_normal_deterministic_matches_torch():
    """Eval mode, no stochastic inference: z == mu expanded over k — the
    decorator's deterministic branch, checked against torch bit-for-fp32."""
    spec, params, state, net = _paired_modules()
    x = np.random.default_rng(3).normal(size=(6, 9)).astype(np.float32)

    out, _ = vib_forward(spec, params, state, jnp.asarray(x),
                         distribution="normal", k=3,
                         stochastic_inference=False, train=False)
    with torch.no_grad():
        ref = _torch_decorated_forward(net, torch.from_numpy(x),
                                       distribution="normal", k=3,
                                       stochastic_inference=False)
    np.testing.assert_allclose(np.asarray(out["mu"]), ref["mu"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["logvar"]),
                               ref["logvar"].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["z"]), ref["z"].numpy(),
                               rtol=1e-5, atol=1e-6)
    assert out["z"].shape == (3, 6, 4)


def test_vib_normal_stochastic_moments_match_torch_semantics():
    """Stochastic reparameterization: z = mu + sigma * eps.  Draw counts are
    large enough that the sample mean/std must match mu/sigma (both torch
    and jax draw standard normals; the oracle is the analytic moment)."""
    spec, params, state, net = _paired_modules(seed=1)
    x = np.random.default_rng(4).normal(size=(5, 9)).astype(np.float32)
    k = 4000

    out, _ = vib_forward(spec, params, state, jnp.asarray(x),
                         distribution="normal", k=k,
                         stochastic_inference=True, train=False,
                         rng=jax.random.PRNGKey(7))
    z = np.asarray(out["z"])
    mu = np.asarray(out["mu"])
    sigma = np.exp(np.asarray(out["logvar"]) * 0.5)
    np.testing.assert_allclose(z.mean(axis=0), mu, atol=4 * sigma.max() / k**0.5)
    np.testing.assert_allclose(z.std(axis=0), sigma, rtol=0.15)

    with torch.no_grad():
        tref = _torch_decorated_forward(net, torch.from_numpy(x),
                                        distribution="normal", k=k,
                                        stochastic_inference=True)
    np.testing.assert_allclose(tref["z"].numpy().mean(axis=0), mu,
                               atol=4 * sigma.max() / k**0.5)


def test_bn_k_sample_reshape_matches_torch():
    """FCLayer BN on a (k, B, C) input must equal torch's view(-1, C)
    flatten-normalize-restore (fc_layer.py:40-45), in train mode with
    running-stat updates."""
    spec = FCLayerSpec(5, 4, act="leakyrelu", bn=True)
    params, state = fc_layer_init(jax.random.PRNGKey(2), spec)
    lin = nn.Linear(5, 4)
    bn = nn.BatchNorm1d(4)
    lin.weight.data = torch.from_numpy(np.asarray(params["w"]).T.copy())
    lin.bias.data = torch.from_numpy(np.asarray(params["b"]).copy())

    x = np.random.default_rng(5).normal(size=(3, 7, 5)).astype(np.float32)
    y, new_state = fc_layer_apply(spec, params, state, jnp.asarray(x),
                                  train=True)

    t = nn.LeakyReLU(0.2)(lin(torch.from_numpy(x)))
    shape = t.size()
    ref = bn(t.view(-1, shape[-1])).view(*shape)
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn_mean"]),
                               bn.running_mean.detach().numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["bn_var"]),
                               bn.running_var.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def _vib_config(**kw):
    cfg = Config(sensor="force_torque", n_layers=3, btl_size=10,
                 distribution="normal", k=2, verbose=0, seed=0,
                 batch_size=32, n_epochs=8, lr=3e-3, **kw)
    return cfg.replace(input_size=get_input_size(cfg))


def test_builder_doubles_encoder_head_for_normal():
    cfg = _vib_config()
    model = build_autoencoder(cfg)
    assert model.distribution == "normal" and model.k == 2
    assert model.encoder.layers[-1].out_size == 20  # 2 * btl
    assert model.decoder.layers[0].in_size == 10    # z dim

    # forward: x_hat back in input space, loss finite, z sampled k times
    model, params, state = get_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 64)), jnp.float32
    )
    y, _ = ae_forward(model, params, state, x, train=True,
                      rng=jax.random.PRNGKey(0))
    assert y.shape == (16, 64)
    loss, _ = ae_loss(model, params, state, x, train=True,
                      rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_vib_end_to_end_train_and_score(tmp_path):
    """Full pipeline with the bottleneck variational: train (stochastic,
    k=2), validate (deterministic), then BASE/SAP/NAP scoring."""
    from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    root = str(tmp_path / "dsum")
    generate_data_sum_shards(root, n_episodes=8, steps_per_episode=40,
                             n_shards=1, n_lidar=963, seed=0)
    cfg = _vib_config(data_folder_name=root, slicing_size=320)
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)

    det = NoveltyDetecter(cfg)
    res = det.train(model, params, state, train_x, valid_x)
    assert res.train_history[-1] < res.train_history[0]

    base, sap, nap = det.test(model, res.params, res.state,
                              train_x, valid_x, test_x, test_y)
    for rep in (base, sap, nap):
        assert np.all(np.isfinite(rep.score))
    # detection QUALITY, not just finiteness: the synthetic drop signature
    # must be caught by NAP even on this short VIB run (measured 1.0;
    # BASE/SAP stay unbounded — undertrained direction artifacts)
    assert nap.auroc > 0.9, nap.auroc
    # the double-width head must show up in the RaPP taps
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs

    diffs = get_diffs(test_x, model, res.params, res.state)
    assert diffs[-1].shape[-1] == 2 * cfg.btl_size


def test_vib_checkpoint_resume_extended_epochs_bit_exact(tmp_path):
    """The VIB sampler key stream must be independent of the epoch BUDGET:
    resume a 3-epoch stochastic run to 6 epochs and match the uninterrupted
    6-epoch run exactly (a fold_in(rng, n_epochs + e) stream would replay
    different noise and silently diverge)."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = _vib_config().replace(batch_size=16, verbose=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, cfg.input_size)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(16, cfg.input_size)), jnp.float32)

    model, p0, s0 = get_model(cfg)
    full = NoveltyDetecter(cfg.replace(n_epochs=6)).train(
        model, p0, s0, x, xv, fused=False)

    ckpt = str(tmp_path / "mid")
    model, p1, s1 = get_model(cfg)
    NoveltyDetecter(cfg.replace(n_epochs=3)).train(
        model, p1, s1, x, xv, checkpoint_path=ckpt, checkpoint_every=3)
    resumed = NoveltyDetecter(cfg.replace(n_epochs=6)).train(
        model, None, None, x, xv, checkpoint_path=ckpt, resume=True)

    np.testing.assert_array_equal(full.valid_history, resumed.valid_history)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_accepts_vib_rng():
    """The public single-step API must be able to train a VIB model (it
    previously had no rng parameter and crashed at trace time)."""
    import jax.numpy as jnp
    import optax

    from icra2021_multimodal_ad_tpu.train import eval_step, train_step

    cfg = _vib_config()
    model, params, state = get_model(cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(8, cfg.input_size)), jnp.float32)
    params, state, opt_state, loss = train_step(
        model, params, state, opt_state, x, opt,
        rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # eval_step evaluates VIB models deterministically (stochastic model,
    # no key — would crash without the z=mu fallback)
    vloss = eval_step(model._replace(stochastic_inference=True),
                      params, state, x)
    assert np.isfinite(float(vloss))
