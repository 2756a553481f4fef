"""Model stack parity vs torch: Linear/LeakyReLU/BatchNorm1d semantics,
module construction rules, autoencoder shape contract, builder hidden sizes.

The torch modules built here are plain stock layers assembled per the
reference's construction rules (layers/fc_layer.py, modules/fc_module.py,
model_builder.py) — they serve as the behavioral oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models import (
    FCLayerSpec,
    ae_forward,
    ae_init,
    ae_loss,
    build_autoencoder,
    fc_layer_apply,
    fc_layer_init,
    fc_module_apply_taps,
    fc_module_init,
    fc_module_spec,
    get_hidden_layer_sizes,
)


def _copy_linear_to_params(lin: nn.Linear, params: dict) -> dict:
    params = dict(params)
    params["w"] = jnp.asarray(lin.weight.detach().numpy().T)
    params["b"] = jnp.asarray(lin.bias.detach().numpy())
    return params


def test_builder_resolves_default_input_size():
    """build_autoencoder on a bare Config (input_size None, the dataclass
    default) resolves the sensor table instead of an opaque unpack crash."""
    from icra2021_multimodal_ad_tpu.config import Config
    from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder

    model = build_autoencoder(Config(sensor="force_torque", n_layers=2,
                                     btl_size=4))
    assert model.encoder.layers[0].in_size == 64  # force_torque input


def test_train_bn_rejects_single_row_batch():
    """torch.nn.BatchNorm1d raises on 1-row train batches; silently
    normalizing by var=0 would pollute running stats every epoch."""
    import pytest

    from icra2021_multimodal_ad_tpu.models.layers import (
        FCLayerSpec,
        fc_layer_apply,
        fc_layer_init,
    )

    spec = FCLayerSpec(4, 3, act="leakyrelu", bn=True, dropout_p=0.0)
    params, state = fc_layer_init(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match=">1 row"):
        fc_layer_apply(spec, params, state, jnp.ones((1, 4)), train=True)
    # eval mode is fine with one row
    fc_layer_apply(spec, params, state, jnp.ones((1, 4)), train=False)


def test_hidden_layer_sizes_match_reference_formula():
    # canonical config: 1728 -> [1402, 1076, 751, 425] -> 100
    assert get_hidden_layer_sizes(1728, 100, 4) == [1402, 1076, 751, 425]
    assert get_hidden_layer_sizes(100, 1728, 4) == [425, 751, 1076, 1402]
    assert get_hidden_layer_sizes(64, 100, 2) == [76, 88]


def test_fc_layer_eval_matches_torch():
    spec = FCLayerSpec(12, 7, act="leakyrelu", bn=True)
    params, state = fc_layer_init(jax.random.PRNGKey(0), spec)

    lin = nn.Linear(12, 7)
    bn = nn.BatchNorm1d(7)
    params = _copy_linear_to_params(lin, params)
    # randomize running stats so eval mode is non-trivial
    bn.running_mean.data = torch.randn(7)
    bn.running_var.data = torch.rand(7) + 0.5
    bn.weight.data = torch.randn(7)
    bn.bias.data = torch.randn(7)
    state = {
        "bn_mean": jnp.asarray(bn.running_mean.numpy()),
        "bn_var": jnp.asarray(bn.running_var.numpy()),
    }
    params["bn_scale"] = jnp.asarray(bn.weight.detach().numpy())
    params["bn_bias"] = jnp.asarray(bn.bias.detach().numpy())

    x = np.random.default_rng(0).normal(size=(5, 12)).astype(np.float32)
    y, _ = fc_layer_apply(spec, params, state, jnp.asarray(x), train=False)

    lin.eval(), bn.eval()
    with torch.no_grad():
        ref = bn(nn.LeakyReLU(0.2)(lin(torch.from_numpy(x)))).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_fc_layer_train_mode_bn_and_running_stats_match_torch():
    spec = FCLayerSpec(6, 4, act="leakyrelu", bn=True)
    params, state = fc_layer_init(jax.random.PRNGKey(1), spec)
    lin = nn.Linear(6, 4)
    bn = nn.BatchNorm1d(4)
    params = _copy_linear_to_params(lin, params)

    x = np.random.default_rng(1).normal(size=(16, 6)).astype(np.float32)
    y, new_state = fc_layer_apply(spec, params, state, jnp.asarray(x), train=True)

    lin.train(), bn.train()
    ref = bn(nn.LeakyReLU(0.2)(lin(torch.from_numpy(x))))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    # running stats after one step (momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(new_state["bn_mean"]),
                               bn.running_mean.detach().numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["bn_var"]),
                               bn.running_var.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_fc_module_construction_rules():
    spec = fc_module_spec(10, 3, hidden_sizes=[8, 6], use_batch_norm=True,
                          act="leakyrelu", last_act=None)
    assert len(spec.layers) == 3
    assert spec.layers[0] == FCLayerSpec(10, 8, "leakyrelu", True, 0.0)
    assert spec.layers[1] == FCLayerSpec(8, 6, "leakyrelu", True, 0.0)
    # last layer: Linear only (fc_module.py:49-54)
    assert spec.layers[2] == FCLayerSpec(6, 3, None, False, 0.0)
    with pytest.raises(ValueError):
        fc_module_spec(4, 2, [3], use_batch_norm=True, dropout_p=0.5)


def test_module_taps_expose_every_layer():
    spec = fc_module_spec(10, 3, hidden_sizes=[8, 6])
    params, state = fc_module_init(jax.random.PRNGKey(2), spec)
    x = jnp.ones((4, 10))
    taps, _ = fc_module_apply_taps(spec, params, state, x, train=False)
    assert [t.shape[-1] for t in taps] == [8, 6, 3]


def test_autoencoder_forward_and_loss_contract():
    cfg = Config(input_size=64, btl_size=10, n_layers=3, seed=0)
    model = build_autoencoder(cfg)
    params, state = ae_init(jax.random.PRNGKey(3), model)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(9, 64)),
                    dtype=jnp.float32)
    y, _ = ae_forward(model, params, state, x, train=False)
    assert y.shape == (9, 64)
    loss, _ = ae_loss(model, params, state, x, train=False)
    # mse sum reduction
    np.testing.assert_allclose(
        float(loss), float(jnp.sum((y - x) ** 2)), rtol=1e-5
    )


def test_autoencoder_matches_torch_reference_model():
    """Full eval-mode forward vs a torch model assembled per the reference's
    construction rules with identical weights."""
    cfg = Config(input_size=32, btl_size=8, n_layers=3, seed=0)
    model = build_autoencoder(cfg)
    params, state = ae_init(jax.random.PRNGKey(4), model)

    def torch_stack(sizes, acts, bns):
        mods = []
        for (i, o), act, bn in zip(zip(sizes[:-1], sizes[1:]), acts, bns):
            mods.append(nn.Linear(i, o))
            if act:
                mods.append(nn.LeakyReLU(0.2))
            if bn:
                mods.append(nn.BatchNorm1d(o))
        return mods

    h_enc = [int(32 - (32 - 8) / 3 * k) for k in (1, 2)]
    h_dec = [int(8 - (8 - 32) / 3 * k) for k in (1, 2)]
    enc_sizes = [32] + h_enc + [8]
    dec_sizes = [8] + h_dec + [32]
    enc = torch_stack(enc_sizes, [True, True, False], [True, True, False])
    dec = torch_stack(dec_sizes, [True, True, False], [True, True, False])
    tmodel = nn.Sequential(*enc, *dec)

    # copy our params into torch
    def load(side, mods):
        li = 0
        for m in mods:
            if isinstance(m, nn.Linear):
                p = params[side][li]
                m.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
                m.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
                li += 1
            elif isinstance(m, nn.BatchNorm1d):
                p = params[side][li - 1]
                m.weight.data = torch.from_numpy(np.asarray(p["bn_scale"]).copy())
                m.bias.data = torch.from_numpy(np.asarray(p["bn_bias"]).copy())

    load("encoder", enc)
    load("decoder", dec)

    x = np.random.default_rng(3).normal(size=(6, 32)).astype(np.float32)
    ours, _ = ae_forward(model, params, state, jnp.asarray(x), train=False)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
