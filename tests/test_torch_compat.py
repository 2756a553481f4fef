"""Torch checkpoint migration: a state dict in the reference's layout must
load into our pytrees and produce the same eval-mode forward as the torch
model it came from."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models import ae_forward, build_autoencoder
from icra2021_multimodal_ad_tpu.utils.torch_compat import (
    pytrees_to_state_dict,
    state_dict_to_pytrees,
)


class _TorchFCLayer(nn.Module):
    """Reference FCLayer module tree (layers/fc_layer.py): attributes named
    `layer` (Linear) and `bn` (BatchNorm1d) so state-dict keys match."""

    def __init__(self, i, o, act, bn):
        super().__init__()
        self.layer = nn.Linear(i, o)
        self.bn = nn.BatchNorm1d(o) if bn else None
        self.act = nn.LeakyReLU(0.2) if act else None

    def forward(self, x):
        y = self.layer(x)
        if self.act:
            y = self.act(y)
        if self.bn:
            y = self.bn(y)
        return y


class _TorchFCModule(nn.Module):
    def __init__(self, sizes, last_plain=True):
        super().__init__()
        layers = []
        for idx, (i, o) in enumerate(zip(sizes[:-1], sizes[1:])):
            last = idx == len(sizes) - 2
            layers.append(_TorchFCLayer(i, o, act=not last, bn=not last))
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class _TorchAE(nn.Module):
    def __init__(self, enc_sizes, dec_sizes):
        super().__init__()
        self.encoder = _TorchFCModule(enc_sizes)
        self.decoder = _TorchFCModule(dec_sizes)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def test_roundtrip_torch_state_dict():
    cfg = Config(input_size=30, btl_size=6, n_layers=3, seed=0)
    model = build_autoencoder(cfg)
    enc_sizes = [l.in_size for l in model.encoder.layers] + [6]
    dec_sizes = [l.in_size for l in model.decoder.layers] + [30]

    tmodel = _TorchAE(enc_sizes, dec_sizes)
    # randomize BN stats so eval mode is nontrivial
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm1d):
            m.running_mean.data = torch.randn_like(m.running_mean)
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    sd = tmodel.state_dict()
    params, state = state_dict_to_pytrees(sd, model)

    x = np.random.default_rng(0).normal(size=(7, 30)).astype(np.float32)
    ours, _ = ae_forward(model, params, state, jnp.asarray(x), train=False)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)

    # export back: keys and values round-trip
    sd2 = pytrees_to_state_dict(params, state, model)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            sd[k].numpy(), sd2[k], rtol=1e-6, err_msg=k
        )


def test_load_torch_file(tmp_path):
    from icra2021_multimodal_ad_tpu.utils.torch_compat import load_torch_state_dict

    cfg = Config(input_size=16, btl_size=4, n_layers=2, seed=0)
    model = build_autoencoder(cfg)
    enc_sizes = [l.in_size for l in model.encoder.layers] + [4]
    dec_sizes = [l.in_size for l in model.decoder.layers] + [16]
    tmodel = _TorchAE(enc_sizes, dec_sizes)
    path = str(tmp_path / "ref.pt")
    torch.save(tmodel.state_dict(), path)

    params, state = load_torch_state_dict(path, model)
    x = np.ones((3, 16), np.float32)
    ours, _ = ae_forward(model, params, state, jnp.asarray(x), train=False)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
