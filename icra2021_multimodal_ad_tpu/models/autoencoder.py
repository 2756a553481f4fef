"""Deep autoencoder — capability parity with models/auto_encoder.py:21-55.

An AutoEncoder is an (encoder, decoder) pair of FCModuleSpecs plus a loss
name.  All applies are pure: (params, state, x) -> (y, new_state).  The
encoder's per-layer taps stay available for the RaPP engine.

The flatten-to-(B, -1) behavior of the reference's encode/forward
(auto_encoder.py:36-50) is preserved: inputs are reshaped to (batch, -1)
before entering the FC stack.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from icra2021_multimodal_ad_tpu.models.fc_module import (
    FCModuleSpec,
    fc_module_apply,
    fc_module_init,
)
from icra2021_multimodal_ad_tpu.models.losses import loss_fn


class AutoEncoder(NamedTuple):
    encoder: FCModuleSpec
    decoder: FCModuleSpec
    recon_loss: str = "mse"
    loss_reduction: str = "sum"


def ae_init(key: jax.Array, model: AutoEncoder, dtype=None):
    k_enc, k_dec = jax.random.split(key)
    enc_p, enc_s = fc_module_init(k_enc, model.encoder, dtype)
    dec_p, dec_s = fc_module_init(k_dec, model.decoder, dtype)
    params = {"encoder": enc_p, "decoder": dec_p}
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


def ae_encode(model, params, state, x, *, train=False, dropout_rng=None):
    x = x.reshape(x.shape[0], -1)
    z, enc_state = fc_module_apply(
        model.encoder, params["encoder"], state["encoder"], x,
        train=train, dropout_rng=dropout_rng,
    )
    return z.reshape(x.shape[0], -1), enc_state


def ae_decode(model, params, state, z, *, train=False, dropout_rng=None):
    y, dec_state = fc_module_apply(
        model.decoder, params["decoder"], state["decoder"], z,
        train=train, dropout_rng=dropout_rng,
    )
    return y, dec_state


def ae_forward(model, params, state, x, *, train=False, dropout_rng=None):
    """x -> x_hat, new_state (auto_encoder.py:46-50)."""
    rngs = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )
    z, enc_state = ae_encode(model, params, state, x, train=train, dropout_rng=rngs[0])
    y, dec_state = ae_decode(model, params, state, z, train=train, dropout_rng=rngs[1])
    new_state = {"encoder": enc_state, "decoder": dec_state}
    return y.reshape(x.shape[0], -1), new_state


def ae_loss(model, params, state, x, *, train=False, dropout_rng=None):
    """Reconstruction loss (auto_encoder.py:52-55): loss(model(x), x)."""
    x2 = x.reshape(x.shape[0], -1)
    y, new_state = ae_forward(model, params, state, x2, train=train,
                              dropout_rng=dropout_rng)
    loss = loss_fn(model.recon_loss, model.loss_reduction)(y, x2)
    return loss, new_state
