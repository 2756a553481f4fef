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
    # VIB head on the encoder output (modules/fc_module.py:59-61 applies the
    # decorator to every FCModule forward; the AE path only decorates the
    # encoder -> bottleneck, which is where the reference's double-width
    # split is meaningful).  distribution None == identity (the only mode
    # the reference's entry points ever invoke).
    distribution: Optional[str] = None
    k: int = 1
    stochastic_inference: bool = False


def ae_init(key: jax.Array, model: AutoEncoder, dtype=None):
    k_enc, k_dec = jax.random.split(key)
    enc_p, enc_s = fc_module_init(k_enc, model.encoder, dtype)
    dec_p, dec_s = fc_module_init(k_dec, model.decoder, dtype)
    params = {"encoder": enc_p, "decoder": dec_p}
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


def ae_encode(model, params, state, x, *, train=False, dropout_rng=None,
              rng=None):
    """Encode; with a VIB head (model.distribution == "normal") returns the
    decorator's {'z', 'mu', 'logvar'} dict, z of shape (k, B, btl)
    (variational_info_bottleneck.py:29-40); identity mode returns (B, btl)."""
    x = x.reshape(x.shape[0], -1)
    if model.distribution is not None:
        from icra2021_multimodal_ad_tpu.models.vib import vib_forward

        out, enc_state = vib_forward(
            model.encoder, params["encoder"], state["encoder"], x,
            distribution=model.distribution, k=model.k,
            stochastic_inference=model.stochastic_inference,
            train=train, rng=rng, dropout_rng=dropout_rng,
        )
        return out, enc_state
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


def ae_forward(model, params, state, x, *, train=False, dropout_rng=None,
               rng=None, return_samples=False):
    """x -> x_hat, new_state (auto_encoder.py:46-50).

    VIB normal mode: each of the k reparameterized z samples is decoded
    (the (k, B, btl) batch flows through the decoder; BN flattens the
    leading axes exactly like torch's view(-1, C) at fc_layer.py:40-45);
    x_hat is the mean reconstruction over k.  With return_samples=True the
    raw (k, B, D) reconstructions are returned instead (for the k-sample
    expected loss)."""
    rngs = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )
    z, enc_state = ae_encode(model, params, state, x, train=train,
                             dropout_rng=rngs[0], rng=rng)
    if model.distribution is not None:
        y, dec_state = ae_decode(model, params, state, z["z"], train=train,
                                 dropout_rng=rngs[1])
        new_state = {"encoder": enc_state, "decoder": dec_state}
        if return_samples:
            return y, new_state
        return y.mean(axis=0).reshape(x.shape[0], -1), new_state
    y, dec_state = ae_decode(model, params, state, z, train=train,
                             dropout_rng=rngs[1])
    new_state = {"encoder": enc_state, "decoder": dec_state}
    return y.reshape(x.shape[0], -1), new_state


def ae_loss(model, params, state, x, *, train=False, dropout_rng=None,
            rng=None):
    """Reconstruction loss (auto_encoder.py:52-55): loss(model(x), x).

    VIB normal mode: the expected reconstruction loss under q(z|x) — the
    mean over the k decoded samples of loss(y_k, x).  (The reference never
    invokes normal mode from its AE path and defines no KL term; none is
    added here.)"""
    x2 = x.reshape(x.shape[0], -1)
    # loss math is always fp32: with mixed-precision training
    # (config.train_dtype="bfloat16") the forward runs on bf16 operands,
    # but an MSE-sum accumulated in bf16 over 1728*batch elements would
    # swamp the gradient signal in rounding.  No-op for the fp32 path.
    x32 = x2.astype(jnp.float32)
    if model.distribution is not None:
        y, new_state = ae_forward(model, params, state, x2, train=train,
                                  dropout_rng=dropout_rng, rng=rng,
                                  return_samples=True)
        fn = loss_fn(model.recon_loss, model.loss_reduction)
        losses = jax.vmap(lambda yk: fn(yk.astype(jnp.float32), x32))(y)
        return losses.mean(), new_state
    y, new_state = ae_forward(model, params, state, x2, train=train,
                              dropout_rng=dropout_rng)
    loss = loss_fn(model.recon_loss, model.loss_reduction)(
        y.astype(jnp.float32), x32)
    return loss, new_state
