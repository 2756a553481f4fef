"""Variational information bottleneck — capability parity with
decorators/variational_info_bottleneck.py:19-42.

The reference wraps FCModule.forward: with distribution=None (the only mode
its entry points use) the wrapper is an identity; with "normal" it splits the
module output into (mu, logvar), reparameterizes with k samples, and returns
{'z', 'mu', 'logvar'}.  In eval mode without stochastic inference it returns
mu broadcast over k (deterministic).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from icra2021_multimodal_ad_tpu.models.fc_module import FCModuleSpec, fc_module_apply


def reparameterize_normal(
    key: Optional[jax.Array],
    mu: jax.Array,
    sigma: jax.Array,
    k: int,
    stochastic: bool,
) -> jax.Array:
    """z = mu + sigma * eps with k leading samples; deterministic mu when not
    stochastic (variational_info_bottleneck.py:20-27)."""
    if stochastic:
        if key is None:
            raise ValueError("stochastic reparameterization requires a PRNG key")
        eps = jax.random.normal(key, (k,) + sigma.shape, dtype=sigma.dtype)
        return eps * sigma[None] + mu[None]
    return jnp.broadcast_to(mu[None], (k,) + mu.shape)


def vib_forward(
    spec: FCModuleSpec,
    params: list,
    state: list,
    x: jax.Array,
    *,
    distribution: Optional[str] = None,
    k: int = 1,
    stochastic_inference: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
):
    """FC module forward with optional VIB head
    (variational_info_bottleneck.py:29-40).

    The torch decorator samples whenever grad is enabled OR
    stochastic_inference is set (variational_info_bottleneck.py:21); here the
    equivalent condition is `train or stochastic_inference`."""
    output, new_state = fc_module_apply(spec, params, state, x, train=train,
                                        dropout_rng=dropout_rng)
    if distribution is None:
        return output, new_state
    if distribution != "normal":
        raise NotImplementedError(
            f"Wrong distribution for information bottleneck: {distribution}"
        )
    if k < 1:
        raise ValueError("k should be >= 1")
    half = output.shape[-1] // 2
    mu, logvar = output[..., :half], output[..., half:]
    sigma = jnp.exp(logvar * 0.5)
    z = reparameterize_normal(rng, mu, sigma, k, train or stochastic_inference)
    return {"z": z, "mu": mu, "logvar": logvar}, new_state
