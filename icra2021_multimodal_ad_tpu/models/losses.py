"""Loss registry — capability parity with modules/loss.py:20-53.

The reference wraps torch losses (bce/bce_with_logit/mse/l1/ce/nll) with a
reduction argument; the autoencoder always uses mse with reduction='sum'
(model_builder.py:40).  Implemented as a pure-jnp registry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "none":
        return x
    raise ValueError(f"unknown reduction: {reduction}")


def _mse(y_hat, y):
    return (y_hat - y) ** 2


def _l1(y_hat, y):
    return jnp.abs(y_hat - y)


def _bce(y_hat, y):
    eps = 1e-12
    y_hat = jnp.clip(y_hat, eps, 1 - eps)
    return -(y * jnp.log(y_hat) + (1 - y) * jnp.log1p(-y_hat))


def _bce_with_logit(y_hat, y):
    # numerically-stable log-sigmoid formulation (matches torch)
    return jnp.maximum(y_hat, 0) - y_hat * y + jnp.log1p(jnp.exp(-jnp.abs(y_hat)))


def _ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels.astype(jnp.int32)[..., None], axis=-1)[
        ..., 0
    ]


def _nll(logp, labels):
    return -jnp.take_along_axis(logp, labels.astype(jnp.int32)[..., None], axis=-1)[
        ..., 0
    ]


_LOSSES = {
    "mse": _mse,
    "l1": _l1,
    "bce": _bce,
    "bce_with_logit": _bce_with_logit,
    "ce": _ce,
    "nll": _nll,
}

CLASSIFICATION_LOSSES = {"ce", "nll"}


def loss_fn(name: str, reduction: str = "sum"):
    """Returns loss(y_hat, y) -> scalar (or elementwise if reduction='none')."""
    if name not in _LOSSES:
        # reference returns y_hat.mean() for unknown losses (loss.py:52-53)
        return lambda y_hat, y: jnp.mean(y_hat)
    base = _LOSSES[name]

    def f(y_hat, y):
        return _reduce(base(y_hat, y), reduction)

    return f
