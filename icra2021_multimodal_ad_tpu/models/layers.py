"""Fully-connected layer: Linear -> Activation -> BatchNorm1d -> Dropout.

Capability parity with layers/fc_layer.py:23-48 and modules/activation.py of
the reference, rebuilt as pure functions over parameter/state pytrees so the
whole stack jits into one XLA program (each Linear lands on the MXU; the
activation and batch-norm fuse into the matmul epilogue).

Note the reference's op order — activation *before* batch norm
(fc_layer.py:40: `y = act(layer(x))`, then `y = bn(y)`) — is preserved.

BatchNorm matches torch.nn.BatchNorm1d: eps 1e-5, momentum 0.1, training mode
normalizes by the *biased* batch variance while the running variance is
updated with the *unbiased* estimate; eval mode uses running stats.  Verified
bit-for-bit (fp32 tolerance) against torch in tests/test_model_stack.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1
LEAKY_SLOPE = 0.2


class FCLayerSpec(NamedTuple):
    in_size: int
    out_size: int
    act: Optional[str] = "leakyrelu"
    bn: bool = False
    dropout_p: float = 0.0


# Activation registry — modules/activation.py:20-45 (leakyrelu slope 0.2).
ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "logsigmoid": jax.nn.log_sigmoid,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "logsoftmax": lambda x: jax.nn.log_softmax(x, axis=-1),
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jnp.where(x >= 0, x, LEAKY_SLOPE * x),
}


def activation(name: Optional[str], x: jax.Array) -> jax.Array:
    if name is None:
        return x
    return ACTIVATIONS[name](x)


def fc_layer_init(key: jax.Array, spec: FCLayerSpec, dtype=jnp.float32):
    """Init matching torch.nn.Linear defaults: W, b ~ U(-1/sqrt(fan_in), +)."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / (spec.in_size ** 0.5)
    params = {
        "w": jax.random.uniform(
            k_w, (spec.in_size, spec.out_size), dtype, -bound, bound
        ),
        "b": jax.random.uniform(k_b, (spec.out_size,), dtype, -bound, bound),
    }
    state = {}
    if spec.bn:
        params["bn_scale"] = jnp.ones((spec.out_size,), dtype)
        params["bn_bias"] = jnp.zeros((spec.out_size,), dtype)
        state["bn_mean"] = jnp.zeros((spec.out_size,), jnp.float32)
        state["bn_var"] = jnp.ones((spec.out_size,), jnp.float32)
    return params, state


def fc_layer_apply(
    spec: FCLayerSpec,
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
):
    """Returns (y, new_state).  Eval mode never mutates state.

    The input dtype selects the numerics (decided at trace time):
      * fp32 x — the exact path: HIGHEST-precision matmul (CLAUDE.md
        invariant: fp32 exactness feeds the NAP SVD).
      * low-precision x (bf16) — the EXPLICIT mixed-precision training
        path (config.train_dtype="bfloat16"): the matmul streams bf16
        operands into an fp32 MXU accumulation (single pass, no HIGHEST),
        bias/activation/batch-norm stay fp32 (batch statistics and running
        stats are fp32 — low-precision batch moments would bias BN), and
        only the layer OUTPUT is cast back down for the next matmul.
        Params remain fp32 masters; autodiff through the .astype yields
        fp32 gradients.
    """
    low = jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32
    if low:
        y = (
            jnp.dot(x, params["w"].astype(x.dtype),
                    preferred_element_type=jnp.float32)
            + params["b"].astype(jnp.float32)
        )
    else:
        # fp32-exact matmul: the default (fast) matmul precision decomposes
        # to bf16 passes, which is fine for the bf16 serving path but
        # corrupts the RaPP diffs that feed the NAP SVD.  The bf16 fast
        # paths are explicit: ops/serving.py, ops/pallas_kernels.py, and
        # the low-precision branch above.
        y = (
            jnp.dot(x, params["w"], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + params["b"]
        )
    y = activation(spec.act, y)

    new_state = state
    if spec.bn:
        # Support the VIB k-sample leading dim (fc_layer.py:40-45): normalize
        # over all leading axes, exactly like torch's view(-1, C) reshape.
        reduce_axes = tuple(range(y.ndim - 1))
        if train:
            # torch.nn.BatchNorm1d (the bit-for-fp32 oracle) raises
            # 'Expected more than 1 value per channel' here; a silent 1-row
            # train batch would normalize by var=0 and drag the running
            # stats toward garbage every epoch (pick a batch_size whose
            # tail is never exactly 1 row)
            if y.size // y.shape[-1] <= 1:
                raise ValueError(
                    "train-mode BatchNorm needs >1 row per channel "
                    f"(got batch shape {y.shape}) — torch parity; adjust "
                    "batch_size so no 1-row tail batch occurs"
                )
            batch_mean = jnp.mean(y, axis=reduce_axes)
            batch_var = jnp.var(y, axis=reduce_axes)  # biased, used to normalize
            n = y.size // y.shape[-1]
            unbiased = batch_var * (n / max(n - 1, 1))
            new_state = {
                "bn_mean": (1 - BN_MOMENTUM) * state["bn_mean"]
                + BN_MOMENTUM * batch_mean.astype(jnp.float32),
                "bn_var": (1 - BN_MOMENTUM) * state["bn_var"]
                + BN_MOMENTUM * unbiased.astype(jnp.float32),
            }
            mean, var = batch_mean, batch_var
        else:
            mean, var = state["bn_mean"], state["bn_var"]
        y = (y - mean) / jnp.sqrt(var + BN_EPS)
        y = y * params["bn_scale"] + params["bn_bias"]

    if spec.dropout_p > 0.0 and train:
        if dropout_rng is None:
            raise ValueError("dropout requires dropout_rng in train mode")
        keep = 1.0 - spec.dropout_p
        mask = jax.random.bernoulli(dropout_rng, keep, y.shape)
        y = jnp.where(mask, y / keep, 0.0)

    if low:
        y = y.astype(x.dtype)
    return y, new_state
