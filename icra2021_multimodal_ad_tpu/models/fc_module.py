"""FC module: a stack of FCLayers with exposed per-layer taps.

Capability parity with modules/fc_module.py:23-61 of the reference.  The
reference exposes `layer_list` so the RaPP engine can re-drive inputs through
individual encoder layers (reconstruction_aggregation.py:22-28); here the
same capability is `fc_module_apply_taps`, which returns every intermediate
activation from a single fused forward — no per-layer host round trips.

Layer construction rule (fc_module.py:41-57): every layer uses (act, bn,
dropout) except the last, which is Linear-only (act=last_act, no bn).
Batch norm and dropout are mutually exclusive, as in the reference.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax

from icra2021_multimodal_ad_tpu.models.layers import (
    FCLayerSpec,
    fc_layer_apply,
    fc_layer_init,
)


class FCModuleSpec(NamedTuple):
    layers: Tuple[FCLayerSpec, ...]


def fc_module_spec(
    input_size: int,
    output_size: int,
    hidden_sizes: List[int],
    use_batch_norm: bool = True,
    dropout_p: float = 0.0,
    act: Optional[str] = "leakyrelu",
    last_act: Optional[str] = None,
) -> FCModuleSpec:
    if use_batch_norm and dropout_p > 0:
        raise ValueError("Either batch_norm or dropout is allowed, not both")
    sizes = [input_size] + list(hidden_sizes) + [output_size]
    layers = []
    for idx, (i, o) in enumerate(zip(sizes[:-1], sizes[1:])):
        if idx < len(hidden_sizes):
            layers.append(
                FCLayerSpec(i, o, act=act, bn=use_batch_norm, dropout_p=dropout_p)
            )
        else:
            layers.append(FCLayerSpec(i, o, act=last_act, bn=False, dropout_p=0.0))
    return FCModuleSpec(layers=tuple(layers))


def fc_module_init(key: jax.Array, spec: FCModuleSpec, dtype=None):
    keys = jax.random.split(key, len(spec.layers))
    params, state = [], []
    for k, layer_spec in zip(keys, spec.layers):
        p, s = (
            fc_layer_init(k, layer_spec, dtype)
            if dtype is not None
            else fc_layer_init(k, layer_spec)
        )
        params.append(p)
        state.append(s)
    return params, state


def fc_module_apply(
    spec: FCModuleSpec,
    params: list,
    state: list,
    x: jax.Array,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
):
    y, taps, new_state = _apply(spec, params, state, x, train, dropout_rng)
    return y, new_state


def fc_module_apply_taps(
    spec: FCModuleSpec,
    params: list,
    state: list,
    x: jax.Array,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
):
    """Returns (taps, new_state) where taps[i] is the output of layer i.
    taps[-1] is the module output.  This is the `layer_list` capability the
    RaPP diff extractor builds on."""
    _, taps, new_state = _apply(spec, params, state, x, train, dropout_rng)
    return taps, new_state


def _apply(spec, params, state, x, train, dropout_rng):
    taps = []
    new_state = []
    rngs = (
        jax.random.split(dropout_rng, len(spec.layers))
        if dropout_rng is not None
        else [None] * len(spec.layers)
    )
    y = x
    for layer_spec, p, s, r in zip(spec.layers, params, state, rngs):
        y, s2 = fc_layer_apply(layer_spec, p, s, y, train=train, dropout_rng=r)
        taps.append(y)
        new_state.append(s2)
    return y, taps, new_state
