"""Torch checkpoint migration: load the reference's `.pt` state dicts.

The reference persists `torch.save(model.state_dict())`
(novelty_detection.py:196) with keys shaped by its module tree —
`{encoder,decoder}.net.{i}.layer.{weight,bias}` for each Linear and
`...net.{i}.bn.{weight,bias,running_mean,running_var}` for each BatchNorm1d
(models/auto_encoder.py + modules/fc_module.py + layers/fc_layer.py).

`load_torch_state_dict` maps that layout onto this framework's
(params, state) pytrees so a user migrating from the reference can keep
their trained models.  torch is only imported here (never on the compute
path) and only CPU deserialization is used.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.models.autoencoder import AutoEncoder


def state_dict_to_pytrees(sd: dict, model: AutoEncoder) -> Tuple[dict, dict]:
    """Map a reference-layout state dict (tensor or ndarray values) onto
    (params, state) for `model`."""

    def get(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    params = {"encoder": [], "decoder": []}
    state = {"encoder": [], "decoder": []}
    for side in ("encoder", "decoder"):
        spec = getattr(model, side)
        for i, layer in enumerate(spec.layers):
            prefix = f"{side}.net.{i}"
            p = {
                # torch Linear stores (out, in); ours is (in, out)
                "w": jnp.asarray(get(f"{prefix}.layer.weight").T),
                "b": jnp.asarray(get(f"{prefix}.layer.bias")),
            }
            s = {}
            if layer.bn:
                p["bn_scale"] = jnp.asarray(get(f"{prefix}.bn.weight"))
                p["bn_bias"] = jnp.asarray(get(f"{prefix}.bn.bias"))
                s["bn_mean"] = jnp.asarray(get(f"{prefix}.bn.running_mean"))
                s["bn_var"] = jnp.asarray(get(f"{prefix}.bn.running_var"))
            params[side].append(p)
            state[side].append(s)
    return params, state


def load_torch_state_dict(path: str, model: AutoEncoder) -> Tuple[dict, dict]:
    """Load a reference `.pt` checkpoint from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_pytrees(sd, model)


def pytrees_to_state_dict(params: dict, state: dict, model: AutoEncoder) -> dict:
    """Inverse mapping (export to the reference's layout)."""
    sd = {}
    for side in ("encoder", "decoder"):
        spec = getattr(model, side)
        for i, layer in enumerate(spec.layers):
            prefix = f"{side}.net.{i}"
            p = params[side][i]
            sd[f"{prefix}.layer.weight"] = np.asarray(p["w"]).T
            sd[f"{prefix}.layer.bias"] = np.asarray(p["b"])
            if layer.bn:
                s = state[side][i]
                sd[f"{prefix}.bn.weight"] = np.asarray(p["bn_scale"])
                sd[f"{prefix}.bn.bias"] = np.asarray(p["bn_bias"])
                sd[f"{prefix}.bn.running_mean"] = np.asarray(s["bn_mean"])
                sd[f"{prefix}.bn.running_var"] = np.asarray(s["bn_var"])
                sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0)
    return sd
