"""Checkpointing: model params + BN state (+ NAP whitening stats).

Capability parity with the reference's torch.save of the model state dict
(novelty_detection.py:196) and its torch.load at both eval entry points
(FullTest.py:256, realtime_tester.py:281) — rebuilt on numpy .npz flat
pytrees so checkpoints are backend-neutral and mmap-friendly.  Orbax is used
when a directory path is given (large runs / async); .npz otherwise.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


_EMPTY = "__empty__"  # marker so empty dicts/lists survive the round trip


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        if not tree:
            return {f"{prefix}{_EMPTY}": np.asarray(0)}
        for k in tree:
            # '.' is the path separator of the flat format; a key containing
            # it would silently split into nested nodes on load
            if "." in k:
                raise ValueError(
                    f"checkpoint dict keys must not contain '.': {k!r}"
                )
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        if not tree:
            return {f"{prefix}{_EMPTY}": np.asarray(0)}
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("."): np.asarray(tree)}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}."))
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return _listify(root)


def _listify(node):
    if not isinstance(node, dict):
        return node
    if list(node.keys()) == [_EMPTY]:
        return {}
    keys = list(node.keys())
    # lists flatten to keys '0'..'N-1'; only EXACTLY that key set converts
    # back (a dict with non-contiguous digit keys like {'5','10'} stays a
    # dict instead of crashing; a dict with keys '0'..'N-1' is inherently
    # ambiguous with a list in this flat format and comes back as a list)
    if (keys and all(k.isdigit() for k in keys)
            and sorted(int(k) for k in keys) == list(range(len(keys)))):
        return [_listify(node[str(i)]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}


def _is_dir_path(path: str) -> bool:
    return path.endswith(os.sep) or os.path.isdir(path)


def save_checkpoint(path: str, params, state, config=None,
                    extra: Optional[dict] = None) -> str:
    """Persist (params, state) to `<path>.npz` (suffix added if missing).

    A DIRECTORY path (trailing separator, or an existing Orbax checkpoint
    directory) routes to Orbax instead — async-friendly, sharding-aware
    storage for large runs; the flat-npz format stays the default for
    single-file artifacts.  An existing directory that is NOT an Orbax
    checkpoint (and not empty) raises instead of silently switching
    formats based on filesystem state.
    """
    if path.endswith(os.sep):
        return _save_orbax(path, params, state, config, extra)
    if os.path.isdir(path):
        looks_orbax = (os.path.isdir(os.path.join(path, "tree"))
                       or not os.listdir(path))
        if not looks_orbax:
            raise ValueError(
                f"{path!r} is an existing non-checkpoint directory — add a "
                f"trailing '{os.sep}' to save an Orbax checkpoint there, or "
                f"pick another name for a .npz checkpoint"
            )
        return _save_orbax(path, params, state, config, extra)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}
    flat.update({f"params.{k}": v for k, v in _flatten(params).items()})
    flat.update({f"state.{k}": v for k, v in _flatten(state).items()})
    if extra:
        flat.update({f"extra.{k}": v for k, v in _flatten(extra).items()})
    if config is not None:
        flat["__config__"] = np.frombuffer(
            json.dumps(_config_dict(config)).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)
    return path


def _save_orbax(path: str, params, state, config, extra) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip(os.sep))
    tree = {"params": params, "state": state}
    if extra:
        tree["extra"] = extra
    tree_dir = os.path.join(path, "tree")
    ocp.PyTreeCheckpointer().save(tree_dir, tree, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(_config_dict(config), f)
    return path


def _load_orbax(path: str) -> Tuple[Any, Any, dict]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip(os.sep))
    tree = ocp.PyTreeCheckpointer().restore(os.path.join(path, "tree"))
    meta: dict = {"extra": tree.get("extra", {})}
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            meta["config"] = json.load(f)
    return tree["params"], tree["state"], meta


def load_checkpoint(path: str) -> Tuple[Any, Any, dict]:
    """Returns (params, state, meta) where meta has 'config' and 'extra'.
    Directory paths load Orbax checkpoints; files load the flat npz."""
    if _is_dir_path(path) and not os.path.isfile(path) \
            and not os.path.isfile(path + ".npz"):
        return _load_orbax(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    params_flat, state_flat, extra_flat = {}, {}, {}
    meta: dict = {}
    for k in z.files:
        if k == "__config__":
            meta["config"] = json.loads(bytes(z[k]).decode())
        elif k.startswith("params."):
            params_flat[k[len("params."):]] = z[k]
        elif k.startswith("state."):
            state_flat[k[len("state."):]] = z[k]
        elif k.startswith("extra."):
            extra_flat[k[len("extra."):]] = z[k]
    meta["extra"] = _unflatten(extra_flat) if extra_flat else {}
    return _unflatten(params_flat), _unflatten(state_flat), meta


def to_device(tree, sharding=None):
    """Move a loaded (numpy) pytree onto device, optionally sharded."""
    put = (lambda a: jax.device_put(a, sharding)) if sharding else jax.device_put
    return jax.tree.map(put, tree)


def _config_dict(config):
    if hasattr(config, "to_dict"):
        return config.to_dict()
    if hasattr(config, "__dict__"):
        return {k: v for k, v in vars(config).items()
                if isinstance(v, (int, float, str, bool, type(None)))}
    return {}
