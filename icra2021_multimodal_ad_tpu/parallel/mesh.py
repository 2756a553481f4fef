"""Mesh construction + sharding helpers.

The workload scores i.i.d. windows (SURVEY.md §5: nothing couples across
time), so the natural decomposition is 1-D data parallelism over the window
axis: batch rows sharded over the 'data' mesh axis, parameters replicated.
Under jit, XLA derives the gradient all-reduce and the BN batch-statistic
reductions from the shardings — no hand-written collectives on this path.
The NAP whitening matmul (rows x V) shards the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the window/batch axis.  Asking for more devices than
    exist is an error — silently truncating would report n-way parallelism
    while executing on fewer chips."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"mesh_shape wants {n_devices} devices but only "
                f"{len(devices)} are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Shard the leading (window) axis across the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def all_gather(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Gather a batch-sharded array to a full replica on every device (the
    all-gather-before-NAP-SVD step, SURVEY.md §5 distributed mapping).
    device_put reshards in place — XLA emits the all-gather over ICI."""
    return jax.device_put(x, replicated_sharding(mesh))


def pad_to_multiple(x, multiple: int):
    """Pad the leading axis up to a multiple of `multiple` (sharding a batch
    over n devices requires divisibility).  Returns (padded, n_pad)."""
    import jax.numpy as jnp

    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, pad
