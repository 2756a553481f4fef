"""RaPP diff extraction — "reconstruction along the projection pathway".

Capability parity with reconstruction_aggregation.py:6-37 of the reference:
propagate both the input x and its reconstruction x_hat through every encoder
layer, collecting the per-layer differences.  diffs[0] is the input-space
reconstruction error; diffs[i] (i>=1) is the difference after encoder layer i.

TPU-native design: the reference copies every per-layer diff to host inside
the loop (reconstruction_aggregation.py:23,28 `.cpu()`) — its single biggest
device-traffic hotspot.  Here one jitted function computes the forward AND
all layer taps for both pathways in a single XLA program; nothing leaves the
device.  Large inputs are chunked at a static batch size (padding the tail)
so compilation is shape-stable.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from icra2021_multimodal_ad_tpu.models.autoencoder import AutoEncoder, ae_decode
from icra2021_multimodal_ad_tpu.models.fc_module import fc_module_apply_taps


@partial(jax.jit, static_argnames=("model",))
def diffs_batch(model: AutoEncoder, params: dict, state: dict, x: jax.Array):
    """Single fused forward + dual-pathway layer taps.  Eval mode (BN running
    stats); returns a tuple of (batch, dim_i) diff arrays, length n_layers+1.

    VIB models score deterministically (z = mu) — the reference's get_diffs
    drives encoder layers directly, bypassing the decorator entirely
    (reconstruction_aggregation.py:22-28), so the taps here are likewise the
    raw per-layer outputs (including the double-width VIB head).

    FLOPs: the reference computes the encoder three times per window
    (model(x) at reconstruction_aggregation.py:21, then the two per-layer
    re-drives at :22-28).  Here the x-pathway taps are computed once and the
    bottleneck tap IS the latent (identical ops, bitwise-equal), so the
    whole extraction is 2 encoder passes + 1 decoder pass."""
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    taps_x, _ = fc_module_apply_taps(
        model.encoder, params["encoder"], state["encoder"], x, train=False
    )
    z = taps_x[-1]
    if model.distribution is not None:
        z = z[..., : z.shape[-1] // 2]  # deterministic VIB: z = mu
    x_hat, _ = ae_decode(model, params, state, z, train=False)
    x_hat = x_hat.reshape(x.shape[0], -1)
    taps_xhat, _ = fc_module_apply_taps(
        model.encoder, params["encoder"], state["encoder"], x_hat, train=False
    )
    diffs = [x_hat - x]
    diffs += [h2 - h1 for h1, h2 in zip(taps_x, taps_xhat)]
    return tuple(diffs)


def get_diffs(
    x,
    model: AutoEncoder,
    params: dict,
    state: dict,
    batch_size: Optional[int] = None,
    mesh=None,
) -> List[jax.Array]:
    """Chunked RaPP diffs over an arbitrarily-sized input.

    Mirrors the reference signature get_diffs(x, model, batch_size=698)
    (reconstruction_aggregation.py:6) but keeps results on device.  Returns a
    list of (n, dim_i) arrays, one per pathway layer (n_layers + 1 entries).

    With `mesh`, the batch is sharded over the mesh's window axis and the
    diffs come out batch-sharded — the distributed eval path the reference
    never had (SURVEY.md §5).  Padding rows (for divisibility) are appended
    on the *sharded* side and sliced off the outputs; eval-mode BN has no
    cross-row coupling, so padding cannot perturb real rows.
    """
    from icra2021_multimodal_ad_tpu.parallel.mesh import pad_to_multiple

    x = jnp.asarray(x)
    x = x.reshape(x.shape[0], -1)
    n = x.shape[0]

    if mesh is not None:
        from icra2021_multimodal_ad_tpu.parallel.mesh import shard_batch

        place = lambda piece: shard_batch(mesh, piece)  # noqa: E731
        n_dev = mesh.devices.size
        if batch_size is None or batch_size >= n:
            xp, pad = pad_to_multiple(x, n_dev)
            out = diffs_batch(model, params, state, place(xp))
            return [o[:n] for o in out] if pad else list(out)
        # chunked: round the chunk up to a divisible size
        chunk = batch_size + ((-batch_size) % n_dev)
    else:
        place = lambda piece: piece  # noqa: E731
        if batch_size is None or batch_size >= n:
            return [jnp.asarray(d)
                    for d in diffs_batch(model, params, state, x)]
        chunk = batch_size

    # ONE chunk loop for both paths (compile-shape invariant: every chunk
    # is padded to the same static size, the pad rows sliced off after)
    parts = []
    for start in range(0, n, chunk):
        piece, pad = pad_to_multiple(x[start : start + chunk], chunk)
        out = diffs_batch(model, params, state, place(piece))
        if pad:
            out = tuple(o[: chunk - pad] for o in out)
        parts.append(out)
    return [jnp.concatenate(ps, axis=0) for ps in zip(*parts)]
