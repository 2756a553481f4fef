"""Image preprocessing: min-max normalization and nearest resize.

Capability parity with the reference's image path (utils/data_loaders.py):
  * `norm_vec_np` (offline, :448-457): per-column min-max over the batch to
    [0, 1], NaN -> 0.
  * `norm_vec` (realtime, :703-712): global min-max to a target range
    (images use range_in=[0,255] -> [-1,1], force uses [0,400]).
  * `F.interpolate(x, 32)` (:370-390): nearest-neighbor spatial resize of the
    24x32 loaded images to 32x32 before the fusion convs.

All jittable; resize matches torch's nearest-exact-False indexing
(src = floor(dst * in/out)), verified in tests/test_fusion_pipeline.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def norm_minmax_per_column(v: jax.Array, out_lo: float = 0.0,
                           out_hi: float = 1.0) -> jax.Array:
    """Per-column min-max over axis 0 -> [out_lo, out_hi]; NaN/Inf -> 0
    (norm_vec_np, data_loaders.py:448-457)."""
    v = v.astype(jnp.float32)
    lo = jnp.min(v, axis=0)
    hi = jnp.max(v, axis=0)
    out = (out_hi - out_lo) * (v - lo) / (hi - lo) + out_lo
    return jnp.nan_to_num(out)


@jax.jit
def norm_minmax_global(v: jax.Array, in_lo=None, in_hi=None,
                       out_lo: float = -1.0, out_hi: float = 1.0) -> jax.Array:
    """Global min-max to [out_lo, out_hi] with optional fixed input range
    (norm_vec, data_loaders.py:703-712)."""
    v = v.astype(jnp.float32)
    lo = jnp.min(v) if in_lo is None else in_lo
    hi = jnp.max(v) if in_hi is None else in_hi
    return (out_hi - out_lo) * (v - lo) / (hi - lo) + out_lo


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize of (..., H, W), matching
    torch.nn.functional.interpolate(mode='nearest'): src = floor(dst*in/out)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    rows = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    return x[..., rows, :][..., cols]


@partial(jax.jit, static_argnames=("size",))
def resize_bilinear(x: jax.Array, size: tuple) -> jax.Array:
    """Bilinear resize of (..., H, W) for camera frames (cv2.INTER_AREA
    stand-in on the realtime path, realtime_tester.py:121-130)."""
    out_shape = x.shape[:-2] + size
    return jax.image.resize(x, out_shape, method="bilinear")
