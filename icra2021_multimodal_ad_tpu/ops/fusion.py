"""Multimodal fusion frontend — the fixed random conv projection that turns
(RGB, depth, force, mic[, LiDAR]) windows into fused feature vectors.

Capability parity with HSR_Net (utils/data_loaders.py:152-229) and its
realtime twin Multisensory_module (utils/data_loaders.py:601-674).  The
architecture — *untrained*, randomly-initialized conv stacks applied at data
load time as a fixed random projection — is reproduced exactly, including
layer shapes:

  RGB   (B,3,32,32) -> Conv2d(3,16,k2,s2) -> Conv2d(16,16,k3,s1,p1)
                     -> Conv2d(16,16,k2,s2) -> (B,16,8,8)   = 1024 feat
  depth (B,1,32,32) -> Conv2d(1,8,k2,s2) -> Conv2d(8,8,k3,s1,p1)
                     -> Conv2d(8,8,k2,s2)  -> (B,8,8,8)     = 512
  force (B,1)       -> broadcast           -> (B,1,8,8)     = 64
  mic   (B,1,13)    -> Conv1d(1,8,k18,s9,p9) -> Conv1d(8,16,k2,s2)
                     -> reshape (B,2,8,1) broadcast -> (B,2,8,8) = 128
  LiDAR (B,1,963)   -> 5x Conv1d stack -> (B,32,8,1) broadcast -> 2048
  All:  concat [rgb, depth, force, mic] on channels -> (B,27,8,8) = 1728

(The mic path drives the *LiDAR* convs conv1l/conv2l in the reference —
data_loaders.py:216-219 — an apparent naming accident that nevertheless
defines the shipped behavior; preserved.)

TPU-native redesign: the reference loops over the batch in Python, issuing
per-sample cuDNN calls (data_loaders.py:180-229).  Here each modality is ONE
batched `lax.conv_general_dilated` in NCHW/OIHW layout, jitted into a single
XLA program; ReLU fuses into the conv epilogue.  Weights are explicitly
seeded (the reference's were unseeded-random at load time, making scores
irreproducible run to run — SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

_DN2 = ("NCHW", "OIHW", "NCHW")
_DN1 = ("NCH", "OIH", "NCH")


def _conv2d(x, w, b, stride, padding):
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2, dimension_numbers=_DN2,
        precision=lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def _conv1d(x, w, b, stride, padding):
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,),
        padding=[(padding, padding)], dimension_numbers=_DN1,
        precision=lax.Precision.HIGHEST,
    )
    return y + b[None, :, None]


def _init_conv(key, out_ch, in_ch, *kernel):
    """torch Conv default init: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch
    for k in kernel:
        fan_in *= k
    bound = 1.0 / (fan_in ** 0.5)
    w = jax.random.uniform(k_w, (out_ch, in_ch) + kernel, jnp.float32,
                           -bound, bound)
    b = jax.random.uniform(k_b, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


class FusionParams(NamedTuple):
    rgb1: dict
    rgb2: dict
    rgb3: dict
    dep1: dict
    dep2: dict
    dep3: dict
    lid1: dict
    lid2: dict
    lid3: dict
    lid4: dict
    lid5: dict


def fusion_init(key: jax.Array) -> FusionParams:
    # 13 streams kept for draw-stability: the reference's Multisensory_module
    # also constructs dedicated mic convs (utils/data_loaders.py:620-626)
    # that its forward never uses — the mic path drives the lid convs.  We
    # don't carry those dead weights (ks[11:13] are simply never drawn), but
    # the split count stays 13 so existing seeds reproduce identical params.
    ks = jax.random.split(key, 13)
    return FusionParams(
        rgb1=_init_conv(ks[0], 16, 3, 2, 2),
        rgb2=_init_conv(ks[1], 16, 16, 3, 3),
        rgb3=_init_conv(ks[2], 16, 16, 2, 2),
        dep1=_init_conv(ks[3], 8, 1, 2, 2),
        dep2=_init_conv(ks[4], 8, 8, 3, 3),
        dep3=_init_conv(ks[5], 8, 8, 2, 2),
        lid1=_init_conv(ks[6], 8, 1, 18),
        lid2=_init_conv(ks[7], 16, 8, 2),
        lid3=_init_conv(ks[8], 32, 16, 2),
        lid4=_init_conv(ks[9], 16, 32, 3),
        lid5=_init_conv(ks[10], 32, 16, 2),
    )


def _rgb_path(p: FusionParams, r):
    y = jax.nn.relu(_conv2d(r, p.rgb1["w"], p.rgb1["b"], 2, 0))
    y = jax.nn.relu(_conv2d(y, p.rgb2["w"], p.rgb2["b"], 1, 1))
    return jax.nn.relu(_conv2d(y, p.rgb3["w"], p.rgb3["b"], 2, 0))  # (B,16,8,8)


def _depth_path(p: FusionParams, d):
    y = jax.nn.relu(_conv2d(d, p.dep1["w"], p.dep1["b"], 2, 0))
    y = jax.nn.relu(_conv2d(y, p.dep2["w"], p.dep2["b"], 1, 1))
    return jax.nn.relu(_conv2d(y, p.dep3["w"], p.dep3["b"], 2, 0))  # (B,8,8,8)


def _force_path(t):
    # scalar broadcast to an 8x8 plane (data_loaders.py:211-214)
    return jnp.broadcast_to(t[:, :, None, None], (t.shape[0], 1, 8, 8))


def _mic_path(p: FusionParams, m):
    # mic drives the LiDAR 1-d convs (data_loaders.py:216-219)
    y = jax.nn.relu(_conv1d(m, p.lid1["w"], p.lid1["b"], 9, 9))   # (B,8,2)
    y = jax.nn.relu(_conv1d(y, p.lid2["w"], p.lid2["b"], 2, 0))   # (B,16,1)
    y = y.reshape(y.shape[0], 2, 8, 1)
    return jnp.broadcast_to(y, (y.shape[0], 2, 8, 8))             # (B,2,8,8)


def _lidar_path(p: FusionParams, l):
    y = jax.nn.relu(_conv1d(l, p.lid1["w"], p.lid1["b"], 9, 9))
    y = jax.nn.relu(_conv1d(y, p.lid2["w"], p.lid2["b"], 2, 0))
    y = jax.nn.relu(_conv1d(y, p.lid3["w"], p.lid3["b"], 2, 0))
    y = jax.nn.relu(_conv1d(y, p.lid4["w"], p.lid4["b"], 2, 3))
    y = jax.nn.relu(_conv1d(y, p.lid5["w"], p.lid5["b"], 2, 0))   # (B,32,8)
    y = y.reshape(y.shape[0], 32, 8, 1)
    return jnp.broadcast_to(y, (y.shape[0], 32, 8, 8))            # (B,32,8,8)


def normalize_mods(r, d, t, m):
    """Fixed-range device-side normalization of NATIVE sensor payloads —
    the realtime `norm_vec` semantics (utils/data_loaders.py:703-731):
    images [0,255] -> [-1,1], force [0,400] -> [-1,1], mic frames global
    batch min-max -> [-1,1]; full-resolution camera frames resize to 32x32
    first (realtime_tester.py:121-130 subscriber-side cv2.resize).

    Accepts the sensors' native dtypes: uint8 camera/depth frames stream
    host->device and over the wire at 1 byte/px (4x less than the fp32
    stacking the first cut used — the ingestion win is transfer bytes;
    on-chip the u8 path measures ~8% slower than pre-normalized bf16
    tensors, bench `sensor_u8_vs_bf16_same_loop`) and are cast on device,
    where the fixed ranges make the normalization exact — same fp32
    values as host-side normalization, bit for bit.  Traceable; returns
    fp32 normalized (r, d, t, m).
    """
    from icra2021_multimodal_ad_tpu.ops.image import (
        norm_minmax_global,
        resize_bilinear,
    )

    if jnp.issubdtype(r.dtype, jnp.integer):
        r = r.astype(jnp.float32)
    if jnp.issubdtype(d.dtype, jnp.integer):
        d = d.astype(jnp.float32)
    if r.shape[-2:] != (32, 32):
        r = resize_bilinear(r, (32, 32))
    if d.shape[-2:] != (32, 32):
        d = resize_bilinear(d, (32, 32))
    r = norm_minmax_global(r, in_lo=0.0, in_hi=255.0)
    d = norm_minmax_global(d, in_lo=0.0, in_hi=255.0)
    t = norm_minmax_global(t, in_lo=0.0, in_hi=400.0)
    m = norm_minmax_global(m)
    return r, d, t, m


@partial(jax.jit, static_argnames=("sensor",))
def fuse(params: FusionParams, *, sensor: str = "All",
         r: Optional[jax.Array] = None, d: Optional[jax.Array] = None,
         l: Optional[jax.Array] = None, t: Optional[jax.Array] = None,
         m: Optional[jax.Array] = None) -> jax.Array:
    """Batched fusion; returns (B, feat) flattened features.

    sensor='All' concatenates [rgb, depth, force, mic] on channels
    (data_loaders.py:226 order: rr, dd, tt, mm) -> (B, 1728).
    Unimodal sensors return just that branch, flattened.
    """
    if sensor == "All":
        # flatten each branch to (B, C*64) BEFORE concatenating: NCHW
        # concat/broadcast on (..., 8, 8) minors forces pathological TPU
        # layouts (8-lane arrays padded 16x) — measured 2.3 ms/iter at
        # B=16384, as expensive as the whole AE forward, vs ~0.1 ms for the
        # conv math itself.  Channel-major flattening preserves the exact
        # (rr, dd, tt, mm) channel-concat ordering (data_loaders.py:226).
        b = (r if r is not None else d).shape[0]
        parts = [
            _rgb_path(params, r).reshape(b, -1),
            _depth_path(params, d).reshape(b, -1),
            _force_path(t).reshape(b, -1),
            _mic_path(params, m).reshape(b, -1),
        ]
        out = jnp.concatenate(parts, axis=1)
    elif sensor == "hand_camera":
        out = _rgb_path(params, r)
    elif sensor == "head_depth":
        out = _depth_path(params, d)
    elif sensor == "force_torque":
        out = _force_path(t)
    elif sensor == "mic":
        out = _mic_path(params, m)
    elif sensor == "LiDAR":
        out = _lidar_path(params, l)
    else:
        raise ValueError(f"unknown sensor: {sensor}")
    return out.reshape(out.shape[0], -1)
