"""Fixture evaluation support: caltime-style CSV -> fused feature windows.

The reference evaluates `datasets/caltime_test.csv` (10 windows x 984
columns incl. a golden `nap_score` column) through a local get_loaders
variant with ratios [0,0,1] (test_file/FullTest.py:144-203).  This module is
that capability as a function: a DataFrame in the data_sum schema becomes a
fused (N, input_size) window batch using the same normalization + fusion
path as the offline dataset loader.

When the per-row PNGs are reachable under `config.data_folder_name` they are
loaded; otherwise deterministic placeholder images seeded from
(data_dir, id) are synthesized so the fixture stays runnable without the
private robot dataset (the reference simply crashes in that case).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.data.dataset import MFCC_COLS, _load_images
from icra2021_multimodal_ad_tpu.ops.fusion import FusionParams, fuse, fusion_init
from icra2021_multimodal_ad_tpu.ops.image import (
    norm_minmax_per_column,
    resize_nearest,
)


def _placeholder_images(data_dirs, ids, shape) -> np.ndarray:
    import zlib

    out = []
    for d, i in zip(data_dirs, ids):
        # crc32, not hash(): Python's str hash is salted per process and
        # would make fixture scores irreproducible
        seed = zlib.crc32(f"{d}/{int(i)}".encode()) & 0x7FFFFFFF
        out.append(np.random.default_rng(seed).uniform(0, 255, shape))
    return np.stack(out)


def _images_or_placeholder(config, df, ids, subdir, shape):
    """Real PNGs where present, deterministic placeholders where not —
    decided PER ROW (a first-row-only probe would either crash on a later
    missing frame or silently placeholder everything)."""
    data_dirs = df["data_dir"].to_numpy()
    paths = [
        os.path.join(config.data_folder_name, "data", str(d), "data", "img",
                     subdir, f"{int(i)}.png")
        for d, i in zip(data_dirs, ids)
    ]
    present = np.asarray([os.path.exists(p) for p in paths])
    if present.all():
        return _load_images(config.data_folder_name, data_dirs, ids, subdir)
    out = _placeholder_images(data_dirs, ids, shape)
    if present.any():
        real = _load_images(config.data_folder_name, data_dirs[present],
                            np.asarray(ids)[present], subdir)
        out[present] = real.reshape((present.sum(),) + out.shape[1:])
        print(f"fixture: {int((~present).sum())}/{len(paths)} {subdir} "
              f"images missing under {config.data_folder_name}; "
              f"placeholders substituted for those rows")
    else:
        print(f"fixture: {subdir} images not found under "
              f"{config.data_folder_name}; using deterministic placeholders")
    return out


def fixture_to_features(df: pd.DataFrame, config: Config,
                        fusion_params: Optional[FusionParams] = None) -> jax.Array:
    """data_sum-schema DataFrame -> fused (N, input_size) windows."""
    if fusion_params is None:
        fusion_params = fusion_init(jax.random.PRNGKey(config.seed))
    sensor = config.sensor
    kw = {}
    if sensor in ("All", "hand_camera"):
        raw = _images_or_placeholder(
            config, df, df["cur_hand_id"].to_numpy(), "hand", (24, 32, 3)
        )
        r = norm_minmax_per_column(
            jnp.asarray(raw.reshape(len(raw), -1), dtype=jnp.float32)
        )
        kw["r"] = resize_nearest(
            r.reshape(-1, 24, 32, 3).transpose(0, 3, 1, 2), 32, 32
        )
    if sensor in ("All", "head_depth"):
        raw = _images_or_placeholder(
            config, df, df["cur_depth_id"].to_numpy(), "d", (24, 32)
        )
        d = norm_minmax_per_column(
            jnp.asarray(raw.reshape(len(raw), -1), dtype=jnp.float32)
        )
        kw["d"] = resize_nearest(d.reshape(-1, 1, 24, 32), 32, 32)
    if sensor in ("All", "force_torque"):
        w = df["cur_hand_weight"].to_numpy().astype(np.float32)
        kw["t"] = norm_minmax_per_column(jnp.asarray(w[:, None]))
    if sensor in ("All", "mic"):
        m = norm_minmax_per_column(
            jnp.asarray(df[MFCC_COLS].to_numpy(), dtype=jnp.float32)
        )
        kw["m"] = m[:, None, :]
    if sensor == "LiDAR":
        from icra2021_multimodal_ad_tpu.data.dataset import LIDAR_COLS

        lidar = df[LIDAR_COLS].to_numpy().astype(np.float32)
        kw["l"] = norm_minmax_per_column(jnp.asarray(lidar))[:, None, :]
    return fuse(fusion_params, sensor=sensor, **kw)
