#!/usr/bin/env python
"""Probe: can the cold dataset build overlap its host phases with the
tunnel upload?  (VERDICT r3 stretch item; ARCHITECTURE.md §6.6 pins the
phase split: host CSV+PNG ~0.18 s vs device fuse+transfer 0.29-0.37 s
for 1600 rows — ONE dispatch whose cost is dominated by the ~5 MB uint8
image upload + fused-feature fetch over the ~44 MB/s tunnel.)

Variants measured on identical data (2000 rows, 2 shards):
  A. current: decode everything, then one _preprocess_and_fuse dispatch
     (host->device upload happens inside the dispatch).
  B. chunked-upload overlap: decode images in row chunks, jax.device_put
     each chunk as soon as it is decoded (async dispatch — the transfer
     proceeds while the next chunk decodes), then concatenate ON DEVICE
     and run the same fuse program on the device-resident arrays.
     Numerics identical: the fuse program sees the same full-batch
     arrays (per-column min-max stays batch-global).
  C. device_put asynchrony check: time device_put of the full image
     stack with and without block_until_ready — if the non-blocking call
     returns in ~0 the transfer can genuinely overlap host decode.

Run on the tunneled TPU (the thing being probed IS the tunnel):
    PYTHONPATH=. python scripts/build_overlap_probe.py

RECONCILIATION OUTCOME (r5): this probe's 2.18x (B vs A, against a 3.8k
rows/s baseline measured in a slow-tunnel phase) did NOT replicate under
the bench's same-session interleaved A/B — BENCH r5
`dataset_build_overlap_ratio` measured 1.02 (spreads overlapping, ~5.9k
baseline) to 1.17 (spreads disjoint, ~7.0k baseline) across sessions.
The adopted chunked path is worth 0-17% on this tunnel depending on
phase — RTT/dispatch-bound when slow, decode-visible when fast — and
more on hosts where decode is the long pole; treat this probe's
end-to-end ratio as tunnel-phase-dependent (the C-variant asynchrony
finding itself — device_put dispatch returns in ms for a 250 ms
transfer — still stands and still powers the pipelined streaming
fetch)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

import tempfile

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.data.dataset import (
    MFCC_COLS,
    TabularDataset,
    _load_images,
    _preprocess_and_fuse,
    _read_shards,
)
from icra2021_multimodal_ad_tpu.data.synthetic import generate_data_sum_shards
from icra2021_multimodal_ad_tpu.ops.fusion import fusion_init


def main():
    root = tempfile.mkdtemp(prefix="overlapds_")
    n_rows = 2000
    generate_data_sum_shards(root, n_episodes=n_rows // 40,
                             steps_per_episode=40, n_shards=2,
                             n_lidar=963, seed=0)
    cfg = Config(sensor="All", seed=0, verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg),
                      data_folder_name=root, slicing_size=n_rows,
                      feature_cache=0)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    # warm: compile the fuse program + tunnel session
    ds = TabularDataset(cfg, fusion_params=fusion_params)
    jax.block_until_ready(ds.data)
    want = np.asarray(ds.data)

    def timed(f, n=3):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = f()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best, out

    # A: current build
    def build_a():
        d = TabularDataset(cfg, fusion_params=fusion_params)
        jax.block_until_ready(d.data)
        return d
    tA, _ = timed(build_a, n=3)
    print(f"A current build: {tA:.3f} s ({n_rows / tA:.0f} rows/s)",
          flush=True)

    # C: device_put asynchrony
    df, _ = _read_shards(cfg)
    dirs = df["data_dir"].to_numpy()
    hand = df["cur_hand_id"].to_numpy()
    depth = df["cur_depth_id"].to_numpy()
    raw_r = _load_images(root, dirs, hand, "hand")
    raw_d = _load_images(root, dirs, depth, "d")
    t0 = time.perf_counter()
    a = jax.device_put(raw_r)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(a)
    t_full = time.perf_counter() - t0
    print(f"C device_put {raw_r.nbytes / 1e6:.1f} MB: dispatch returns in "
          f"{t_disp * 1e3:.1f} ms, transfer completes in "
          f"{t_full * 1e3:.1f} ms -> "
          f"{'ASYNC (overlap possible)' if t_disp < 0.3 * t_full else 'SYNCHRONOUS (no overlap available)'}",
          flush=True)

    # B: chunked-upload overlap build
    def build_b(n_chunks=4):
        df, _ = _read_shards(cfg)
        dirs = df["data_dir"].to_numpy()
        hand = df["cur_hand_id"].to_numpy()
        dep = df["cur_depth_id"].to_numpy()
        n = len(df)
        bounds = [round(i * n / n_chunks) for i in range(n_chunks + 1)]
        dev_r, dev_d = [], []
        for i0, i1 in zip(bounds[:-1], bounds[1:]):
            # decode chunk i (host) — transfer of chunk i-1 is in flight
            dev_r.append(jax.device_put(
                _load_images(root, dirs[i0:i1], hand[i0:i1], "hand")))
            dev_d.append(jax.device_put(
                _load_images(root, dirs[i0:i1], dep[i0:i1], "d")))
        weight = df["cur_hand_weight"].to_numpy().astype(np.float32)[:, None]
        mfcc = df[MFCC_COLS].to_numpy().astype(np.float32)
        data = _preprocess_and_fuse(
            fusion_params, sensor="All",
            raw_r=jnp.concatenate(dev_r, axis=0),
            raw_d=jnp.concatenate(dev_d, axis=0),
            weight=weight, mfcc=mfcc)
        jax.block_until_ready(data)
        return data
    got = build_b()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    for n_chunks in (2, 4, 8):
        tB, _ = timed(lambda: build_b(n_chunks), n=3)
        print(f"B overlap build (chunks={n_chunks}): {tB:.3f} s "
              f"({n_rows / tB:.0f} rows/s, {tA / tB:.2f}x vs A)",
              flush=True)


if __name__ == "__main__":
    main()
