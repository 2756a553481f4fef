"""Dataset-build phase profile (run from repo root): where does the cold
TabularDataset build spend its time?  Phases: shard CSV read (native
fast_csv.read_light_frame, pandas fallback), PNG decode (native libpng,
batched), device fuse program (_preprocess_and_fuse incl. transfer), and
the total.  Synthesizes its own shards under /tmp so the numbers isolate
build cost from data layout."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data import dataset as dsmod
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    root = "/tmp/build_profile_ds"
    if not os.path.exists(os.path.join(root, "data_sum1.csv")):
        generate_data_sum_shards(root, n_episodes=40, steps_per_episode=40,
                                 n_shards=2, seed=0)
    cfg = Config(sensor="All", data_folder_name=root + "/", verbose=0,
                 slicing_size=1600, feature_cache=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))

    # warm pass compiles the fuse program so the timed pass is steady-state
    t0 = time.perf_counter()
    ds = dsmod.TabularDataset(cfg)
    np.asarray(ds.data[0])  # fetch: forces the build program to complete
    warm_total = time.perf_counter() - t0
    n = len(ds)

    t0 = time.perf_counter()
    df, _ = dsmod._read_shards(cfg)
    t_csv = time.perf_counter() - t0

    data_dirs = df["data_dir"].to_numpy()
    hand_ids = df["cur_hand_id"].to_numpy()
    depth_ids = df["cur_depth_id"].to_numpy()
    t0 = time.perf_counter()
    raw_r = dsmod._load_images(cfg.data_folder_name, data_dirs, hand_ids,
                               "hand")
    raw_d = dsmod._load_images(cfg.data_folder_name, data_dirs, depth_ids,
                               "d")
    t_png = time.perf_counter() - t0

    weight = df["cur_hand_weight"].to_numpy().astype(np.float32)[:, None]
    mfcc = df[dsmod.MFCC_COLS].to_numpy().astype(np.float32)

    t0 = time.perf_counter()
    out = dsmod._preprocess_and_fuse(
        ds.fusion_params, sensor="All", raw_r=raw_r, raw_d=raw_d,
        weight=weight, mfcc=mfcc)
    # fetch the result, don't just block: over the axon tunnel
    # block_until_ready can return before device work/transfer completes
    # (CLAUDE.md timing rule), which would misattribute fuse time to the
    # full_build residual
    np.asarray(out)
    t_fuse = time.perf_counter() - t0

    t0 = time.perf_counter()
    ds2 = dsmod.TabularDataset(cfg)
    np.asarray(ds2.data[0])  # fetch: forces the build program to complete
    total = time.perf_counter() - t0
    assert len(ds2) == n

    print(f"rows={n}  cold_total={warm_total:.3f}s")
    print(f"phases (steady-state): csv={t_csv:.3f}s  png={t_png:.3f}s  "
          f"fuse+transfer={t_fuse:.3f}s  full_build={total:.3f}s "
          f"({n/total:.0f} rows/s)")
    acct = t_csv + t_png + t_fuse
    print(f"accounted={acct:.3f}s  other={total-acct:.3f}s")


if __name__ == "__main__":
    main()
