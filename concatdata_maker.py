#!/usr/bin/env python
"""ETL entry point — capability parity with the reference's
concatdata_maker.py:197-217: align raw per-episode captures onto the 10 Hz
grid and emit data_sum shards, with crash-resume via last_folder.csv.

    python concatdata_maker.py --data_dir <root>/data --out_dir <root>

All three of the reference's time-sync generations are reachable:
  --variant current   concatdata_maker.py schema (default; wav-MFCC columns)
  --variant legacy    datasets/data_preprocess.py schema (rgb-id +
                      per-row mic-sample columns, one unsharded CSV)
  --variant frames    youngjae/preprocess/make_timesync_csv_file.py
                      prototype (per-RGB-frame windows, one episode dir)
"""

import argparse
import os
import time

from icra2021_multimodal_ad_tpu.data.etl import (
    hsr_preprocess,
    hsr_preprocess_legacy,
    make_timesync_frames,
)


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="data/hsr_dropobject/data")
    p.add_argument("--out_dir", type=str, default="data/hsr_dropobject")
    p.add_argument("--episodes_per_shard", type=int, default=120)
    p.add_argument("--n_lidar", type=int, default=963)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--variant", choices=["current", "legacy", "frames"],
                   default="current",
                   help="which of the reference's three time-sync ETL "
                        "generations to run (see module docstring)")
    args = p.parse_args()

    start = time.time()
    if args.variant == "legacy":
        out = hsr_preprocess_legacy(
            args.data_dir, os.path.join(args.out_dir, "data_sum.csv"),
            n_lidar=args.n_lidar,
        )
        print("hsr dataset made:", [out])
    elif args.variant == "frames":
        # the prototype operated on ONE episode's capture dir
        out = os.path.join(args.out_dir, "timesync.csv")
        df = make_timesync_frames(args.data_dir, out_path=out)
        print(f"hsr dataset made: ['{out}'] ({len(df)} frames)")
    else:
        written = hsr_preprocess(
            args.data_dir, args.out_dir,
            episodes_per_shard=args.episodes_per_shard,
            n_lidar=args.n_lidar,
            resume=not args.no_resume,
        )
        print("hsr dataset made:", written)
    print(f"{time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
