#!/usr/bin/env python
"""ETL entry point — capability parity with the reference's
concatdata_maker.py:197-217: align raw per-episode captures onto the 10 Hz
grid and emit data_sum shards, with crash-resume via last_folder.csv.

    python concatdata_maker.py --data_dir <root>/data --out_dir <root>
"""

import argparse
import time

from icra2021_multimodal_ad_tpu.data.etl import hsr_preprocess


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="data/hsr_dropobject/data")
    p.add_argument("--out_dir", type=str, default="data/hsr_dropobject")
    p.add_argument("--episodes_per_shard", type=int, default=120)
    p.add_argument("--n_lidar", type=int, default=963)
    p.add_argument("--no_resume", action="store_true")
    args = p.parse_args()

    start = time.time()
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
