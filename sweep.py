#!/usr/bin/env python
"""Grid-search sweep entry point — the user surface of the reference's
Repeater harness (utils/repeater.py:25-92), wired to the native trainer and
the Reporter CSV exporter.

    python sweep.py --data_folder_name data/hsr_dropobject/ \
        --grid '{"btl_size": [10, 100], "n_layers": [3, 5]}' \
        --out sweep_results.csv

Each grid point is an independent run (embarrassingly parallel — the DCN /
multi-process scale-out axis, SURVEY.md §5).  On a single chip keep
--max_workers 1 (runs sequentially; concurrent processes would contend for
the device).
"""

import argparse
import json

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.utils.repeater import Repeater
from icra2021_multimodal_ad_tpu.utils.reporter import Reporter


def run_one(overrides: dict) -> dict:
    """One training+eval run; returns the result row."""
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # workers share the compiled-program cache
    overrides = dict(overrides)
    progress = overrides.pop("progress", "?")
    base = Config(verbose=0)
    cfg = base.replace(**overrides)
    cfg = cfg.replace(input_size=get_input_size(cfg))

    from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)

    det = NoveltyDetecter(cfg)
    res = det.train(model, params, state, train_x, valid_x)
    # save_stats_path=False: grid points must not overwrite the shared
    # default NAP-stats file (config.train_diffs) that full_test /
    # realtime_tester load — parallel workers would also race-write it
    base_r, sap_r, nap_r = det.test(
        model, res.params, res.state, train_x, valid_x, test_x, test_y,
        save_stats_path=False,
    )
    cfg_row = dict(overrides)  # progress already popped above
    print(f"[{progress}] {cfg_row} -> "
          f"nap_auroc={nap_r.auroc:.4f}", flush=True)  # streams per point
    return {
        "base_auroc": base_r.auroc, "sap_auroc": sap_r.auroc,
        "nap_auroc": nap_r.auroc,
        "base_aupr": base_r.aupr, "sap_aupr": sap_r.aupr,
        "nap_aupr": nap_r.aupr,
        "valid_loss": min(res.valid_history),
    }


#: config fields that feed the fused-feature build (must match what
#: dataset._feature_cache_key hashes, plus the fields that select the data)
_DATA_FIELDS = ("data_folder_name", "file_name", "sensor", "seed",
                "slicing_size", "object_select_mode", "object_type",
                "feature_cache")


def _build_features(data_kw: dict) -> None:
    """Build (and cache) the fused features for one data config."""
    from icra2021_multimodal_ad_tpu.data.dataset import TabularDataset

    dcfg = Config(verbose=0).replace(**data_kw)
    dcfg = dcfg.replace(input_size=get_input_size(dcfg))
    TabularDataset(dcfg)  # builds + writes the cache entry (or hits it)


def _prewarm_feature_cache(grid: dict, in_subprocess: bool) -> None:
    from icra2021_multimodal_ad_tpu.utils.repeater import expand_grid

    seen = set()
    warmed = 0
    for point in expand_grid(grid, shuffle=False):
        data_kw = {k: point[k] for k in _DATA_FIELDS if k in point}
        key = tuple(sorted(data_kw.items()))
        if key in seen:
            continue
        seen.add(key)
        if not getattr(Config(verbose=0).replace(**data_kw),
                       "feature_cache", 0):
            continue  # caching disabled for this combo: nothing to warm
        try:
            if in_subprocess:
                # sequential spawn: the subprocess claims the device, warms
                # the entry, and EXITS before any worker starts
                import multiprocessing

                ctx = multiprocessing.get_context("spawn")
                proc = ctx.Process(target=_build_features, args=(data_kw,))
                proc.start()
                proc.join()
                if proc.exitcode != 0:
                    raise RuntimeError(
                        f"pre-warm subprocess rc={proc.exitcode}"
                    )
            else:
                _build_features(data_kw)
            warmed += 1
        except Exception as e:  # noqa: BLE001 — point fails in isolation
            # the sweep's contract: one bad data config produces one ERROR
            # row from its grid point, never an aborted sweep
            print(f"feature pre-warm skipped for {data_kw}: "
                  f"{type(e).__name__}: {e}", flush=True)
    if warmed:
        print(f"feature cache warmed for {warmed} data config(s)",
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=str, required=True,
                   help='JSON dict of {config_field: [values...]}')
    p.add_argument("--out", type=str, default="sweep_results.csv")
    p.add_argument("--max_workers", type=int, default=1)
    p.add_argument("--device_ids", type=str, default=None,
                   help="comma list; round-robin one accelerator per worker "
                        "(the reference's one-process-per-gpu_id semantics)")
    p.add_argument("--data_folder_name", type=str,
                   default="data/hsr_dropobject/")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    grid = json.loads(args.grid)
    grid.setdefault("data_folder_name", [args.data_folder_name])
    grid.setdefault("seed", [args.seed])

    # Pre-warm the fused-feature disk cache once per distinct data
    # configuration in the grid: model-only grid points then all hit the
    # cache, and parallel workers never race N simultaneous cold builds of
    # identical features (they'd each redo the full PNG decode + fusion —
    # the round-1 sweep rebuilt features at EVERY point).  Two disciplines
    # (from review): (a) a broken data config must NOT abort the sweep
    # here — the grid point itself fails in isolation with an ERROR row;
    # (b) in parallel mode the warm-up runs in a throwaway spawn
    # subprocess, because building in the parent would initialize the
    # accelerator backend there and then contend with the pinned workers
    # for the chip (the parent previously never touched a device).
    _prewarm_feature_cache(grid, in_subprocess=args.max_workers > 1)

    # run_one is module-level (picklable); all Reporter aggregation happens
    # in the parent over the returned (config, result) pairs, so the
    # parallel mode produces the same CSV as sequential
    device_ids = (args.device_ids.split(",") if args.device_ids else None)
    pairs = Repeater(grid, run_one, max_workers=args.max_workers,
                     seed=args.seed, device_ids=device_ids,
                     ).run(sequential=args.max_workers <= 1)

    from icra2021_multimodal_ad_tpu.utils.repeater import ERROR_KEY

    reporter = Reporter()
    n_failed = 0
    for overrides, result in pairs:
        cfg_row = {k: v for k, v in overrides.items() if k != "progress"}
        if ERROR_KEY in result:
            # failed grid point: report it, keep the completed rows
            n_failed += 1
            print(f"FAILED {cfg_row}: {result[ERROR_KEY]}", flush=True)
            continue
        reporter.add(cfg_row, result)
    if reporter.cnt:
        reporter.export(args.out)
        print(f"wrote {args.out} ({reporter.cnt} rows, {n_failed} failed)")
    else:
        print(f"no grid point succeeded ({n_failed} failed); nothing written")


if __name__ == "__main__":
    main()
