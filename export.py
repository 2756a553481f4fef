#!/usr/bin/env python
"""Export trained scorers as StableHLO artifacts (jax.export).

    python export.py --saved_name datasets/All_100 \
        --train_diffs datasets/All_train_diffs --out_dir artifacts/ \
        --batch_size 1024 --compute_dtype bfloat16 --guard_tol 0.05

Writes self-contained `.stablehlo` blobs — weights (and NAP whitening
stats) baked in as constants, loadable with `jax.export.deserialize`
alone, no model code — plus a `manifest.json` recording the export
configuration, guard measurement, and per-artifact shapes.  This is the
deployment packaging step the reference never had: its robot-side
consumers re-imported the full training codebase to load torch state
dicts (test_file/realtime_tester.py:278-281).

Artifacts (selected via --ops):
  base         fused windows -> BASE reconstruction score
  nap_windows  fused windows -> RaPP diffs -> whitened NAP score
               (the deployable streaming scorer)
  nap          concat diffs -> NAP score (for callers that extract
               diffs themselves)
  base_sensor  NATIVE payloads (uint8 camera/depth frames + newtons +
               MFCC) -> device-side normalize + fuse -> BASE score —
               the ingestion-native robot-side artifact (needs a
               sensor='All' checkpoint; fusion projection baked in)
  nap_sensor   same ingestion, through RaPP diffs to the whitened NAP
               score at the bundle's certified precision

With --guard_tol, low-precision bundles (bfloat16 and/or int8 NAP) must
pass the fp32 accuracy guard on a probe batch before anything is
written.  --verify round-trips every artifact through jax.export
deserialization and checks it against the live bundle on the probe.
"""

import argparse
import json
import os

import numpy as np

from icra2021_multimodal_ad_tpu.config import (
    Config,
    get_input_size,
    reconcile_model_config,
)
from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder
from icra2021_multimodal_ad_tpu.ops.scoring import load_nap_stats
from icra2021_multimodal_ad_tpu.utils.checkpoint import load_checkpoint, to_device

_OPS = ("base", "nap_windows", "nap", "base_sensor", "nap_sensor")


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--saved_name", type=str, default="datasets/All_100")
    p.add_argument("--train_diffs", type=str, default=None,
                   help="persisted NAP stats; required for the nap ops")
    p.add_argument("--sensor", type=str, default="All")
    p.add_argument("--n_layers", type=int, default=5)
    p.add_argument("--btl_size", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=1024,
                   help="static batch dimension baked into the artifacts")
    p.add_argument("--sensor_h", type=int, default=32,
                   help="camera/depth frame height baked into *_sensor "
                        "artifacts (full-resolution frames are resized "
                        "on device by normalize_mods)")
    p.add_argument("--sensor_w", type=int, default=32,
                   help="camera/depth frame width for *_sensor artifacts")
    p.add_argument("--ops", type=str, default="base,nap_windows",
                   help=f"comma-separated subset of {_OPS}")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--nap_quant", type=str, default=None, choices=["int8"])
    p.add_argument("--guard_tol", type=float, default=None,
                   help="refuse to export unless the low-precision scores "
                        "agree with fp32 within this relative tolerance on "
                        "a probe batch")
    p.add_argument("--verify", type=int, default=1,
                   help="round-trip each artifact through deserialization "
                        "and compare with the live bundle (0 = skip)")
    p.add_argument("--verify_tol", type=float, default=1e-2,
                   help="mean relative score tolerance for --verify (the "
                        "accuracy guards' metric).  The artifact compiles "
                        "the whole pipeline as ONE program whose different "
                        "fusion/tiling shifts fp32 LSBs; NAP's near-null "
                        "whitened directions amplify those, so exact "
                        "equality is not the contract — agreement at the "
                        "guard metric is")
    args = p.parse_args()

    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    unknown = [o for o in ops if o not in _OPS]
    if unknown:
        p.error(f"unknown ops {unknown}; choose from {_OPS}")
    wants_nap = any(o.startswith("nap") for o in ops)
    if wants_nap and not args.train_diffs:
        p.error("nap exports need --train_diffs")
    wants_sensor = any(o.endswith("_sensor") for o in ops)
    if wants_sensor and args.sensor != "All":
        p.error("sensor exports need --sensor All (the fusion frontend)")
    if (args.guard_tol is not None and args.compute_dtype == "float32"
            and not args.nap_quant):
        p.error("--guard_tol guards the low-precision path; pass "
                "--compute_dtype bfloat16 or --nap_quant int8 with it")

    cfg = Config(
        sensor=args.sensor, n_layers=args.n_layers, btl_size=args.btl_size,
        saved_name=args.saved_name,
        train_diffs=args.train_diffs or "datasets/All_train_diffs",
        seed=args.seed, compute_dtype=args.compute_dtype,
        nap_quant=args.nap_quant,
    )
    cfg = cfg.replace(input_size=get_input_size(cfg))
    params, state, meta = load_checkpoint(cfg.saved_name)
    cfg = reconcile_model_config(cfg, meta)
    if wants_sensor and cfg.sensor != "All":
        # the checkpoint's saved config overrides the flag — fail with the
        # same argparse diagnostic as the pre-reconcile check instead of a
        # raw ValueError traceback from export_sensor_scorer
        p.error(f"sensor exports need a sensor='All' checkpoint "
                f"(checkpoint says sensor={cfg.sensor!r})")
    model = build_autoencoder(cfg)
    params, state = to_device(params), to_device(state)
    stats = load_nap_stats(cfg.train_diffs) if args.train_diffs else None

    from icra2021_multimodal_ad_tpu.ops.serving import (
        export_base_scorer,
        export_nap_scorer,
        export_nap_window_scorer,
        export_sensor_scorer,
        load_scorer,
        make_serving,
        run_precision_guard,
    )

    fusion_params = None
    if cfg.sensor == "All":
        import jax

        from icra2021_multimodal_ad_tpu.ops.fusion import fusion_init

        # the fusion frontend is a SEEDED fixed random projection
        # (ops/fusion.py) — rebuilt from config.seed exactly like the
        # CLIs and ScoreServer, and baked into the sensor artifacts
        fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    serving = make_serving(cfg, model, params, state, nap_stats=stats,
                           fusion_params=fusion_params)
    probe = np.random.default_rng(cfg.seed).normal(
        0, 1, (args.batch_size, cfg.input_size)).astype(np.float32)

    guard_rel = None
    if args.guard_tol is not None:
        guard_rel = run_precision_guard(cfg, model, params, state, stats,
                                        probe, args.guard_tol,
                                        serving=serving)
        if guard_rel is not None:
            print(f"export guard: rel err {guard_rel:.4f} "
                  f"<= tol {args.guard_tol}")
        else:
            print("export guard: configuration resolves to the exact fp32 "
                  "path (e.g. int8 NAP without --train_diffs) — nothing "
                  "to guard")

    os.makedirs(args.out_dir, exist_ok=True)
    cat_size = None
    if stats is not None:
        cat_size = int(np.asarray(stats.rotater.mu).shape[-1])
    manifest = {
        "saved_name": args.saved_name,
        "train_diffs": args.train_diffs,
        "sensor": cfg.sensor, "n_layers": cfg.n_layers,
        "btl_size": cfg.btl_size, "seed": cfg.seed,
        "input_size": cfg.input_size, "batch_size": args.batch_size,
        "compute_dtype": args.compute_dtype, "nap_quant": args.nap_quant,
        "guard_tol": args.guard_tol, "guard_rel_err": guard_rel,
        "shape_schema": ("window ops: input_shape=[N,D]; sensor ops: "
                         "sensor_input_shapes="
                         "[[N,3,H,W],[N,1,H,W],[N,1],[N,1,13]]"),
        "artifacts": {},
    }

    for op in ops:
        path = os.path.join(args.out_dir, f"{op}_b{args.batch_size}.stablehlo")
        if op == "base":
            blob = export_base_scorer(serving, args.batch_size,
                                      cfg.input_size, path=path)
            live = serving.score_fused
            arg = probe
        elif op == "nap_windows":
            blob = export_nap_window_scorer(serving, args.batch_size,
                                            cfg.input_size, path=path)
            live = serving.score_nap_windows
            arg = probe
        elif op == "nap":  # concat-diff scorer
            blob = export_nap_scorer(serving, args.batch_size, cat_size,
                                     path=path)
            live = serving.score_nap
            arg = np.random.default_rng(cfg.seed + 1).normal(
                0, 1, (args.batch_size, cat_size)).astype(np.float32)
        else:  # base_sensor | nap_sensor: ingestion-native payloads
            kind = op.split("_")[0]
            blob = export_sensor_scorer(serving, args.batch_size,
                                        op=kind, h=args.sensor_h,
                                        w=args.sensor_w, path=path)
            live = (serving.score_sensor if kind == "base"
                    else serving.score_nap_sensor)
            srng = np.random.default_rng(cfg.seed + 2)
            hw = (args.sensor_h, args.sensor_w)
            arg = (srng.integers(0, 256, (args.batch_size, 3, *hw),
                                 dtype=np.uint8),
                   srng.integers(0, 256, (args.batch_size, 1, *hw),
                                 dtype=np.uint8),
                   srng.uniform(0, 400, (args.batch_size, 1)
                                ).astype(np.float32),
                   srng.uniform(-30, 30, (args.batch_size, 1, 13)
                                ).astype(np.float32))
        # per-artifact precision provenance: every exporter ships the
        # bundle's own path (int8 whitening / bf16 / exact fp32), so these
        # mirror the global flags — recorded per entry so a consumer of a
        # single blob doesn't have to infer them
        # schema: window ops carry `input_shape` = [N, D]; sensor ops carry
        # `sensor_input_shapes` = [[N,3,H,W],[N,1,H,W],[N,1],[N,1,13]].
        # Distinct keys so a consumer reading input_shape[1] as the feature
        # dim can never silently misparse a sensor entry.
        entry = {"path": os.path.basename(path), "bytes": len(blob),
                 "compute_dtype": args.compute_dtype,
                 "nap_quant": (args.nap_quant
                               if not op.startswith("base") else None)}
        if isinstance(arg, tuple):
            entry["sensor_input_shapes"] = [list(a.shape) for a in arg]
        else:
            entry["input_shape"] = [args.batch_size, int(arg.shape[1])]
        if args.verify:
            scorer = load_scorer(path)
            a = arg if isinstance(arg, tuple) else (arg,)
            got = np.asarray(scorer(*a))
            want = np.asarray(live(*a))
            # the accuracy guards' metric (ops/serving.py
            # nap_accuracy_guard): mean relative score error
            rel = float(np.mean(np.abs(got - want)
                                / (np.abs(want) + 1e-6)))
            if not np.isfinite(got).all() or rel > args.verify_tol:
                raise SystemExit(
                    f"{op}: deserialized artifact diverges from the "
                    f"live bundle (mean rel {rel:.3e} > "
                    f"{args.verify_tol})")
            entry["verify_mean_rel_vs_live"] = rel
        manifest["artifacts"][op] = entry
        print(f"exported {op}: {path} ({len(blob)} bytes)")

    mpath = os.path.join(args.out_dir, "manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"manifest: {mpath}")


if __name__ == "__main__":
    main()
