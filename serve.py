#!/usr/bin/env python
"""Scoring service — serve a trained checkpoint's BASE/SAP/NAP window
scorers over a socket from one resident TPU process.

    python serve.py --saved_name datasets/All_100 \
        --train_diffs datasets/All_train_diffs --port 8787 \
        --compute_dtype bfloat16 --nap_quant int8 --guard_tol 0.05

Clients send fused (n, input_size) float32 windows and get (n,) float32
scores back (ops/score_server.ScoreClient, or any language speaking the
~30-line frame protocol).  The deployment capability the reference never
had: its realtime tester re-loaded the model in-process per robot host
(test_file/realtime_tester.py:278-281); here the model loads and compiles
once, and every robot-side client shares the chip.

With --guard_tol, the server refuses to come up unless the low-precision
configuration's scores agree with exact fp32 on a probe batch (the same
ops/serving accuracy guards the eval CLIs wire; probe = synthetic windows,
or --guard_fixture <csv> for a real caltime-style batch).
"""

import argparse

import numpy as np

from icra2021_multimodal_ad_tpu.config import (
    Config,
    get_input_size,
    reconcile_model_config,
)
from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder
from icra2021_multimodal_ad_tpu.ops.score_server import ScoreServer
from icra2021_multimodal_ad_tpu.ops.scoring import load_nap_stats
from icra2021_multimodal_ad_tpu.utils.checkpoint import load_checkpoint, to_device


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    p = argparse.ArgumentParser()
    p.add_argument("--saved_name", type=str, default="datasets/All_100")
    p.add_argument("--train_diffs", type=str, default=None,
                   help="persisted NAP stats; omit to serve BASE/SAP only")
    p.add_argument("--sensor", type=str, default="All")
    p.add_argument("--n_layers", type=int, default=5)
    p.add_argument("--btl_size", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=16384,
                   help="request rows above this score in chunks; bucketed "
                        "padding bounds compiles at O(log max_batch)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--nap_quant", type=str, default=None, choices=["int8"])
    p.add_argument("--guard_tol", type=float, default=None,
                   help="refuse to serve unless the low-precision scores "
                        "agree with fp32 within this relative tolerance "
                        "on a probe batch")
    p.add_argument("--guard_fixture", type=str, default=None,
                   help="caltime-style CSV to build the guard probe batch "
                        "from (default: synthetic windows)")
    p.add_argument("--warmup", type=int, default=1,
                   help="pre-compile the scorers on a max_batch probe "
                        "before binding (0 = compile lazily per bucket)")
    p.add_argument("--batching", type=int, default=1,
                   help="dynamic batching: coalesce concurrent same-op "
                        "requests into one device dispatch (0 = score "
                        "each request individually)")
    args = p.parse_args()
    if (args.guard_tol is not None and args.compute_dtype == "float32"
            and not args.nap_quant):
        p.error("--guard_tol guards the low-precision serving path; pass "
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
    model = build_autoencoder(cfg)
    params, state = to_device(params), to_device(state)
    stats = load_nap_stats(cfg.train_diffs) if args.train_diffs else None

    server = ScoreServer(cfg, model, params, state, nap_stats=stats,
                         max_batch=args.max_batch, host=args.host,
                         batching=bool(args.batching))

    if args.guard_tol is not None:
        if args.guard_fixture:
            import pandas as pd

            from icra2021_multimodal_ad_tpu.data.fixture import (
                fixture_to_features,
            )

            probe = np.asarray(
                fixture_to_features(pd.read_csv(args.guard_fixture), cfg))
        else:
            probe = np.random.default_rng(cfg.seed).normal(
                0, 1, (256, cfg.input_size)).astype(np.float32)
        rel = server.serve_guard(probe, args.guard_tol)
        print(f"serving guard: rel err {rel:.4f} <= tol {args.guard_tol}"
              if rel is not None else
              "serving guard: exact fp32 bundle, nothing to guard")

    if args.warmup:
        ops = server.warmup()
        print(f"warmed {len(ops)} scorers at buckets 1 and "
              f"{args.max_batch}")

    port = server.start(args.port)
    print(f"serving on {args.host}:{port}  "
          f"(ops: {', '.join(server.info()['ops'])}; "
          f"input_size={cfg.input_size})", flush=True)
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        print("shutting down")
        server.stop()


if __name__ == "__main__":
    main()
