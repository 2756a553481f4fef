#!/usr/bin/env python
"""Realtime streaming anomaly detection — capability parity with
test_file/realtime_tester.py:260-309, with the robot replaced by a pluggable
sensor source (simulator by default; a ROS bridge can feed the same ring
buffers on a robot host).

    python realtime_tester.py --saved_name datasets/All --ticks 50

Each tick: snapshot the four ring buffers -> MFCC + normalize + fuse ->
score (BASE by default, NAP with --nap + persisted whitening stats) ->
latency print.  The reference's realtime scoring call is broken as shipped
(imports a missing module; SURVEY.md §2) — this implements the intended
behavior.
"""

import argparse

import jax

from icra2021_multimodal_ad_tpu.config import (
    Config,
    get_input_size,
    reconcile_model_config,
)
from icra2021_multimodal_ad_tpu.data.streaming import (
    SimulatedSensors,
    StreamingDetector,
)
from icra2021_multimodal_ad_tpu.models.builder import build_autoencoder
from icra2021_multimodal_ad_tpu.ops.fusion import fusion_init
from icra2021_multimodal_ad_tpu.ops.scoring import load_nap_stats
from icra2021_multimodal_ad_tpu.utils.checkpoint import load_checkpoint, to_device


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--btl_size", type=int, default=100)
    p.add_argument("--n_layers", type=int, default=5)
    p.add_argument("--sensor", type=str, default="All")
    p.add_argument("--saved_name", type=str, default="datasets/All_100")
    p.add_argument("--train_diffs", type=str, default="datasets/All_train_diffs")
    p.add_argument("--ticks", type=int, default=300)
    p.add_argument("--anomaly_after", type=int, default=150,
                   help="simulator injects the drop signature from this tick")
    p.add_argument("--nap", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--live_plot", action="store_true",
                   help="rolling per-tick score plot "
                        "(realtime_tester.py:206-228 live_plotter)")
    p.add_argument("--plot_path", type=str, default=None,
                   help="save the live score plot headlessly to this file")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = the serving fast path for BOTH scorers;"
                        " with --nap it scores against variance-floored "
                        "effective-rank whitening (ops/serving.py), so "
                        "scores can differ from fp32 NAP on degenerate fits")
    p.add_argument("--nap_quant", type=str, default=None,
                   choices=["int8"],
                   help="int8 = NAP whitening matmul on the MXU int8 path "
                        "(2x the bf16 peak; fp32 epilogue, variance-floored "
                        "stats) — deploy-guarded like bfloat16; with "
                        "--compute_dtype float32 the diff extraction stays "
                        "exact and only the whitening is quantized")
    p.add_argument("--pipelined", action="store_true",
                   help="overlap each tick's result fetch with the next "
                        "tick's dispatch (scores print one 0.1 s tick "
                        "late; trace is bit-identical) — roughly halves "
                        "per-tick latency on high-RTT links")
    p.add_argument("--connection_timeout_s", type=float, default=None,
                   help="raise if a sensor queue is silent this long "
                        "(reference default 10 s, realtime_tester.py:52-57)")
    p.add_argument("--guard_tol", type=float, default=None,
                   help="deploy guard: before streaming any low-precision "
                        "(--compute_dtype bfloat16 / --nap_quant int8) "
                        "score, compare it against fp32 on the first live "
                        "ring snapshot and abort above this relative "
                        "tolerance (ops/serving accuracy guards; no-op on "
                        "exact fp32 runs)")
    args = p.parse_args()
    if args.nap_quant and not args.nap:
        p.error("--nap_quant int8 quantizes the NAP whitening matmul; "
                "pass --nap with it (BASE streaming has no NAP stage "
                "to quantize)")

    cfg = Config(
        batch_size=args.batch_size, btl_size=args.btl_size,
        n_layers=args.n_layers, sensor=args.sensor,
        saved_name=args.saved_name, train_diffs=args.train_diffs,
        seed=args.seed, compute_dtype=args.compute_dtype,
        nap_quant=args.nap_quant,
    )
    cfg = cfg.replace(input_size=get_input_size(cfg))

    params, state, meta = load_checkpoint(cfg.saved_name)
    # adopt the checkpoint's model-shape fields (n_layers/btl/distribution/
    # seed/...) so flag mismatches can't crash obscurely or silently fuse
    # with the wrong projection weights
    cfg = reconcile_model_config(cfg, meta)
    model = build_autoencoder(cfg)
    params, state = to_device(params), to_device(state)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    nap_stats = load_nap_stats(cfg.train_diffs) if args.nap else None

    detector = StreamingDetector(cfg, model, params, state, fusion_params,
                                 nap_stats=nap_stats)
    source = SimulatedSensors(cfg.batch_size, seed=cfg.seed)
    source.fill()  # warm the ring buffers

    live = None
    if args.live_plot or args.plot_path:
        from icra2021_multimodal_ad_tpu.utils.plotting import LiveScorePlotter

        live = LiveScorePlotter(window=min(args.ticks, 100),
                                identifier="streaming anomaly score",
                                interactive=bool(args.live_plot))

    def tick_hook(i):
        source.tick(anomaly=i >= args.anomaly_after)

    def on_tick(i, scores):
        print(f"tick {i}: score={scores.mean():.4f} "
              f"lat={detector.latencies_s[-1] * 1e3:.2f} ms")
        if live is not None:
            live.update(scores.mean())

    trace = detector.run(source, n_ticks=args.ticks, nap=args.nap,
                         on_tick=on_tick, tick_hook=tick_hook,
                         connection_timeout_s=args.connection_timeout_s,
                         guard_tol=args.guard_tol,
                         pipelined=args.pipelined)
    stats = detector.latency_stats()
    print("latency:", stats)
    # the anomaly takes one full ring-buffer turnover (batch_size ticks) to
    # dominate every window of a batch; the post-anomaly mean is only
    # meaningful once the run reaches that point
    pre_slice = trace[: min(args.anomaly_after, len(trace))]
    if pre_slice.size == 0:
        # --anomaly_after 0 (or an empty trace): an empty mean would print
        # 'nan' with a NumPy RuntimeWarning instead of saying what happened
        pre_txt = "n/a (no pre-anomaly window)"
    else:
        pre_txt = f"{pre_slice.mean():.4f}"
    settled = args.anomaly_after + cfg.batch_size
    if settled < len(trace):
        print(f"mean score before anomaly: {pre_txt}  "
              f"after: {trace[settled:].mean():.4f}")
    else:
        print(f"mean score (no settled anomaly window in {len(trace)} "
              f"ticks): {pre_txt}")

    if live is not None and args.plot_path:
        print("live plot saved:", live.save(args.plot_path))
    if args.plot:
        from matplotlib import pyplot as plt

        plt.plot(trace.mean(axis=1))
        plt.axvline(args.anomaly_after, color="r", ls="--")
        plt.show()
    return trace, stats


if __name__ == "__main__":
    main()
