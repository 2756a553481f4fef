#!/usr/bin/env python
"""bf16 trainer stage split (r2 verdict next#4): name where 1 - 0.50 MFU
of the mixed-precision train step goes.

BENCH_r02: mfu_train_bf16 = 0.4992 at B=7000 — the weakest MFU on the
board; scripts/train_probe.py already pinned Adam at ~4% and the conv-GEMM
reformulation as a loss, but the step was never split fwd/bwd/BN the way
perf_split.py splits the fused path.  This probe times, with the bench
fori_loop differencing methodology (every stage's inputs carry the loop
counter so nothing hoists):

  fwd_eval      eval-mode forward + MSE loss (no BN stat update)
  fwd_train     train-mode forward + MSE loss (adds the fp32 batch
                mean/var reductions per BN layer)
  fwd_bwd       value_and_grad of the train-mode loss (grads kept live
                via an axpy epilogue)
  full_step     fwd + bwd + Adam (the production body)

plus a batch-size scaling curve of full_step at 7k/16k/32k with
XLA-cost-analysis FLOPs -> per-point MFU, separating "small-batch GEMM
inefficiency" from "fixed non-matmul overhead".

Run on the TPU (never concurrently with the CPU pytest suite):
    python scripts/train_split.py [--iters 12]
"""

import argparse
import json
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.autoencoder import ae_loss
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.utils.compile_cache import (
    enable_persistent_cache,
)
from icra2021_multimodal_ad_tpu.utils.profiling import retry, timed_loop

V5E_PEAK_BF16 = 197e12


def _flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:  # noqa: BLE001 — best effort
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batches", type=str, default="7000,16384,32768")
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)

    out = {"device": str(jax.devices()[0])}

    def report(name, t, B, fpw=None):
        row = {"ms_per_iter": round(t * 1e3, 3),
               "windows_per_sec": round(B / t, 1)}
        if fpw:
            row["mfu_bf16"] = round((B / t) * fpw / V5E_PEAK_BF16, 4)
            row["flops_per_window"] = round(fpw, 0)
        out[name] = row
        print(f"{name:24s} B={B:6d} {t * 1e3:8.3f} ms/iter "
              f"{B / t:12.1f} w/s"
              + (f"  MFU={row['mfu_bf16']:.3f}" if fpw else ""), flush=True)

    rng = np.random.default_rng(0)

    def batch(B):
        return jnp.asarray(rng.normal(0, 1, (B, cfg.input_size)),
                           jnp.bfloat16)

    B0 = 7000
    x0 = batch(B0)

    # -- stage: forwards ------------------------------------------------------
    def make_fwd(train):
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            loss, new_s = ae_loss(model, params, state, x0 + eps, train=train)
            extra = (sum(jnp.sum(v) for leaf in jax.tree.leaves(new_s)
                         for v in [leaf]) if train else 0.0)
            # the BN stat outputs must stay live or train-mode reductions DCE
            return acc + loss + extra * 1e-20
        return body

    report("fwd_eval", retry(lambda: timed_loop(
        lambda: make_fwd(False), n_iters=args.iters)), B0)
    report("fwd_train", retry(lambda: timed_loop(
        lambda: make_fwd(True), n_iters=args.iters)), B0)

    # -- stage: fwd + bwd -----------------------------------------------------
    def make_vag():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)

            def loss_of(p):
                loss, new_s = ae_loss(model, p, state, x0 + eps, train=True)
                return loss, new_s

            (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return acc + loss + gsum * 1e-20
        return body

    report("fwd_bwd", retry(lambda: timed_loop(make_vag,
                                               n_iters=args.iters)), B0)

    # -- full production step, with the batch scaling curve -------------------
    def step(p, s, o, x):
        def loss_of(pp):
            loss, new_s = ae_loss(model, pp, s, x, train=True)
            return loss, new_s

        (loss, new_s), grads = jax.value_and_grad(loss_of, has_aux=True)(p)
        upd, o2 = optimizer.update(grads, o, p)
        return optax.apply_updates(p, upd), new_s, o2, loss

    @partial(jax.jit, static_argnames=("n",))
    def step_loop(p, s, o, x, n):
        def body(i, carry):
            p, s, o, acc = carry
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            p, s, o, loss = step(p, s, o, x + eps)
            return (p, s, o, acc + loss)
        return jax.lax.fori_loop(0, n, body, (p, s, o, jnp.float32(0)))[3]

    import time

    for B in [int(b) for b in args.batches.split(",")]:
        x = batch(B)
        n = args.iters

        def run(k):
            retry(lambda: float(step_loop(params, state, opt0, x, k)))

        run(1)
        t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
        run(n + 1)
        t0 = time.perf_counter(); run(n + 1); tn = time.perf_counter() - t0
        t = (tn - t1) / n
        fpw = _flops_of(step, params, state, opt0, x)
        report(f"full_step_B{B}", t, B, fpw / B if fpw else None)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
