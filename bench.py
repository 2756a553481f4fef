#!/usr/bin/env python
"""Benchmark harness — run on real TPU hardware.

Headline metric (BASELINE.md north star): fused 4-modality inference
windows/sec/chip — raw sensor windows (RGB 3x32x32, depth 1x32x32, force
scalar, mic 13-MFCC) through the fusion convs + the canonical 1728-5-layer
autoencoder + BASE score, everything in one jitted program.  Target >=
100,000 windows/s/chip; `vs_baseline` = achieved / target.

Prints ONE JSON line:
  {"metric": "fused_inference_windows_per_sec", "value": N,
   "unit": "windows/s/chip", "vs_baseline": N, ...extras}

The compute path is benchmarked in bf16 (MXU-native) after validating score
agreement with the fp32 path; extras record fp32 throughput, RaPP+NAP
scoring throughput, and train-step throughput.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init
from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit, nap_score_device

BASELINE_WINDOWS_PER_SEC = 100_000.0


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _cast(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


def main():
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    B = 16384
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.float32)
    d = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.float32)
    m = jnp.asarray(rng.uniform(-1, 1, (B, 1, 13)), jnp.float32)

    def fused_score(fp, params, state, r, d, t, m):
        x = fuse(fp, sensor="All", r=r, d=d, t=t, m=m)
        x_hat, _ = ae_forward(model, params, state, x, train=False)
        delta = (x_hat - x).astype(jnp.float32)
        return jnp.mean(delta * delta, axis=-1)

    fused32 = jax.jit(fused_score)
    s32 = fused32(fusion_params, params, state, r, d, t, m)

    # bf16 fast path: cast weights + activations; MXU accumulates fp32
    fp16 = _cast(fusion_params, jnp.bfloat16)
    p16 = _cast(params, jnp.bfloat16)
    s16args = (fp16, p16, state, *(a.astype(jnp.bfloat16) for a in (r, d, t, m)))
    s16 = fused32(*s16args)
    rel = float(
        jnp.mean(jnp.abs(s16 - s32) / (jnp.abs(s32) + 1e-6))
    )
    use_bf16 = rel < 5e-2

    t32 = _timeit(fused32, fusion_params, params, state, r, d, t, m)
    tput32 = B / t32
    if use_bf16:
        t16 = _timeit(fused32, *s16args)
        tput16 = B / t16
    else:
        tput16 = tput32

    headline = max(tput16, tput32)

    # RaPP diffs + NAP scoring throughput (the offline eval hot path)
    x = fuse(fusion_params, sensor="All", r=r, d=d, t=t, m=m)
    small = x[:4096]
    diffs = diffs_batch(model, params, state, small)
    stats = nap_fit(jnp.concatenate(diffs, axis=-1))

    def rapp_nap(params, state, xb):
        dfs = diffs_batch(model, params, state, xb)
        return nap_score_device(stats, jnp.concatenate(dfs, axis=-1))

    rapp_fn = jax.jit(rapp_nap)
    t_nap = _timeit(rapp_fn, params, state, small, iters=5)
    nap_tput = small.shape[0] / t_nap

    # train-step throughput
    import optax

    from icra2021_multimodal_ad_tpu.train import train_step

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    xb = x[:7000]

    def step(params, state, opt_state):
        return train_step(model, params, state, opt_state, xb, optimizer)

    p2, st2, o2, _ = step(params, state, opt_state)  # compile
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        p2, st2, o2, loss = step(p2, st2, o2)
    jax.block_until_ready(loss)
    train_tput = 7000 * iters / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fused_inference_windows_per_sec",
        "value": round(headline, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(headline / BASELINE_WINDOWS_PER_SEC, 3),
        "fp32_windows_per_sec": round(tput32, 1),
        "bf16_windows_per_sec": round(tput16, 1),
        "bf16_score_rel_err": round(rel, 5),
        "rapp_nap_windows_per_sec": round(nap_tput, 1),
        "train_windows_per_sec": round(train_tput, 1),
        "batch": B,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
