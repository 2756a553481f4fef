#!/usr/bin/env python
"""Probe (r2 verdict next#2): raw uint8/int16 sensor inputs for the fused
bf16 serving path, normalized ON DEVICE, vs the shipped bf16-input path.

The fused path is HBM-co-limited (hbm_util 0.66 at B=16384, 116 KB/window).
The camera streams are natively uint8 (and the reference's realtime
normalization is a FIXED-RANGE map [0,255] -> [-1,1],
utils/data_loaders.py:703-712, so on-device normalize is exact) — streaming
them as uint8 instead of bf16 halves the image input bytes.  Mic MFCC
frames are float by nature, so "int16 mic" is probed as the 13-dim frame
quantized to int16 against a fixed scale (lossy; reported separately and
NOT part of the exact-normalization claim).

Byte accounting per window (B=16384):
  bf16 inputs : r 6144 + d 2048 + t 2 + m 26      = 8220 B
  raw inputs  : r 3072 + d 1024 + t 2 + m 26      = 4124 B
  whole-path traffic (XLA cost analysis)          = ~116 KB
so the UPPER BOUND on the win is ~3.5% of total traffic — this probe
measures whether any of it is realizable or whether the dtype conversion
costs it back.

Run on the TPU (never concurrently with the CPU pytest suite):
    python scripts/raw_input_probe.py [--batch 16384] [--iters 20]

OUTCOME (r4 reconciliation — do not cite this probe's +9% as current):
this probe once measured +9%, but the upper-bound analysis above was
right to be suspicious: under the bench's single-methodology section
(identical XOR loop perturbation on both paths, bench.py sec_sensor_u8)
the u8 path measures ~8% SLOWER on-chip, reproducibly
(`sensor_u8_vs_bf16_same_loop` ≈ 0.92 across runs).  The +9% did not
replicate; the ingestion path's real win is wire/host->device transfer
bytes.  See ARCHITECTURE.md §6.5.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init
from icra2021_multimodal_ad_tpu.ops.serving import _forward, cast_floats
from icra2021_multimodal_ad_tpu.utils.compile_cache import (
    enable_persistent_cache,
)
from icra2021_multimodal_ad_tpu.utils.profiling import retry, timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fp16 = cast_floats(fusion_init(jax.random.PRNGKey(0)), jnp.bfloat16)
    p16 = cast_floats(params, jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(0)

    # raw sensor payloads at their native dtypes
    r_u8 = jnp.asarray(rng.integers(0, 256, (B, 3, 32, 32)), jnp.uint8)
    d_u8 = jnp.asarray(rng.integers(0, 256, (B, 1, 32, 32)), jnp.uint8)
    t_f = jnp.asarray(rng.uniform(0, 400, (B, 1)), jnp.float32)
    m_f = jnp.asarray(rng.uniform(-30, 30, (B, 1, 13)), jnp.float32)
    # mic int16 variant: fixed-scale quantization of the MFCC frame
    M_SCALE = 32.0 / 32767.0
    m_i16 = jnp.asarray(
        np.clip(np.round(np.asarray(m_f) / M_SCALE), -32767, 32767),
        jnp.int16)

    # the shipped bf16-input layout (normalization already applied on host)
    def norm_host(x, lo, hi):
        return (x.astype(jnp.float32) - lo) / (hi - lo) * 2.0 - 1.0

    r_bf = norm_host(r_u8, 0.0, 255.0).astype(jnp.bfloat16)
    d_bf = norm_host(d_u8, 0.0, 255.0).astype(jnp.bfloat16)
    t_bf = norm_host(t_f, 0.0, 400.0).astype(jnp.bfloat16)
    m_bf = m_f.astype(jnp.bfloat16)

    out = {"batch": B, "device": str(jax.devices()[0])}

    def report(name, t):
        out[name] = {"ms_per_iter": round(t * 1e3, 3),
                     "windows_per_sec": round(B / t, 1)}
        print(f"{name:26s} {t * 1e3:8.3f} ms/iter  {B / t:12.1f} w/s",
              flush=True)

    def score(x):
        xh = _forward(model, p16, state, x)
        delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
        return jnp.sum(jnp.mean(delta * delta, axis=-1))

    # -- baseline: bf16 modality tensors ------------------------------------
    def make_bf16():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            mods = {"r": r_bf + eps, "d": d_bf + eps,
                    "t": t_bf + eps, "m": m_bf + eps}
            return acc + score(fuse(fp16, sensor="All", **mods))
        return body

    report("bf16_inputs", retry(lambda: timed_loop(make_bf16,
                                                   n_iters=args.iters)))

    # -- raw uint8 images + fp32 force/mic, normalize on device -------------
    # the loop dependency perturbs integer inputs by XOR-ing the low bit of
    # the counter in (adding eps to uint8 would change dtype), so the conv
    # stacks cannot be hoisted
    def make_raw():
        def body(i, acc):
            bit = (i % 2).astype(jnp.uint8) + jnp.uint8(acc * 0)
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0)
            r = jnp.bitwise_xor(r_u8, bit)
            d = jnp.bitwise_xor(d_u8, bit)
            # on-device exact fixed-range normalization, bf16 operands out
            rn = (r.astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
                  - jnp.bfloat16(1.0))
            dn = (d.astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
                  - jnp.bfloat16(1.0))
            tn = ((t_f + eps) / 200.0 - 1.0).astype(jnp.bfloat16)
            mn = (m_f + eps).astype(jnp.bfloat16)
            return acc + score(fuse(fp16, sensor="All", r=rn, d=dn,
                                    t=tn, m=mn))
        return body

    report("raw_u8_inputs", retry(lambda: timed_loop(make_raw,
                                                     n_iters=args.iters)))

    # -- raw uint8 images + int16 mic ----------------------------------------
    def make_raw_i16():
        def body(i, acc):
            bit = (i % 2).astype(jnp.uint8) + jnp.uint8(acc * 0)
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0)
            rn = (jnp.bitwise_xor(r_u8, bit).astype(jnp.bfloat16)
                  * jnp.bfloat16(2.0 / 255.0) - jnp.bfloat16(1.0))
            dn = (jnp.bitwise_xor(d_u8, bit).astype(jnp.bfloat16)
                  * jnp.bfloat16(2.0 / 255.0) - jnp.bfloat16(1.0))
            tn = ((t_f + eps) / 200.0 - 1.0).astype(jnp.bfloat16)
            mn = (m_i16.astype(jnp.bfloat16) * jnp.bfloat16(M_SCALE)
                  + eps.astype(jnp.bfloat16))
            return acc + score(fuse(fp16, sensor="All", r=rn, d=dn,
                                    t=tn, m=mn))
        return body

    report("raw_u8_i16_inputs", retry(lambda: timed_loop(make_raw_i16,
                                                         n_iters=args.iters)))

    # -- numeric agreement: on-device normalize vs host normalize -----------
    @jax.jit
    def score_vec(x):
        xh = _forward(model, p16, state, x)
        delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
        return jnp.mean(delta * delta, axis=-1)

    nb = 4096
    x_host = fuse(fp16, sensor="All", r=r_bf[:nb], d=d_bf[:nb],
                  t=t_bf[:nb], m=m_bf[:nb])
    rn = (r_u8[:nb].astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
          - jnp.bfloat16(1.0))
    dn = (d_u8[:nb].astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
          - jnp.bfloat16(1.0))
    tn = ((t_f[:nb]) / 200.0 - 1.0).astype(jnp.bfloat16)
    x_dev = fuse(fp16, sensor="All", r=rn, d=dn, t=tn,
                 m=m_f[:nb].astype(jnp.bfloat16))
    s_h = retry(lambda: score_vec(x_host))
    s_d = retry(lambda: score_vec(x_dev))
    rel = float(jnp.mean(jnp.abs(s_d - s_h) / (jnp.abs(s_h) + 1e-6)))
    out["device_norm_score_rel_err"] = round(rel, 6)
    print(f"device-normalize score rel err vs host-normalized bf16: {rel}",
          flush=True)

    # cost-analysis byte traffic of both programs
    def full_bf16(r, d, t, m):
        return score(fuse(fp16, sensor="All", r=r, d=d, t=t, m=m))

    def full_raw(r, d, t, m):
        rn = (r.astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
              - jnp.bfloat16(1.0))
        dn = (d.astype(jnp.bfloat16) * jnp.bfloat16(2.0 / 255.0)
              - jnp.bfloat16(1.0))
        tn = (t / 200.0 - 1.0).astype(jnp.bfloat16)
        return score(fuse(fp16, sensor="All", r=rn, d=dn, t=tn,
                          m=m.astype(jnp.bfloat16)))

    for name, fn, argsx in (
        ("bf16", full_bf16, (r_bf, d_bf, t_bf, m_bf)),
        ("raw", full_raw, (r_u8, d_u8, t_f, m_f)),
    ):
        try:
            ca = jax.jit(fn).lower(*argsx).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            out[f"bytes_per_window_{name}"] = round(
                float(ca.get("bytes accessed", 0.0)) / B, 0)
        except Exception as e:  # noqa: BLE001 — best effort
            out[f"bytes_per_window_{name}"] = f"err {type(e).__name__}"[:80]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
