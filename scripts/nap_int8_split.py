#!/usr/bin/env python
"""Stage split of int8 NAP serving (r2 verdict next#3): where do the
1.6 ms/iter at Bn=4096 go, and can the quantize epilogue be fused away?

BENCH_r02: rapp_nap_int8_windows_per_sec = 2.57 M = 49% of the int8 peak
(+27% over bf16), while the whitening GEMM alone measured 90% of peak.
Roofline model of the gap (B=4096, K=5482, J8~4970, JT=512):
  extraction (bf16 mixed-precision diffs)        ~0.40 ms
  quantize epilogue (y=x/sk, rowmax, round)      ~0.44 ms  <- 4 passes over
                                                    the (B,K) fp32 cat
  int8 GEMM + fp32 epilogue                      ~0.63 ms
  bf16 tail matmul                               ~0.14 ms
This probe measures each stage with the bench fori_loop harness, plus two
epilogue variants:
  * quantize from a BF16 cat (halves the epilogue traffic; int8
    granularity dwarfs bf16 rounding except near the rowmax boundary)
  * rowmax computed per-layer DURING extraction (fuses the reduce into
    the diff producers -> the quantize pass reads the cat exactly once)

Run on the TPU (never concurrently with the CPU pytest suite):
    python scripts/nap_int8_split.py [--batch 4096] [--iters 64]
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
from icra2021_multimodal_ad_tpu.ops.pallas_kernels import nap_precompute
from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
from icra2021_multimodal_ad_tpu.ops.scoring import (
    nap_effective_stats,
    nap_fit,
)
from icra2021_multimodal_ad_tpu.ops.serving import (
    NAP_VAR_FLOOR_REL_BF16,
    _nap_score_int8_xla,
    cast_floats,
    nap_int8_pack,
    serving_diffs_batch,
)
from icra2021_multimodal_ad_tpu.utils.compile_cache import (
    enable_persistent_cache,
)
from icra2021_multimodal_ad_tpu.utils.profiling import retry, timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fp = fusion_init(jax.random.PRNGKey(0))
    p16 = cast_floats(params, jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(0)
    raw = {
        "r": jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.float32),
        "d": jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.float32),
        "t": jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.float32),
        "m": jnp.asarray(rng.uniform(-1, 1, (B, 1, 13)), jnp.float32),
    }
    x_all = fuse(fp, sensor="All", **raw)
    x16 = x_all.astype(jnp.bfloat16)
    diffs = diffs_batch(model, params, state, x_all)
    stats = nap_effective_stats(nap_fit(jnp.concatenate(diffs, axis=-1)),
                                NAP_VAR_FLOOR_REL_BF16)
    pre = nap_precompute(stats)
    pack = nap_int8_pack(stats, precomputed=pre)

    cat32 = jnp.concatenate(
        serving_diffs_batch(model, p16, state, x16), axis=-1)
    cat_bf = cat32.astype(jnp.bfloat16)
    # fixed quantized operands for the GEMM-only stage
    y0 = cat32 / pack.sk
    rm0 = jnp.max(jnp.abs(y0), axis=1, keepdims=True)
    sx0 = jnp.where(rm0 > 0, rm0 / 127.0, 1.0)
    x8_0 = jnp.round(y0 / sx0).astype(jnp.int8)

    out = {"batch": B, "device": str(jax.devices()[0]),
           "k": int(pack.k), "j": int(pack.j),
           "j_int8": int(pack.v8.shape[1]),
           "j_bf16_tail": int(pack.v16.shape[1]) if pack.v16 is not None
           else 0}

    def report(name, t):
        out[name] = {"ms_per_iter": round(t * 1e3, 3),
                     "windows_per_sec": round(B / t, 1)}
        print(f"{name:26s} {t * 1e3:8.3f} ms/iter  {B / t:12.1f} w/s",
              flush=True)

    bf16_eps = lambda i, acc: (i.astype(jnp.float32) * 1e-9  # noqa: E731
                               + acc * 0).astype(jnp.bfloat16)

    # -- stage: diff extraction only -----------------------------------------
    def make_extract():
        def body(i, acc):
            dfs = serving_diffs_batch(model, p16, state, x16 + bf16_eps(i, acc))
            return acc + sum(jnp.sum(d) for d in dfs)
        return body

    report("extract_only", retry(lambda: timed_loop(make_extract,
                                                    n_iters=args.iters)))

    # -- stage: quantize epilogue only (fp32 cat) ----------------------------
    def make_quant32():
        def body(i, acc):
            x = cat32 + (i.astype(jnp.float32) * 1e-9 + acc * 0)
            y = x / pack.sk
            rm = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            sx = jnp.where(rm > 0, rm / 127.0, 1.0)
            x8 = jnp.round(y / sx).astype(jnp.int8)
            return acc + jnp.sum(x8.astype(jnp.float32)) + jnp.sum(sx)
        return body

    report("quantize_fp32cat", retry(lambda: timed_loop(make_quant32,
                                                        n_iters=args.iters)))

    # -- variant: quantize from a bf16 cat -----------------------------------
    def make_quant16():
        def body(i, acc):
            x = (cat_bf + bf16_eps(i, acc)).astype(jnp.float32)
            y = x / pack.sk
            rm = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            sx = jnp.where(rm > 0, rm / 127.0, 1.0)
            x8 = jnp.round(y / sx).astype(jnp.int8)
            return acc + jnp.sum(x8.astype(jnp.float32)) + jnp.sum(sx)
        return body

    report("quantize_bf16cat", retry(lambda: timed_loop(make_quant16,
                                                        n_iters=args.iters)))

    # -- stage: int8 GEMM + fp32 epilogue on pre-quantized operands ----------
    def make_gemm8():
        def body(i, acc):
            x8 = jnp.bitwise_xor(x8_0, ((i % 2).astype(jnp.int8)
                                        + jnp.int8(acc * 0)))
            rot = jax.lax.dot_general(
                x8, pack.v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sx0 * pack.sv
            t = (rot - pack.offset) * pack.inv_std
            return acc + jnp.sum(jnp.sum(t * t, axis=-1))
        return body

    report("int8_gemm_epilogue", retry(lambda: timed_loop(make_gemm8,
                                                          n_iters=args.iters)))

    # -- stage: bf16 tail matmul ---------------------------------------------
    if pack.v16 is not None:
        def make_tail():
            def body(i, acc):
                x = cat_bf + bf16_eps(i, acc)
                rot16 = jnp.dot(x, pack.v16,
                                preferred_element_type=jnp.float32)
                t16 = (rot16 - pack.offset16) * pack.inv_std16
                return acc + jnp.sum(jnp.sum(t16 * t16, axis=-1))
            return body

        report("bf16_tail_matmul", retry(lambda: timed_loop(
            make_tail, n_iters=args.iters)))

    # -- full current path ----------------------------------------------------
    @jax.jit
    def score8(xb):
        dfs = serving_diffs_batch(model, p16, state, xb)
        return _nap_score_int8_xla(pack, jnp.concatenate(dfs, axis=-1))

    def make_full():
        def body(i, acc):
            return acc + jnp.sum(score8(x16 + bf16_eps(i, acc)))
        return body

    report("full_current", retry(lambda: timed_loop(make_full,
                                                    n_iters=args.iters)))

    # -- variant: full path with bf16 cat + fused per-layer rowmax -----------
    # rowmax computed from the per-layer diffs BEFORE concat (fusable into
    # the extraction epilogues); the quantize pass then reads the bf16 cat
    # exactly once.
    @jax.jit
    def score8_fused(xb):
        dfs = serving_diffs_batch(model, p16, state, xb)
        rm = jnp.zeros((xb.shape[0], 1), jnp.float32)
        k = 0
        for d in dfs:
            skl = pack.sk[:, k:k + d.shape[-1]]
            rm = jnp.maximum(rm, jnp.max(jnp.abs(d / skl), axis=1,
                                         keepdims=True))
            k += d.shape[-1]
        sx = jnp.where(rm > 0, rm / 127.0, 1.0)
        cat = jnp.concatenate([d.astype(jnp.bfloat16) for d in dfs], axis=-1)
        y = cat.astype(jnp.float32) / pack.sk
        x8 = jnp.round(y / sx).astype(jnp.int8)
        rot = jax.lax.dot_general(
            x8, pack.v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sx * pack.sv
        t = (rot - pack.offset) * pack.inv_std
        acc = jnp.sum(t * t, axis=-1)
        if pack.v16 is not None:
            rot16 = jnp.dot(cat, pack.v16, preferred_element_type=jnp.float32)
            t16 = (rot16 - pack.offset16) * pack.inv_std16
            acc = acc + jnp.sum(t16 * t16, axis=-1)
        return acc / pack.j

    # NOTE: the x8 above is quantized from the bf16-rounded cat via y;
    # rowmax from the fp32 per-layer diffs (sx is therefore fp32-exact)

    def make_fused():
        def body(i, acc):
            return acc + jnp.sum(score8_fused(x16 + bf16_eps(i, acc)))
        return body

    report("full_fused_rowmax_bf16cat", retry(lambda: timed_loop(
        make_fused, n_iters=args.iters)))

    # numeric agreement of the variant vs the current path and vs fp32
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device

    s_cur = retry(lambda: np.asarray(score8(x16)))
    s_fus = retry(lambda: np.asarray(score8_fused(x16)))
    s_ref = retry(lambda: np.asarray(
        jax.jit(nap_score_device)(stats, cat32)))
    out["fused_vs_current_rel"] = round(float(np.mean(
        np.abs(s_fus - s_cur) / (np.abs(s_cur) + 1e-6))), 6)
    out["current_vs_fp32_rel"] = round(float(np.mean(
        np.abs(s_cur - s_ref) / (np.abs(s_ref) + 1e-6))), 6)
    out["fused_vs_fp32_rel"] = round(float(np.mean(
        np.abs(s_fus - s_ref) / (np.abs(s_ref) + 1e-6))), 6)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
