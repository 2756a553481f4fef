#!/usr/bin/env python
"""Component-split timing of the fused bf16 inference path on the real chip.

Answers "where do the 3.5 ms/iter at B=16384 go?" by timing each stage of
the headline path (fusion convs / AE forward / score reduce) separately with
the same on-device fori_loop methodology as bench.py, plus candidate
optimization variants of the fusion frontend.

Run on the TPU (never concurrently with the CPU pytest suite):
    python scripts/perf_split.py [--batch 16384] [--iters 20]
"""

import argparse
import json
import sys
import time
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
    fp = fusion_init(jax.random.PRNGKey(0))
    B = args.batch
    rng = np.random.default_rng(0)
    raw = {
        "r": jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.bfloat16),
        "d": jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.bfloat16),
        "t": jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.bfloat16),
        "m": jnp.asarray(rng.uniform(-1, 1, (B, 1, 13)), jnp.bfloat16),
    }
    fp16 = cast_floats(fp, jnp.bfloat16)
    p16 = cast_floats(params, jnp.bfloat16)
    x_fused = fuse(fp16, sensor="All", **raw)

    out = {"batch": B, "device": str(jax.devices()[0])}

    def report(name, t):
        out[name] = {"ms_per_iter": round(t * 1e3, 3),
                     "windows_per_sec": round(B / t, 1)}
        print(f"{name:28s} {t * 1e3:8.3f} ms/iter  {B / t:12.1f} w/s",
              flush=True)

    # -- stage: fusion convs only ------------------------------------------
    def make_fuse_only():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            mods = {k: v + eps for k, v in raw.items()}
            x = fuse(fp16, sensor="All", **mods)
            return acc + jnp.sum(x.astype(jnp.float32))
        return body

    report("fuse_only", retry(lambda: timed_loop(make_fuse_only,
                                                 n_iters=args.iters)))

    # -- stage: AE forward + score on pre-fused windows --------------------
    def make_ae_only():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            x = x_fused + eps
            xh = _forward(model, p16, state, x)
            delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
            return acc + jnp.sum(jnp.mean(delta * delta, axis=-1))
        return body

    report("ae_forward_score", retry(lambda: timed_loop(make_ae_only,
                                                        n_iters=args.iters)))

    # -- stage: full fused path (the bench headline loop) ------------------
    def make_full():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            mods = {k: v + eps for k, v in raw.items()}
            x = fuse(fp16, sensor="All", **mods)
            xh = _forward(model, p16, state, x)
            delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
            return acc + jnp.sum(jnp.mean(delta * delta, axis=-1))
        return body

    report("full_fused", retry(lambda: timed_loop(make_full,
                                                  n_iters=args.iters)))

    # -- per-modality conv stacks ------------------------------------------
    from icra2021_multimodal_ad_tpu.ops import fusion as F

    # -- experiment: merged rgb+depth block-diagonal conv stack ------------
    # One conv stack over concat([r, d]) with block-diagonal weights (zeros
    # in the cross blocks -> numerically identical outputs, channel order
    # [rgb16, depth8] = the concat order fuse() needs anyway).
    def _blockdiag2(wa, wb):
        oa, ia = wa.shape[:2]
        ob, ib = wb.shape[:2]
        w = jnp.zeros((oa + ob, ia + ib) + wa.shape[2:], wa.dtype)
        w = w.at[:oa, :ia].set(wa)
        w = w.at[oa:, ia:].set(wb)
        return w

    w1 = _blockdiag2(fp16.rgb1["w"], fp16.dep1["w"])
    b1 = jnp.concatenate([fp16.rgb1["b"], fp16.dep1["b"]])
    w2 = _blockdiag2(fp16.rgb2["w"], fp16.dep2["w"])
    b2 = jnp.concatenate([fp16.rgb2["b"], fp16.dep2["b"]])
    w3 = _blockdiag2(fp16.rgb3["w"], fp16.dep3["w"])
    b3 = jnp.concatenate([fp16.rgb3["b"], fp16.dep3["b"]])

    def merged_rd(r, d):
        x = jnp.concatenate([r, d], axis=1)
        y = jax.nn.relu(F._conv2d(x, w1, b1, 2, 0))
        y = jax.nn.relu(F._conv2d(y, w2, b2, 1, 1))
        return jax.nn.relu(F._conv2d(y, w3, b3, 2, 0))  # (B,24,8,8)

    # correctness vs the separate paths
    ref_r = F._rgb_path(fp16, raw["r"])
    ref_d = F._depth_path(fp16, raw["d"])
    got = merged_rd(raw["r"], raw["d"])
    err_r = float(jnp.max(jnp.abs(got[:, :16].astype(jnp.float32)
                                  - ref_r.astype(jnp.float32))))
    err_d = float(jnp.max(jnp.abs(got[:, 16:].astype(jnp.float32)
                                  - ref_d.astype(jnp.float32))))
    out["merged_rd_max_abs_err"] = {"rgb": err_r, "depth": err_d}
    print(f"merged_rd max abs err: rgb={err_r} depth={err_d}", flush=True)

    def make_merged():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            y = merged_rd(raw["r"] + eps, raw["d"] + eps)
            return acc + jnp.sum(y.astype(jnp.float32))
        return body

    report("merged_rd_path", retry(lambda: timed_loop(make_merged,
                                                      n_iters=args.iters)))

    # full fused path with the merged conv stack standing in for rgb+depth
    def make_full_merged():
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
            b = raw["r"].shape[0]
            y = merged_rd(raw["r"] + eps, raw["d"] + eps)
            parts = [
                y.reshape(b, -1),
                F._force_path(raw["t"] + eps).reshape(b, -1),
                F._mic_path(fp16, raw["m"] + eps).reshape(b, -1),
            ]
            x = jnp.concatenate(parts, axis=1)
            xh = _forward(model, p16, state, x)
            delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
            return acc + jnp.sum(jnp.mean(delta * delta, axis=-1))
        return body

    report("full_fused_merged", retry(lambda: timed_loop(make_full_merged,
                                                         n_iters=args.iters)))

    for name, fn in [
        ("rgb_path", lambda eps: F._rgb_path(fp16, raw["r"] + eps)),
        ("depth_path", lambda eps: F._depth_path(fp16, raw["d"] + eps)),
        ("mic_path", lambda eps: F._mic_path(fp16, raw["m"] + eps)),
    ]:
        def make_mod(fn=fn):
            def body(i, acc):
                eps = (i.astype(jnp.float32) * 1e-9
                       + acc * 0).astype(jnp.bfloat16)
                return acc + jnp.sum(fn(eps).astype(jnp.float32))
            return body
        report(name, retry(lambda: timed_loop(make_mod, n_iters=args.iters)))

    # -- probe: cost-analysis FLOP conventions on this backend -------------
    # bench.py's MFU fields divide measured rates by cost-analysis FLOPs;
    # CPU lowered analysis reports 2MKN for a GEMM, but the numbers bench
    # recorded on the axon backend imply ~half that for the bf16 path.
    # Measure both the lowered and the compiled analysis on a known GEMM.
    M, K, N = 512, 1024, 2048

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    for dt in (jnp.bfloat16, jnp.float32):
        a = jnp.zeros((M, K), dt)
        b = jnp.zeros((K, N), dt)
        low = jax.jit(mm).lower(a, b)
        probe = {"expected_2MKN": 2 * M * K * N}
        try:
            ca = low.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            probe["lowered_flops"] = float(ca.get("flops", -1))
        except Exception as e:  # noqa: BLE001
            probe["lowered_flops"] = f"error: {type(e).__name__}: {e}"[:120]
        try:
            ca = low.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            probe["compiled_flops"] = float(ca.get("flops", -1))
        except Exception as e:  # noqa: BLE001
            probe["compiled_flops"] = f"error: {type(e).__name__}: {e}"[:120]
        out[f"gemm_cost_probe_{jnp.dtype(dt).name}"] = probe
        print(f"gemm cost probe {jnp.dtype(dt).name}: {probe}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
