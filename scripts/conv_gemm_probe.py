#!/usr/bin/env python
"""Probe: fusion conv stacks as lane-dense GEMMs in (h, w*c) layout.

Hypothesis (ARCHITECTURE.md §6 item 1 follow-up): the fused bf16 path's
116 KB/window HBM traffic is dominated by the conv stage's lane-padded
intermediates — a (B, 16, 16, 16) NCHW conv activation stores its 16-wide
minor dims into 128-lane tiles at ~8x bloat.  Reformulating each conv as a
dense GEMM whose LAST dim is w*c (256 for rgb, 128 for depth — exact lane
multiples) removes the padding entirely:

  rgb  (B,32,32,3)=(B,32,96) --M1(192,256)--> (B,16,256)
       --3x M2dy(256,256) row-shift accumulate--> (B,16,256)
       --M3(512,128)--> (B,8,128) == (B,8,8,16) -> canonical (B,16,8,8)
  depth analogous at half width.

The dense matrices inflate MACs (conv2: 5.3x) but run at full MXU tile
fill instead of the ~7-12% fill of an M=16 conv GEMM, and every
intermediate is unpadded.  This probe (a) verifies the matrices reproduce
_rgb_path/_depth_path exactly in fp32, (b) times the GEMM formulation vs
the lax.conv one on the real chip, bf16, including the full fused path.

RESULT (TPU v5e, B=16384, bf16 — NEGATIVE, recorded in ARCHITECTURE.md §6
item 1; don't retry): numerics are exact (max abs err < 1e-4 fp32), but
the dense formulation LOSES — rgb 2.53 vs 0.95 ms, depth 0.65 vs 0.22 ms,
full fused path 5.63 vs 3.55 ms/iter.  The ~5x MAC inflation turns a
bandwidth-bound 0.95 ms conv into a compute-bound 2.5 ms GEMM chain
(~47 TFLOP/s achieved); padding-free tiles cannot buy back 5x FLOPs.

Run:
  numerics:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                 python scripts/conv_gemm_probe.py --check
  timing:    python scripts/conv_gemm_probe.py [--batch 16384]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_rgb_mats(fp):
    """Dense GEMM matrices for the rgb conv stack (fp32 numpy)."""
    w1, b1 = np.asarray(fp.rgb1["w"], np.float32), np.asarray(fp.rgb1["b"], np.float32)
    w2, b2 = np.asarray(fp.rgb2["w"], np.float32), np.asarray(fp.rgb2["b"], np.float32)
    w3, b3 = np.asarray(fp.rgb3["w"], np.float32), np.asarray(fp.rgb3["b"], np.float32)
    C1, C2 = 3, 16
    # M1: (2*32*3, 16*16) — rows (dy, wi, c), cols (j, co); k2 s2
    M1 = np.zeros((2 * 32 * C1, 16 * C2), np.float32)
    for j in range(16):
        for co in range(C2):
            for dy in range(2):
                for dx in range(2):
                    wi = 2 * j + dx
                    for c in range(C1):
                        M1[dy * 96 + wi * C1 + c, j * C2 + co] = w1[co, c, dy, dx]
    b1r = np.concatenate([b1 for _ in range(16)])  # col = j*C2 + co
    # M2dy: 3 x (16*16, 16*16) — rows (ji, ci), cols (jo, co); k3 s1 p1
    M2 = np.zeros((3, 16 * C2, 16 * C2), np.float32)
    for dy in range(3):
        for jo in range(16):
            for co in range(C2):
                for ji in range(16):
                    dx = ji - jo + 1
                    if 0 <= dx < 3:
                        for ci in range(C2):
                            M2[dy, ji * C2 + ci, jo * C2 + co] = w2[co, ci, dy, dx]
    b2r = np.concatenate([b2 for _ in range(16)])
    # M3: (2*16*16, 8*16) — rows (dy, ji, ci), cols (jo, co); k2 s2
    M3 = np.zeros((2 * 16 * C2, 8 * C2), np.float32)
    for jo in range(8):
        for co in range(C2):
            for dy in range(2):
                for dx in range(2):
                    ji = 2 * jo + dx
                    for ci in range(C2):
                        M3[dy * 256 + ji * C2 + ci, jo * C2 + co] = w3[co, ci, dy, dx]
    b3r = np.concatenate([b3 for _ in range(8)])
    return dict(M1=M1, b1=b1r, M2=M2, b2=b2r, M3=M3, b3=b3r)


def build_depth_mats(fp):
    w1, b1 = np.asarray(fp.dep1["w"], np.float32), np.asarray(fp.dep1["b"], np.float32)
    w2, b2 = np.asarray(fp.dep2["w"], np.float32), np.asarray(fp.dep2["b"], np.float32)
    w3, b3 = np.asarray(fp.dep3["w"], np.float32), np.asarray(fp.dep3["b"], np.float32)
    C = 8
    M1 = np.zeros((2 * 32, 16 * C), np.float32)
    for j in range(16):
        for co in range(C):
            for dy in range(2):
                for dx in range(2):
                    M1[dy * 32 + 2 * j + dx, j * C + co] = w1[co, 0, dy, dx]
    b1r = np.concatenate([b1 for _ in range(16)])
    M2 = np.zeros((3, 16 * C, 16 * C), np.float32)
    for dy in range(3):
        for jo in range(16):
            for co in range(C):
                for ji in range(16):
                    dx = ji - jo + 1
                    if 0 <= dx < 3:
                        for ci in range(C):
                            M2[dy, ji * C + ci, jo * C + co] = w2[co, ci, dy, dx]
    b2r = np.concatenate([b2 for _ in range(16)])
    M3 = np.zeros((2 * 16 * C, 8 * C), np.float32)
    for jo in range(8):
        for co in range(C):
            for dy in range(2):
                for dx in range(2):
                    ji = 2 * jo + dx
                    for ci in range(C):
                        M3[dy * 128 + ji * C + ci, jo * C + co] = w3[co, ci, dy, dx]
    b3r = np.concatenate([b3 for _ in range(8)])
    return dict(M1=M1, b1=b1r, M2=M2, b2=b2r, M3=M3, b3=b3r)


def gemm_stack(x_nhwc_flat, m, h_in=32, h_mid=16, c=16):
    """x (B, h_in, w*c_in) -> (B, 8, 8*c) via the three GEMM layers."""
    import jax
    import jax.numpy as jnp

    B = x_nhwc_flat.shape[0]
    xp = x_nhwc_flat.reshape(B, h_mid, 2 * x_nhwc_flat.shape[2])
    y1 = jax.nn.relu(xp @ m["M1"] + m["b1"])          # (B,16,16c)
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (0, 0)))        # (B,18,16c)
    acc = y1p[:, 0:16] @ m["M2"][0]
    acc = acc + y1p[:, 1:17] @ m["M2"][1]
    acc = acc + y1p[:, 2:18] @ m["M2"][2]
    y2 = jax.nn.relu(acc + m["b2"])                    # (B,16,16c)
    y2p = y2.reshape(B, 8, 2 * y2.shape[2])
    y3 = jax.nn.relu(y2p @ m["M3"] + m["b3"])          # (B,8,8c)
    return y3


def to_canonical(y3, c):
    """(B,8,8c) cols (j,co) -> reference flatten order (co,i,j)."""
    B = y3.shape[0]
    return y3.reshape(B, 8, 8, c).transpose(0, 3, 1, 2).reshape(B, -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="fp32 numerics only")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops import fusion as F

    fp = F.fusion_init(jax.random.PRNGKey(0))
    mr = {k: jnp.asarray(v) for k, v in build_rgb_mats(fp).items()}
    md = {k: jnp.asarray(v) for k, v in build_depth_mats(fp).items()}

    rng = np.random.default_rng(0)
    B = 64 if args.check else args.batch

    if args.check:
        # ---- numerics (fp32; run with JAX_PLATFORMS=cpu — eager dispatch
        # over the axon tunnel is one RTT per op and stalls for minutes) ----
        r = jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.float32)
        d = jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.float32)
        r_flat = jnp.transpose(r, (0, 2, 3, 1)).reshape(B, 32, 96)
        d_flat = jnp.transpose(d, (0, 2, 3, 1)).reshape(B, 32, 32)
        got_r = to_canonical(gemm_stack(r_flat, mr), 16)
        want_r = F._rgb_path(fp, r).reshape(B, -1)
        err_r = float(jnp.max(jnp.abs(got_r - want_r)))
        got_d = to_canonical(gemm_stack(d_flat, md), 8)
        want_d = F._depth_path(fp, d).reshape(B, -1)
        err_d = float(jnp.max(jnp.abs(got_d - want_d)))
        print(f"max abs err  rgb={err_r:.3e}  depth={err_d:.3e}", flush=True)
        assert err_r < 1e-4 and err_d < 1e-4, "GEMM formulation diverges"
        print("numerics OK")
        return

    # ---- timing (bf16, real chip) ----------------------------------------
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.serving import _forward, cast_floats
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    from icra2021_multimodal_ad_tpu.utils.profiling import retry, timed_loop

    enable_persistent_cache()
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    p16 = cast_floats(params, jnp.bfloat16)
    fp16 = cast_floats(fp, jnp.bfloat16)
    mr16 = cast_floats(mr, jnp.bfloat16)
    md16 = cast_floats(md, jnp.bfloat16)

    raw = {
        "r": jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.bfloat16),
        "d": jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.bfloat16),
        "t": jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.bfloat16),
        "m": jnp.asarray(rng.uniform(-1, 1, (B, 1, 13)), jnp.bfloat16),
    }
    # NHWC-major inputs (the natural camera layout; host-side prep is free)
    r_nhwc = jnp.transpose(raw["r"], (0, 2, 3, 1)).reshape(B, 32, 96)
    d_nhwc = jnp.transpose(raw["d"], (0, 2, 3, 1)).reshape(B, 32, 32)

    def report(name, t):
        print(f"{name:26s} {t * 1e3:8.3f} ms/iter  {B / t:12.1f} w/s",
              flush=True)

    def make(fn):
        def mk():
            def body(i, acc):
                eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(jnp.bfloat16)
                return acc + fn(eps)
            return body
        return mk

    # conv stages alone
    report("rgb_conv_lax", retry(lambda: timed_loop(make(
        lambda eps: jnp.sum(F._rgb_path(fp16, raw["r"] + eps).astype(jnp.float32))),
        n_iters=args.iters)))
    report("rgb_conv_gemm", retry(lambda: timed_loop(make(
        lambda eps: jnp.sum(gemm_stack(r_nhwc + eps, mr16).astype(jnp.float32))),
        n_iters=args.iters)))
    report("depth_conv_lax", retry(lambda: timed_loop(make(
        lambda eps: jnp.sum(F._depth_path(fp16, raw["d"] + eps).astype(jnp.float32))),
        n_iters=args.iters)))
    report("depth_conv_gemm", retry(lambda: timed_loop(make(
        lambda eps: jnp.sum(gemm_stack(d_nhwc + eps, md16).astype(jnp.float32))),
        n_iters=args.iters)))

    # full fused path, GEMM frontend (canonical feature order via gather)
    def fused_gemm(eps):
        b = B
        parts = [
            to_canonical(gemm_stack(r_nhwc + eps, mr16), 16),
            to_canonical(gemm_stack(d_nhwc + eps, md16), 8),
            F._force_path(raw["t"] + eps).reshape(b, -1),
            F._mic_path(fp16, raw["m"] + eps).reshape(b, -1),
        ]
        x = jnp.concatenate(parts, axis=1)
        xh = _forward(model, p16, state, x)
        delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
        return jnp.sum(jnp.mean(delta * delta, axis=-1))

    def fused_lax(eps):
        mods = {k: v + eps for k, v in raw.items()}
        x = F.fuse(fp16, sensor="All", **mods)
        xh = _forward(model, p16, state, x)
        delta = xh.astype(jnp.float32) - x.astype(jnp.float32)
        return jnp.sum(jnp.mean(delta * delta, axis=-1))

    report("full_fused_lax", retry(lambda: timed_loop(make(fused_lax),
                                                      n_iters=args.iters)))
    report("full_fused_gemm", retry(lambda: timed_loop(make(fused_gemm),
                                                       n_iters=args.iters)))


if __name__ == "__main__":
    main()
