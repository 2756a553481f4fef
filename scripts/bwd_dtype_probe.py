#!/usr/bin/env python
"""Probe (r3, trainer MFU attribution): do fp32 cotangents in the
mixed-precision backward cost measurable time vs bf16 cotangents?

scripts/train_split.py measured the bf16 train step at B=7000 as
fwd 0.757 ms / fwd+bwd 3.259 ms — the backward is ~2.9x the forward for
~2x the FLOPs.  In `models/layers.fc_layer_apply` the matmul emits fp32
(preferred_element_type) and bias/act/BN stay fp32, so the cotangent
entering BOTH transpose GEMMs (dx = g @ W^T, dW = x^T @ g) is fp32: on
the MXU that is the same single pass (DEFAULT precision truncates fp32
operands to bf16) but 2x the HBM bytes on the (B, K) gradient operand.

This probe times value_and_grad of an AE-shaped GEMM chain + MSE loss
(canonical widths, no BN — isolates the GEMM/cotangent question):
  a) the shipped pattern: bf16 operands, fp32 accumulation, fp32
     elementwise, autodiff as-is (fp32 cotangents)
  b) same forward, but each dot wrapped in a custom_vjp that casts the
     incoming cotangent to bf16 before the transpose GEMMs (dW stays
     fp32 out of the MXU accumulation — the masters are fp32)

Run on the TPU (never concurrently with the CPU pytest suite):
    python scripts/bwd_dtype_probe.py [--batch 7000] [--iters 12]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.utils.compile_cache import (
    enable_persistent_cache,
)
from icra2021_multimodal_ad_tpu.utils.profiling import retry, timed_loop

WIDTHS = [1728, 1402, 1076, 751, 425, 100]  # canonical encoder; mirrored


def _dot16(x16, w32):
    return jnp.dot(x16, w32.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


@jax.custom_vjp
def _dot16_bwd16(x16, w32):
    return _dot16(x16, w32)


def _dot16_bwd16_fwd(x16, w32):
    return _dot16(x16, w32), (x16, w32)


def _dot16_bwd16_bwd(resid, g):
    x16, w32 = resid
    g16 = g.astype(jnp.bfloat16)
    w16 = w32.astype(jnp.bfloat16)
    dx = jnp.dot(g16, w16.T, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    dw = jnp.dot(x16.T, g16, preferred_element_type=jnp.float32)
    return dx, dw


_dot16_bwd16.defvjp(_dot16_bwd16_fwd, _dot16_bwd16_bwd)


def make_loss(dot):
    widths = WIDTHS + WIDTHS[-2::-1]  # encoder + mirrored decoder

    def loss(ws, x16):
        y = x16
        for w in ws:
            y = dot(y, w)
            y = jax.nn.leaky_relu(y)  # fp32 elementwise, like the layer
            y = y.astype(jnp.bfloat16)
        delta = y.astype(jnp.float32) - x16.astype(jnp.float32)
        return jnp.mean(delta * delta)

    return loss, widths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7000)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    _, widths = make_loss(_dot16)
    ws = [jnp.asarray(rng.normal(0, 0.02, (a, b)), jnp.float32)
          for a, b in zip(widths[:-1], widths[1:])]
    x16 = jnp.asarray(rng.normal(0, 1, (args.batch, widths[0])),
                      jnp.bfloat16)

    out = {"batch": args.batch, "device": str(jax.devices()[0])}

    for name, dot in (("fp32_cotangent", _dot16),
                      ("bf16_cotangent", _dot16_bwd16)):
        loss, _ = make_loss(dot)

        def make_body():
            def body(i, acc):
                eps = (i.astype(jnp.float32) * 1e-9
                       + acc * 0).astype(jnp.bfloat16)
                val, grads = jax.value_and_grad(loss)(ws, x16 + eps)
                gsum = sum(jnp.sum(g) for g in grads)
                return acc + val + gsum * 1e-20
            return body

        t = retry(lambda: timed_loop(make_body, n_iters=args.iters))
        out[name] = {"ms_per_iter": round(t * 1e3, 3),
                     "windows_per_sec": round(args.batch / t, 1)}
        print(f"{name:18s} {t * 1e3:8.3f} ms/iter", flush=True)

    # gradient agreement (bf16 cotangents round the grads; report the drift)
    l_a, _ = make_loss(_dot16)
    l_b, _ = make_loss(_dot16_bwd16)
    g_a = retry(lambda: jax.grad(l_a)(ws, x16))
    g_b = retry(lambda: jax.grad(l_b)(ws, x16))
    rels = [float(jnp.mean(jnp.abs(b - a) / (jnp.abs(a) + 1e-8)))
            for a, b in zip(g_a, g_b)]
    out["grad_mean_rel_err"] = round(float(np.mean(rels)), 6)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
