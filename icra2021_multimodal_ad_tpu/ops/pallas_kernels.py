"""Pallas TPU kernels for the hot scoring path.

`nap_score_pallas`: fused NAP scoring
    score_b = mean_j( ((x_b - rot_mu) @ V)_j - std_mu_j )^2 / var_j )

The XLA path (ops/scoring.py nap_score_device) materializes the rotated
(B, J) matrix in HBM between the rotation matmul and the standardize+reduce.
This kernel keeps each (TB, TJ) product tile in VMEM, applies the
standardizer epilogue in-register, and accumulates the per-row sum across
J tiles in the revisited output block — the only HBM traffic is x, V, and
the (B,) scores.

Algebraic fold: (x - rot_mu) @ V - std_mu  ==  x @ V - offset, with
offset = rot_mu @ V + std_mu precomputed once at fit time, so the kernel is
a single matmul with a scale-shift-square-reduce epilogue.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icra2021_multimodal_ad_tpu.models.layers import LEAKY_SLOPE
from icra2021_multimodal_ad_tpu.ops.scoring import NapStats


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nap_kernel(x_ref, v_ref, offset_ref, inv_std_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # fp32 operands take HIGHEST (default-precision fp32 would decompose to
    # single-pass bf16 and the (rot - offset) subtraction is cancellation-
    # sensitive); bf16 operands must NOT request the fp32 contract —
    # Mosaic rejects contract_precision<fp32> with a bf16 lhs ("Bad lhs
    # type" at AOT compile), and the native single-pass MXU route with an
    # fp32 accumulator is exactly the bf16 configuration we want.
    prec = (jax.lax.Precision.HIGHEST
            if x_ref.dtype == jnp.float32 else None)
    rot = jnp.dot(x_ref[:], v_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
    t = (rot - offset_ref[:]) * inv_std_ref[:]
    out_ref[:] += jnp.sum(t * t, axis=1, keepdims=True)


def _interpret() -> bool:
    # run in the Pallas interpreter off-TPU (CPU test mesh)
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("tb", "tj"))
def _nap_score_padded(x_p, v_p, offset_p, inv_std_p, tb: int, tj: int):
    bp, kp = x_p.shape
    jp = v_p.shape[1]
    grid = (bp // tb, jp // tj)
    out = pl.pallas_call(
        _nap_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * kp * jp,
            bytes_accessed=(bp * kp + kp * jp) * x_p.dtype.itemsize + bp * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_p, v_p, offset_p, inv_std_p)
    return out[:, 0]


def nap_precompute(stats: NapStats):
    """Fold the two means into one offset; precompute 1/std with the padded-
    column convention (inv_std = 0 kills padded lanes)."""
    offset = (
        jnp.dot(stats.rotater.mu, stats.rotater.v,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + stats.standardizer.mu
    )
    inv_std = 1.0 / jnp.sqrt(stats.standardizer.var)
    return offset, inv_std


class NapPallasPack(NamedTuple):
    """Padded, cast kernel operands built once at fit/deploy time — the
    per-call path then only pads x.  Without this, every scoring call pays
    an eager O(K*J) pad+cast of the rotation matrix (tens of MB per
    streaming tick at canonical scale)."""

    v_p: jax.Array        # (Kp, Jp) padded rotation, kernel dtype
    offset_p: jax.Array   # (1, Jp) fp32
    inv_std_p: jax.Array  # (1, Jp) fp32, 0 on padded lanes
    k: int                # real diff dim
    j: int                # real rotated dim


def nap_pallas_pack(stats: NapStats, dtype=jnp.float32, tj: int = 256,
                    precomputed=None) -> NapPallasPack:
    """Build the padded kernel operands for nap_score_pallas."""
    offset, inv_std = (precomputed if precomputed is not None
                       else nap_precompute(stats))
    v = stats.rotater.v
    k, j = v.shape
    kp = _round_up(k, 256)
    jp = _round_up(j, tj)
    v_p = jnp.zeros((kp, jp), dtype).at[:k, :j].set(v.astype(dtype))
    offset_p = jnp.zeros((1, jp), jnp.float32).at[0, :j].set(offset)
    inv_std_p = jnp.zeros((1, jp), jnp.float32).at[0, :j].set(inv_std)
    return NapPallasPack(v_p, offset_p, inv_std_p, k, j)


#: scoped-VMEM budget for one grid step's blocks.  The hardware limit is
#: 16 MB; Mosaic double-buffers each input block, so the fit model is
#: 2*(x_block + v_block) + rot/out scratch.  14 MB keeps the measured-fast
#: canonical bf16 tiling (tb=tj=256 at K=5504: ~11.6 MB) untouched while
#: shrinking tiles for shapes that would OOM — an fp32 K=3584 pack hit
#: "Scoped allocation with size 21.10M and limit 16.00M" on v5e before
#: this existed (exposed by the live deploy guard, which builds the fp32
#: comparison bundle through this kernel).
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


#: Mosaic's real fp32 footprint runs well above the block-size model: the
#: motivating fp32 K=3584 (256,256) shape models at ~14.25 MB but Mosaic
#: reported 21.10 MB (~1.5x).  The gap does NOT show for bf16 (the measured
#: -fast canonical bf16 (256,256) tiling models ~11.6 MB and compiles fine,
#: which a universal 1.5x would forbid), so the factor applies to fp32
#: operands only.  _retry_shrink below is the backstop for shapes the model
#: still gets wrong.
_FP32_VMEM_MODEL_FACTOR = 1.5


def _fit_tiles(kp: int, jp: int, itemsize: int, tb: int, tj: int):
    """Largest (tb, tj) at or below the requested tiles whose per-step VMEM
    footprint fits the budget.  tj halves first (the V block is the shared
    cost across the batch grid), then tb; both stop at the 128-lane /
    8-sublane hardware granularity."""
    factor = _FP32_VMEM_MODEL_FACTOR if itemsize >= 4 else 1.0

    def cost(tb_, tj_):
        return factor * (
            2 * (tb_ * kp + kp * tj_) * itemsize  # double-buffered ins
            + tb_ * tj_ * 4 + tb_ * 4 + 2 * tj_ * 4)  # rot/out/eps
    while cost(tb, tj) > _VMEM_BUDGET_BYTES and tj > 128 and jp % (tj // 2) == 0:
        tj //= 2
    while cost(tb, tj) > _VMEM_BUDGET_BYTES and tb > 8:
        tb //= 2
    return tb, tj


def _shrink_tiles(jp: int, tb: int, tj: int):
    """One halving step (tj first, then tb) for the VMEM-OOM retry path;
    returns the same tiles when already at the hardware minimum."""
    if tj > 128 and jp % (tj // 2) == 0:
        return tb, tj // 2
    if tb > 8:
        return tb // 2, tj
    return tb, tj


def _is_vmem_oom(err: Exception) -> bool:
    """Only VMEM/scoped-allocation overflows are retryable by tile
    shrinking.  A generic RESOURCE_EXHAUSTED (an HBM OOM from a too-large
    x_p/v_p) must NOT match: smaller tiles cannot shrink operands already
    materialized in HBM, and each futile retry recompiles (20-120 s over
    the tunnel) before the real error finally surfaces."""
    msg = str(err).lower()
    return "scoped allocation" in msg or "vmem" in msg


def nap_score_pallas(stats: NapStats, x: jax.Array,
                     tb: int = 256, tj: int = 256,
                     dtype=jnp.float32,
                     precomputed=None) -> jax.Array:
    """Fused NAP score of (B, K) concat diffs -> (B,) scores.

    `dtype=jnp.bfloat16` streams x and V at half bandwidth (MXU accumulates
    fp32); scores stay fp32.  `precomputed` amortizes per-call setup:
    pass `nap_pallas_pack(stats, ...)` (full amortization — the hot-path
    form) or `nap_precompute(stats)` (means folded, V still padded per
    call).  `tb`/`tj` are UPPER bounds — the kernel shrinks them when the
    (K-unrolled) blocks would exceed the v5e scoped-VMEM limit (see
    _VMEM_BUDGET_BYTES).
    """
    if isinstance(precomputed, NapPallasPack):
        pack = precomputed
        dtype = pack.v_p.dtype  # the pack's dtype governs the kernel
    else:
        pack = nap_pallas_pack(stats, dtype=dtype, tj=tj,
                               precomputed=precomputed)
    b, k = x.shape
    if k != pack.k:
        raise ValueError(f"x has {k} diff dims, stats were fit on {pack.k}")
    kp, jp = pack.v_p.shape
    tb, tj = _fit_tiles(kp, jp, jnp.dtype(dtype).itemsize, tb, tj)
    bp = _round_up(b, tb)
    x_p = jnp.zeros((bp, kp), dtype).at[:b, :k].set(x.astype(dtype))
    if jp % tj != 0:
        raise ValueError(f"pack was built with an incompatible tj "
                         f"(jp={jp} not divisible by {tj})")
    # _fit_tiles is a model, not Mosaic's real allocator — when a shape it
    # accepted still trips the 16 MB scoped-VMEM limit at compile, halve
    # the tiles and recompile instead of crashing the caller.  tb only ever
    # halves, so bp stays divisible and x_p needs no rebuild.
    while True:
        try:
            scores = _nap_score_padded(x_p, pack.v_p, pack.offset_p,
                                       pack.inv_std_p, tb, tj)
            break
        except Exception as e:  # noqa: BLE001 — inspect, re-raise non-OOM
            if not _is_vmem_oom(e):
                raise
            ntb, ntj = _shrink_tiles(jp, tb, tj)
            if (ntb, ntj) == (tb, tj):
                raise
            tb, tj = ntb, ntj
    return scores[:b] / pack.j


def nap_score_pallas_check(stats: NapStats, x: jax.Array,
                           rtol: float = 1e-3) -> bool:
    """Self-check against the XLA reference path (used by tests/bench)."""
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device

    ours = np.asarray(nap_score_pallas(stats, x))
    ref = np.asarray(nap_score_device(stats, x))
    return bool(np.allclose(ours, ref, rtol=rtol, atol=1e-5))


# ---------------------------------------------------------------------------
# Fused MLP forward: a whole FC module (all layers) in one kernel
# ---------------------------------------------------------------------------


def _round128(x: int) -> int:
    return _round_up(x, 128)


def _make_mlp_kernel(acts):
    """Kernel over one batch tile: static python loop over layers, each
    matmul accumulating fp32 with bias + leaky + folded BN affine applied
    in-register; the activation is cast back to the operand dtype and NEVER
    leaves VMEM between layers — the HBM inter-layer round trips of the
    layer-by-layer forward disappear.

    MEASUREMENT (TPU v5e, canonical 16384 x 1728 AE, bf16): this kernel runs
    2.34 ms at tb=256 (the largest tile that fits VMEM with a whole module's
    weights resident — tb>=512 exceeds ~16 MB and fails to compile), while
    XLA's own pipeline for serving_ae_forward measured 1.94 ms in the same
    session.  XLA wins at this shape because it can pipeline weight fetches
    against much larger batch tiles; the fused kernel is kept (correctness-
    tested against the serving forward to ~2e-5) for regimes where
    weight-resident execution pays — smaller modules, many small-batch
    streaming calls — and as the packed-affine reference implementation."""
    n_layers = len(acts)

    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[-1]
        # same dtype dispatch as _nap_kernel: fp32 operands need HIGHEST
        # (Mosaic default-precision fp32 decomposes to single-pass bf16);
        # bf16 operands must not request the fp32 contract
        prec = (jax.lax.Precision.HIGHEST
                if x_ref.dtype == jnp.float32 else None)
        y = x_ref[:]
        for l in range(n_layers):
            w = refs[1 + 4 * l][:]
            b = refs[2 + 4 * l][:]
            s = refs[3 + 4 * l][:]
            t = refs[4 + 4 * l][:]
            acc = jnp.dot(y, w, preferred_element_type=jnp.float32,
                          precision=prec)
            acc = acc + b
            if acts[l]:
                acc = jnp.where(acc >= 0, acc, LEAKY_SLOPE * acc)
            acc = acc * s + t
            y = acc.astype(x_ref.dtype)
        out_ref[:] = y

    return kernel


def pack_module_layers(spec, params_mod, state_mod, dtype=jnp.bfloat16):
    """Pad one FC module's layers to 128-multiples and fold the eval-mode BN
    into a per-lane affine (scale, shift).  Padded lanes carry w=b=0 and
    scale=shift=0, so they stay exactly zero through leaky + affine and
    contribute nothing to the next matmul."""
    from icra2021_multimodal_ad_tpu.models.layers import BN_EPS

    layers = []
    acts = []
    for lspec, p, s in zip(spec.layers, params_mod, state_mod):
        if lspec.act not in (None, "leakyrelu"):
            raise NotImplementedError(
                f"fused MLP kernel only implements leakyrelu/identity "
                f"activations, got {lspec.act!r} — use the layer-by-layer "
                f"forward for other registry activations"
            )
        din, dout = p["w"].shape
        dinp, doutp = _round128(din), _round128(dout)
        w = jnp.zeros((dinp, doutp), dtype).at[:din, :dout].set(
            p["w"].astype(dtype))
        b = jnp.zeros((1, doutp), jnp.float32).at[0, :dout].set(
            p["b"].astype(jnp.float32))
        if lspec.bn:
            inv = 1.0 / jnp.sqrt(s["bn_var"] + BN_EPS)
            scale_r = p["bn_scale"].astype(jnp.float32) * inv
            shift_r = (p["bn_bias"].astype(jnp.float32)
                       - s["bn_mean"] * scale_r)
        else:
            scale_r = jnp.ones((dout,), jnp.float32)
            shift_r = jnp.zeros((dout,), jnp.float32)
        scale = jnp.zeros((1, doutp), jnp.float32).at[0, :dout].set(scale_r)
        shift = jnp.zeros((1, doutp), jnp.float32).at[0, :dout].set(shift_r)
        layers.append((w, b, scale, shift))
        acts.append(lspec.act is not None)
    return layers, acts


@partial(jax.jit, static_argnames=("acts", "tb", "out_dim"))
def _mlp_padded(x_p, flat_layers, acts, tb: int, out_dim: int):
    bp, d0p = x_p.shape
    kernel = _make_mlp_kernel(acts)
    in_specs = [pl.BlockSpec((tb, d0p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for arr in flat_layers:
        in_specs.append(
            pl.BlockSpec(arr.shape,
                         lambda i, _n=len(arr.shape): (0,) * _n,
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, out_dim), x_p.dtype),
        interpret=_interpret(),
    )(x_p, *flat_layers)
    return out


def fused_module_forward(layers, acts, x, tb: int = 256) -> jax.Array:
    """Apply one packed FC module (from pack_module_layers) to (B, Din)
    inputs; returns (B, Dout_padded) — callers slice the real lanes."""
    b, din = x.shape
    dinp = layers[0][0].shape[0]
    bp = _round_up(max(b, tb), tb)
    x_p = jnp.zeros((bp, dinp), x.dtype).at[:b, :din].set(x)
    flat = tuple(arr for layer in layers for arr in layer)
    out = _mlp_padded(x_p, flat, tuple(acts), tb, layers[-1][0].shape[1])
    return out[:b]
