"""Explicit bf16 serving path — the throughput configuration.

The train/eval path is fp32 with HIGHEST-precision matmuls because the RaPP
diffs feed the NAP SVD (CLAUDE.md invariant; utils/normalize.py:66 semantics).
Serving doesn't refit anything, so its operands can stream at bf16 (half the
HBM bandwidth, native MXU input dtype) while every matmul still accumulates
fp32 — scores come back fp32.  This module makes that path first-class
instead of a bench-only trick:

    serving = make_serving(cfg, model, params, state, fusion_params,
                           nap_stats=stats)       # cfg.compute_dtype decides
    scores = serving.score_raw(r=..., d=..., t=..., m=...)  # fusion+AE+BASE
    scores = serving.score_nap(x_fused)                     # Pallas kernel

Reference capability anchor: the realtime tester's scoring loop
(test_file/realtime_tester.py:291-309) — the reference ran it in fp32 torch;
the TPU-native serving configuration is bf16 by design (BASELINE.md
throughput target rides on it).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from icra2021_multimodal_ad_tpu.models.autoencoder import AutoEncoder, ae_forward
from icra2021_multimodal_ad_tpu.ops.fusion import FusionParams, fuse
from icra2021_multimodal_ad_tpu.ops.pallas_kernels import (
    nap_pallas_pack,
    nap_precompute,
    nap_score_pallas,
)
from icra2021_multimodal_ad_tpu.ops.scoring import NapStats

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def cast_floats(tree, dtype):
    """Cast only the floating leaves of a pytree."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


class ServingModel(NamedTuple):
    """Pre-cast parameters plus jitted scorers.  Build via make_serving.

    With `mesh` (a 1-D window-axis jax.sharding.Mesh), every scorer shards
    its batch over the mesh — multi-chip serving the reference's
    single-GPU torch loop never had.  Rows are padded to device-count
    divisibility and the padding is sliced off the scores (eval-mode BN has
    no cross-row coupling, so padding cannot perturb real rows).  The NAP
    score then takes the XLA matmul path (nap_score_device), which XLA
    partitions over the mesh; the Pallas kernel stays the single-chip peak
    configuration."""

    model: AutoEncoder
    params: dict
    state: dict
    fusion_params: Optional[FusionParams]
    nap_stats: Optional[NapStats]
    compute_dtype: object
    nap_pre: Optional[tuple] = None  # (offset, inv_std), folded at build
    mesh: Optional[object] = None
    nap_pack: Optional[object] = None  # padded Pallas operands (single-chip)
    nap_v: Optional[jax.Array] = None  # dtype-cast V (mesh XLA path)
    nap_int8: Optional[object] = None  # NapInt8Pack (nap_quant='int8')

    def _shard(self, x: jax.Array):
        """Pad + shard the leading axis; returns (x, n_real_rows)."""
        if self.mesh is None:
            return x, x.shape[0]
        from icra2021_multimodal_ad_tpu.parallel.mesh import (
            pad_to_multiple,
            shard_batch,
        )

        n = x.shape[0]
        xp, _ = pad_to_multiple(x, self.mesh.devices.size)
        return shard_batch(self.mesh, xp), n

    def _shard_edge(self, x: jax.Array):
        """Pad the leading axis by REPLICATING the first row, then shard.

        The sensor-payload scorers normalize the mic frames with a batch-
        GLOBAL min-max (ops/fusion.normalize_mods — the reference's realtime
        norm_vec semantics), so zero-padding would shift the batch min/max
        and perturb REAL rows' scores; replicated real rows cannot."""
        if self.mesh is None:
            return x
        from icra2021_multimodal_ad_tpu.parallel.mesh import shard_batch

        pad = (-x.shape[0]) % self.mesh.devices.size
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
        return shard_batch(self.mesh, x)

    def score_fused(self, x: jax.Array) -> jax.Array:
        """BASE score on already-fused (B, input) windows."""
        x, n = self._shard(x.astype(self.compute_dtype))
        return _score_fused(self.model, self.params, self.state, x)[:n]

    def score_raw(self, **mods) -> jax.Array:
        """Fusion convs + AE forward + BASE score on raw modality tensors
        (r/d/t/m keyword layout of ops/fusion.fuse)."""
        if self.fusion_params is None:
            raise ValueError("score_raw needs fusion_params")
        mods = {k: v.astype(self.compute_dtype) for k, v in mods.items()}
        n = next(iter(mods.values())).shape[0]
        if self.mesh is not None:
            mods = {k: self._shard(v)[0] for k, v in mods.items()}
        return _score_raw(self.model, self.params, self.state,
                          self.fusion_params, tuple(sorted(mods)), mods)[:n]

    def score_nap(self, x_cat: jax.Array) -> jax.Array:
        """Fused NAP score of concat diffs; bf16 streams the matrix at half
        bandwidth, accumulation and score stay fp32.  Single-chip takes the
        Pallas kernel; mesh serving takes the XLA matmul (shardable);
        nap_quant='int8' bundles take the int8 MXU matmul on either."""
        if self.nap_stats is None:
            raise ValueError("score_nap needs nap_stats")
        if self.nap_int8 is not None:
            x_cat, n = self._shard(x_cat)
            return _nap_score_int8_xla(self.nap_int8, x_cat)[:n]
        if self.mesh is not None:
            offset, inv_std = (self.nap_pre if self.nap_pre is not None
                               else nap_precompute(self.nap_stats))
            v = (self.nap_v if self.nap_v is not None
                 else self.nap_stats.rotater.v.astype(self.compute_dtype))
            x_cat, n = self._shard(x_cat.astype(self.compute_dtype))
            prec = (jax.lax.Precision.HIGHEST
                    if self.compute_dtype == jnp.float32 else None)
            return _nap_score_xla(v, offset, inv_std, x_cat, prec)[:n]
        return nap_score_pallas(self.nap_stats, x_cat,
                                dtype=self.compute_dtype,
                                precomputed=(self.nap_pack
                                             if self.nap_pack is not None
                                             else self.nap_pre))

    def nap_diffs(self, x: jax.Array) -> jax.Array:
        """Concat RaPP diffs of fused (B, input) windows at the serving
        precision: bf16 servers take the mixed-precision dual-pathway taps
        (serving_diffs_batch), fp32 servers the exact extraction."""
        from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

        if self.compute_dtype == jnp.float32:
            x, n = self._shard(x.astype(jnp.float32))
            d = diffs_batch(self.model, self.params, self.state, x)
        else:
            x, n = self._shard(x.astype(self.compute_dtype))
            d = serving_diffs_batch(self.model, self.params, self.state, x)
        return jnp.concatenate(d, axis=-1)[:n]

    def score_nap_windows(self, x: jax.Array) -> jax.Array:
        """Full NAP path on fused windows: diff extraction + whitened score,
        end to end at the serving precision (the streaming NAP hot path).

        Single-chip this is ONE jitted program (diffs + concat + whitening
        fused — the _nap_windows_*_one scorers): the former three-dispatch
        composition paid an extra ~7-8 ms of link round trips per call on
        the tunneled chip (r5 probe: NAP round trip 31.7/33.4 ms ->
        24.4/25.6 ms fp32/bf16 at batch 10, parity with BASE).

        Mesh serving keeps the padded sharded concat-diff matrix on device
        between the two stages and slices the scores once — routing through
        nap_diffs + score_nap would slice, re-pad, and re-shard the full
        (B, K) matrix per call."""
        if self.nap_stats is None:
            raise ValueError("score_nap_windows needs nap_stats")
        if self.mesh is None:
            return self._nap_windows_one(x)[0]
        from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

        if self.compute_dtype == jnp.float32:
            xp, n = self._shard(x.astype(jnp.float32))
            d = diffs_batch(self.model, self.params, self.state, xp)
        else:
            xp, n = self._shard(x.astype(self.compute_dtype))
            d = serving_diffs_batch(self.model, self.params, self.state, xp)
        if self.nap_int8 is not None:
            # quantize the fp32 diff taps directly — an intermediate bf16
            # rounding would shift per-row scales and int8 rounding
            # decisions vs the single-device path (measured ~2% score
            # drift), for zero bandwidth benefit (the quantizer reads the
            # taps once either way)
            cat32 = jnp.concatenate(d, axis=-1)
            return _nap_score_int8_xla(self.nap_int8, cat32)[:n]
        cat = jnp.concatenate(d, axis=-1).astype(self.compute_dtype)
        offset, inv_std = (self.nap_pre if self.nap_pre is not None
                           else nap_precompute(self.nap_stats))
        v = (self.nap_v if self.nap_v is not None
             else self.nap_stats.rotater.v.astype(self.compute_dtype))
        prec = (jax.lax.Precision.HIGHEST
                if self.compute_dtype == jnp.float32 else None)
        return _nap_score_xla(v, offset, inv_std, cat, prec)[:n]

    def _nap_windows_one(self, x: jax.Array):
        """Dispatch the single-chip one-program NAP scorer for this
        bundle's precision; returns (scores, base_loss) device arrays
        from the SAME compiled program score_nap_windows returns scores
        from — callers wanting both pay no second forward and see
        bit-identical scores either way."""
        exact = self.compute_dtype == jnp.float32
        xd = x.astype(jnp.float32 if exact else self.compute_dtype)
        if self.nap_int8 is not None:
            return _nap_windows_int8_one(self.model, self.params,
                                         self.state, self.nap_int8,
                                         xd, exact=exact)
        if exact:
            return _nap_windows_exact_one(self.model, self.params,
                                          self.state, self.nap_stats, xd)
        offset, inv_std = (self.nap_pre if self.nap_pre is not None
                           else nap_precompute(self.nap_stats))
        v = (self.nap_v if self.nap_v is not None
             else self.nap_stats.rotater.v.astype(self.compute_dtype))
        return _nap_windows_lowp_one(self.model, self.params, self.state,
                                     v, offset, inv_std, xd)

    def score_nap_windows_with_loss(self, x: jax.Array):
        """(NAP scores, per-window BASE MSE-sum) — the full_test.py
        slip-trace path needs both; single-chip they come from the ONE
        program score_nap_windows runs, so CLI scores are identical with
        and without --slip_plot_path.  Mesh serving derives the loss from
        the sharded concat-diff matrix (dfs[0] IS x_hat - x)."""
        if self.nap_stats is None:
            raise ValueError("score_nap_windows needs nap_stats")
        if self.mesh is None:
            return self._nap_windows_one(x)
        d = self.nap_diffs(x)
        loss = jnp.sum(
            d[:, : x.shape[-1]].astype(jnp.float32) ** 2, axis=-1)
        return self.score_nap(d), loss

    def score_sap_windows(self, x: jax.Array) -> jax.Array:
        """SAP score (mean square over concat diffs, utils/metric.py:145-181
        semantics) on fused windows at the serving precision — completes the
        BASE/SAP/NAP three-score contract for serving.  Single-chip it is
        one jitted program (same dispatch anatomy as score_nap_windows)."""
        if self.mesh is None:
            exact = self.compute_dtype == jnp.float32
            xd = x.astype(jnp.float32 if exact else self.compute_dtype)
            return _sap_windows_one(self.model, self.params, self.state,
                                    xd, exact=exact)
        cat = self.nap_diffs(x)
        return jnp.mean(cat * cat, axis=-1)

    def score_nap_raw(self, **mods) -> jax.Array:
        """Raw modality tensors -> fusion convs -> RaPP diffs -> NAP score,
        everything at the serving precision (r/d/t/m layout of fusion.fuse)."""
        if self.fusion_params is None:
            raise ValueError("score_nap_raw needs fusion_params")
        mods = {k: v.astype(self.compute_dtype) for k, v in mods.items()}
        from icra2021_multimodal_ad_tpu.ops.fusion import fuse as _fuse

        x = _fuse(self.fusion_params, sensor="All", **mods)
        return self.score_nap_windows(x)

    def score_sensor(self, r, d, t, m) -> jax.Array:
        """BASE score on NATIVE sensor payloads — uint8 camera/depth frames,
        force in newtons [0,400], fp32 MFCC frames — normalized ON DEVICE
        with the fixed-range realtime semantics
        (utils/data_loaders.py:703-731 via ops/fusion.normalize_mods), then
        fused + scored at the serving dtype, all as ONE program.

        This is the ingestion-native path: uint8 images ship host->device
        and over the wire at 1 byte/px (4x less than fp32 stacking, 2x
        less than bf16), and the fixed ranges make the device-side
        normalization exact.  Its win is TRANSFER bytes (robot links,
        PCIe, the scoring service), not on-chip throughput: with inputs
        already device-resident, the bench's same-methodology comparison
        measures it ~8% SLOWER than pre-normalized bf16 tensors
        (`sensor_u8_vs_bf16_same_loop` = 0.92, BENCH r4 — the extra
        device-side normalize/cast work outweighs the halved input HBM
        reads; an earlier +9% probe did not replicate).  Score rel err vs
        the host-normalized bf16 path: 9.7e-5."""
        if self.fusion_params is None:
            raise ValueError("score_sensor needs fusion_params")
        n = r.shape[0]
        if self.mesh is not None:
            r, d, t, m = (self._shard_edge(v) for v in (r, d, t, m))
        return _score_sensor(self.model, self.params, self.state,
                             self.fusion_params, r, d, t, m,
                             dtype=self.compute_dtype)[:n]

    def fuse_sensor(self, r, d, t, m) -> jax.Array:
        """Normalize NATIVE sensor payloads on device (fixed-range realtime
        semantics) and fuse at the serving dtype — the windows feeding
        score_nap_windows / score_sap_windows / nap_diffs.  One program."""
        if self.fusion_params is None:
            raise ValueError("fuse_sensor needs fusion_params")
        n = r.shape[0]
        if self.mesh is not None:
            r, d, t, m = (self._shard_edge(v) for v in (r, d, t, m))
        return _fuse_sensor(self.fusion_params, r, d, t, m,
                            dtype=self.compute_dtype)[:n]

    def score_nap_sensor(self, r, d, t, m) -> jax.Array:
        """NATIVE sensor payloads -> device-side normalize + fuse -> RaPP
        diffs -> NAP score at the serving precision (fuse_sensor +
        score_nap_windows)."""
        return self.score_nap_windows(self.fuse_sensor(r, d, t, m))


#: default whitening-variance floor (relative to the max column variance)
#: for bf16 NAP serving — see ops/scoring.nap_effective_stats for the
#: measurements behind the value.
NAP_VAR_FLOOR_REL_BF16 = 1e-6


def make_serving(config, model: AutoEncoder, params, state,
                 fusion_params: Optional[FusionParams] = None,
                 nap_stats: Optional[NapStats] = None,
                 nap_var_floor_rel="auto", mesh=None,
                 nap_quant="auto") -> ServingModel:
    """Build the serving bundle; `config.compute_dtype` ('float32' |
    'bfloat16') selects the operand dtype — the previously-dormant knob.

    `nap_var_floor_rel`: whitening-variance floor for score_nap* (see
    ops/scoring.nap_effective_stats).  "auto" = NAP_VAR_FLOOR_REL_BF16 for
    bf16 (where un-floored near-null directions amplify rounding into
    garbage scores), no floor for fp32 (exact eval parity).  Pass a float to
    override, or None/0 to disable.

    `mesh`: a 1-D window-axis Mesh — every scorer then shards its batch
    over the mesh (multi-chip serving; see ServingModel docstring).

    `nap_quant`: 'int8' runs the NAP whitening matmul on the MXU's int8
    path (2x the bf16 peak; see NapInt8Pack) — diff extraction stays at
    compute_dtype, the epilogue fp32.  "auto" reads config.nap_quant when
    the config carries one; None disables.  int8 requires a variance floor
    (the same near-null amplification argument as bf16, but ~2 fewer
    mantissa bits), so it implies the bf16 floor when the caller left
    nap_var_floor_rel on "auto" with an fp32 compute_dtype."""
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_effective_stats

    dtype = _DTYPES[getattr(config, "compute_dtype", "float32")]
    if nap_quant == "auto":
        nap_quant = getattr(config, "nap_quant", None)
    if nap_quant not in (None, "int8"):
        raise ValueError(f"unknown nap_quant: {nap_quant!r}")
    if nap_var_floor_rel == "auto":
        nap_var_floor_rel = (NAP_VAR_FLOOR_REL_BF16
                             if dtype == jnp.bfloat16 or nap_quant
                             else None)
    if nap_stats is not None and nap_var_floor_rel:
        nap_stats = nap_effective_stats(nap_stats, nap_var_floor_rel)
    # fold the whitening means + pad/cast the rotation matrix ONCE at build
    # time — score_nap calls must not re-dispatch the mu @ V GEMV or the
    # O(K*J) pad of V per streaming tick
    nap_pre = nap_precompute(nap_stats) if nap_stats is not None else None
    quantized = nap_stats is not None and nap_quant == "int8"
    return ServingModel(
        model=model,
        params=cast_floats(params, dtype),
        state=state,  # BN running stats stay fp32 (tiny, accuracy-relevant)
        fusion_params=(cast_floats(fusion_params, dtype)
                       if fusion_params is not None else None),
        nap_stats=nap_stats,
        compute_dtype=dtype,
        nap_pre=nap_pre,
        mesh=mesh,
        nap_pack=(nap_pallas_pack(nap_stats, dtype=dtype, precomputed=nap_pre)
                  if nap_stats is not None and mesh is None and not quantized
                  else None),
        # built for mesh AND single-chip low-precision bundles: the
        # one-program window scorer (_nap_windows_lowp_one) consumes the
        # pre-cast V too — without it every scoring call would pay an
        # eager O(K*J) fp32->bf16 device cast (~tens of MB per streaming
        # tick), the exact per-call cost nap_pre/nap_pack exist to avoid
        nap_v=(nap_stats.rotater.v.astype(dtype)
               if nap_stats is not None
               and (mesh is not None or dtype != jnp.float32)
               and not quantized else None),
        nap_int8=(nap_int8_pack(nap_stats, precomputed=nap_pre)
                  if quantized else None),
    )


from functools import partial  # noqa: E402


def _module_taps_mixed(spec, params_mod, state_mod, y, dtype):
    """One FC module on the mixed-precision stream, collecting per-layer
    taps.  Each layer's matmul streams `dtype` operands into an fp32
    accumulation; bias + activation + eval-mode BN affine stay fp32; the tap
    is the fp32 per-layer output (the quantity diffs_batch records on the
    exact path); only the operand fed to the NEXT matmul is cast back down.
    Returns (taps, stream) — `stream` is the dtype-cast last tap.

    With fp32 operands the matmuls take HIGHEST precision (on TPU, default-
    precision fp32 decomposes to bf16 passes — CLAUDE.md invariant), so the
    fp32 configuration reproduces the exact path; bf16 operands take the
    native single-pass MXU route."""
    from icra2021_multimodal_ad_tpu.models.layers import BN_EPS, activation

    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    taps = []
    for lspec, p, s in zip(spec.layers, params_mod, state_mod):
        acc = jnp.dot(y, p["w"].astype(dtype),
                      preferred_element_type=jnp.float32, precision=prec)
        acc = acc + p["b"].astype(jnp.float32)
        acc = activation(lspec.act, acc)
        if lspec.bn:
            inv = jax.lax.rsqrt(s["bn_var"] + BN_EPS)
            acc = ((acc - s["bn_mean"]) * inv
                   * p["bn_scale"].astype(jnp.float32)
                   + p["bn_bias"].astype(jnp.float32))
        taps.append(acc)
        y = acc.astype(dtype)
    return taps, y


def serving_ae_forward(model: AutoEncoder, params, state, x) -> jax.Array:
    """Eval-mode AE forward with LOW-PRECISION inter-layer activations.

    The exact train/eval forward keeps fp32 activations between layers
    (preferred_element_type=f32 + HIGHEST), which forces every matmul after
    the first onto the slow fp32 MXU route.  Serving instead keeps the
    accumulate + bias + activation + BN affine in fp32 per layer, then casts
    the activation back to the operand dtype before the next matmul —
    measured 1.86x faster at the canonical shape (2.61 ms vs 4.86 ms for
    16384x1728 bf16) at 0.4% mean relative reconstruction error vs fp32.

    VIB models take the deterministic head (z = mu) like the scoring path.
    """
    dtype = x.dtype
    _, y = _module_taps_mixed(model.encoder, params["encoder"],
                              state["encoder"], x, dtype)
    if model.distribution is not None:
        y = y[..., : y.shape[-1] // 2]  # deterministic VIB: z = mu
    _, y = _module_taps_mixed(model.decoder, params["decoder"],
                              state["decoder"], y, dtype)
    return y


@partial(jax.jit, static_argnames=("model",))
def serving_diffs_batch(model: AutoEncoder, params, state, x):
    """Mixed-precision RaPP diff extraction — ops/rapp.diffs_batch semantics
    (reconstruction_aggregation.py:6-37 capability) on the serving numerics:
    every matmul streams x.dtype operands with fp32 MXU accumulation, every
    tap and every diff is fp32.  Same tuple layout as diffs_batch
    (n_layers + 1 diff arrays).

    This is the throughput configuration for NAP *scoring* against already-
    fitted stats (streaming / serving); the NAP *fit* stays on the exact
    fp32 HIGHEST path (CLAUDE.md invariant — the SVD is cancellation-
    sensitive).  Deploy behind nap_accuracy_guard."""
    dtype = x.dtype
    x32 = x.reshape(x.shape[0], -1).astype(jnp.float32)
    taps_x, _ = _module_taps_mixed(model.encoder, params["encoder"],
                                   state["encoder"], x32.astype(dtype), dtype)
    z = taps_x[-1]
    if model.distribution is not None:
        z = z[..., : z.shape[-1] // 2]  # deterministic VIB: z = mu
    taps_d, _ = _module_taps_mixed(model.decoder, params["decoder"],
                                   state["decoder"], z.astype(dtype), dtype)
    x_hat = taps_d[-1]  # fp32 tap of the last decoder layer
    taps_xhat, _ = _module_taps_mixed(model.encoder, params["encoder"],
                                      state["encoder"], x_hat.astype(dtype),
                                      dtype)
    diffs = [x_hat - x32]
    diffs += [h2 - h1 for h1, h2 in zip(taps_x, taps_xhat)]
    return tuple(diffs)


class NapInt8Pack(NamedTuple):
    """int8-quantized whitening operands, built once at make_serving time.

    The NAP whitening matmul is the MXU-bound stage of NAP serving (it runs
    at ~79% of the bf16 peak), and the v5e MXU's int8 path has 2x the bf16
    peak (measured on the canonical (16384,5504)x(5504,5504) shape: 356 vs
    166 TOP/s).

    Quantization scheme (two-level, clip-free):
    - **static per-feature scales** `sk` ((1, K) fp32): the per-feature
      abs-max of the TRAIN diffs, recorded by `nap_fit` as
      `NapStats.feat_absmax` and folded into V at pack time
      (V' = sk^T * V).  Concat diff taps span decades across layers AND
      the whitening divides by tiny train stds, so a single per-row scale
      buries exactly the small-magnitude features the near-null whitened
      directions read — measured 115% mean score error on a random-init
      model; per-feature normalization brings it to 1.7%.
    - **dynamic per-row scales** at score time on the normalized features
      (row abs-max / 127) — no clipping, so anomalous windows whose diffs
      exceed the calibration range stay representable (their scores
      compress toward the quantization noise floor but remain orders of
      magnitude above normal — separation is tested, and magnitudes come
      from thresholds fit on guard-certified normal scores).
    - V' quantized per COLUMN (whitening rescales per column anyway);
      accumulation is int32 (exact), the epilogue (rescale, offset,
      standardize, square, mean) fp32.
    - **split-precision bf16 tail**: the residual int8 error is
      concentrated in the whitened directions whose per-column quant step
      is amplified most by the standardization — ordering columns by
      sv_j * inv_std_j, the top 1/8 carry >half of it (measured on the
      bench fit, scripts/int8_split_probe.py).  Those NAP_INT8_TAIL_FRAC
      columns are computed as a narrow bf16 matmul of the ORIGINAL V
      columns instead (no quantization), the rest stay int8: at the
      canonical 5482x4096 whitening shape that is ~1.125x the pure-int8
      GEMM cost (int8 runs 2x bf16 peak, the tail is 1/8 the columns) for
      a 5.6% -> 1.3% mean score error — inside the guard's 5e-2 default
      tolerance with margin, where pure int8 measured just outside it.

    Stats persisted before `feat_absmax` existed fall back to sk = 1
    (global per-row quantization) — the guard then decides whether that is
    accurate enough for the fit at hand.  Deploy behind
    nap_accuracy_guard(..., nap_quant='int8')."""

    v8: jax.Array       # (K, J8) int8 of sk^T * V (int8-kept columns)
    sv: jax.Array       # (1, J8) fp32 per-column scales of sk^T * V
    sk: jax.Array       # (1, K) fp32 static per-feature scales (or ones)
    offset: jax.Array   # (1, J8) fp32 folded means (rot_mu @ V + std_mu)
    inv_std: jax.Array  # (1, J8) fp32
    v16: Optional[jax.Array]       # (K, JT) bf16 tail columns of V, or None
    offset16: Optional[jax.Array]  # (1, JT) fp32
    inv_std16: Optional[jax.Array]  # (1, JT) fp32
    k: int
    j: int              # TOTAL whitened width J8 + JT (the score mean's n)


#: Fraction of whitened directions the int8 NAP path computes in bf16
#: (by descending sv*inv_std — the noisiest-under-quantization columns).
#: 1/8 measured 5.6% -> 1.3% mean score error at ~1.125x the pure-int8
#: whitening cost on the canonical bench fit; 1/4 reaches 0.33% at 1.25x.
NAP_INT8_TAIL_FRAC = 1 / 8


def nap_int8_pack(nap_stats: NapStats, precomputed=None,
                  tail_frac: float = NAP_INT8_TAIL_FRAC) -> NapInt8Pack:
    offset, inv_std = (precomputed if precomputed is not None
                       else nap_precompute(nap_stats))
    offset = offset.reshape(1, -1)
    inv_std = inv_std.reshape(1, -1)
    v_orig = nap_stats.rotater.v.astype(jnp.float32)
    k, j = v_orig.shape
    am = getattr(nap_stats, "feat_absmax", None)
    if am is not None:
        sk = jnp.where(am > 0, am, 1.0).astype(jnp.float32).reshape(1, -1)
        v = v_orig * sk.reshape(-1, 1)
    else:
        sk = jnp.ones((1, k), jnp.float32)
        v = v_orig
    col_max = jnp.max(jnp.abs(v), axis=0, keepdims=True)
    sv = jnp.where(col_max > 0, col_max / 127.0, 1.0)

    # bf16 tail size: round toward the 128-lane granularity on fits large
    # enough for GEMM tiling to matter; tiny test fits just take the
    # un-padded count (accuracy there is not the concern)
    jt = int(round(j * tail_frac))
    if tail_frac > 0 and j > 1:
        jt = max(jt, 1)
        if j >= 512:
            jt = min(((jt + 127) // 128) * 128, j - 128)
        jt = min(jt, j - 1)
    else:
        jt = 0
    if jt <= 0:
        v8 = jnp.round(v / sv).astype(jnp.int8)
        return NapInt8Pack(v8, sv, sk, offset, inv_std,
                           None, None, None, k, j)

    noise_key = sv[0] * inv_std[0]  # per-column quant step x amplification
    order = jnp.argsort(-noise_key)
    tail_ix, main_ix = order[:jt], order[jt:]
    v_main = jnp.take(v, main_ix, axis=1)
    sv_main = jnp.take(sv, main_ix, axis=1)
    v8 = jnp.round(v_main / sv_main).astype(jnp.int8)
    return NapInt8Pack(
        v8, sv_main, sk,
        jnp.take(offset, main_ix, axis=1), jnp.take(inv_std, main_ix, axis=1),
        jnp.take(v_orig, tail_ix, axis=1).astype(jnp.bfloat16),
        jnp.take(offset, tail_ix, axis=1), jnp.take(inv_std, tail_ix, axis=1),
        k, j)


@jax.jit
def _nap_score_int8_xla(pack: NapInt8Pack, x):
    """Static per-feature + dynamic per-row int8 quantization, int8 MXU
    matmul for the bulk of the whitened directions plus a narrow bf16
    matmul for the quantization-noisiest tail, fp32 epilogue (see
    NapInt8Pack).  The score is a mean over ALL J directions — column
    order between the two partitions is irrelevant to it.  XLA partitions
    the row axis over a mesh exactly like the bf16 _nap_score_xla."""
    x = x.astype(jnp.float32)
    y = x / pack.sk
    row_max = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    sx = jnp.where(row_max > 0, row_max / 127.0, 1.0)
    x8 = jnp.round(y / sx).astype(jnp.int8)
    rot = jax.lax.dot_general(
        x8, pack.v8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * pack.sv
    t = (rot - pack.offset) * pack.inv_std
    acc = jnp.sum(t * t, axis=-1)
    if pack.v16 is not None:
        rot16 = jnp.dot(x.astype(jnp.bfloat16), pack.v16,
                        preferred_element_type=jnp.float32)
        t16 = (rot16 - pack.offset16) * pack.inv_std16
        acc = acc + jnp.sum(t16 * t16, axis=-1)
    return acc / pack.j


def _forward(model, params, state, x):
    """fp32 serving keeps the exact HIGHEST-precision path; low-precision
    serving takes the fast mixed-precision forward.  Serving is always
    deterministic: VIB models score with z = mu regardless of their
    stochastic_inference flag (matching diffs_batch / eval_epoch)."""
    if model.distribution is not None:
        model = model._replace(stochastic_inference=False)
    if x.dtype == jnp.float32:
        x_hat, _ = ae_forward(model, params, state, x, train=False)
        return x_hat
    return serving_ae_forward(model, params, state, x)


@partial(jax.jit, static_argnames=("prec",))
def _nap_score_xla(v, offset, inv_std, x, prec):
    """Folded-offset NAP score as one XLA matmul + epilogue — the mesh-
    shardable serving path (XLA partitions the rows x V matmul over the
    window axis; the Pallas kernel cannot be auto-partitioned)."""
    rot = jnp.dot(x, v, preferred_element_type=jnp.float32, precision=prec)
    t = (rot - offset) * inv_std
    return jnp.mean(t * t, axis=-1)


@partial(jax.jit, static_argnames=("model",))
def _score_fused(model, params, state, x):
    x_hat = _forward(model, params, state, x)
    d = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
    return jnp.mean(d * d, axis=-1)


# ---- single-chip one-program NAP/SAP-on-windows scorers -------------------
# The r5 probe measured the multi-dispatch composition (diffs program ->
# concat -> score program) at +7-8 ms per call over BASE at batch 10 on
# the tunneled chip — every extra dispatch costs a link round trip, the
# same anatomy the streaming tick ladder removed (ARCHITECTURE.md §6.7).
# These fuse the whole path into ONE jitted program, the window-input
# twins of data/streaming._tick_nap_{exact,bf16,int8}: NAP round trips
# measured 31.7 -> 24.4 ms (fp32) / 33.4 -> 25.6 ms (bf16) — parity with
# BASE.  The whitening takes the XLA matmul form (the streaming-tick
# semantics; fp32 agrees with the Pallas-kernel path at ~1e-7): Pallas'
# VMEM-shrink retry (pallas_kernels.nap_score_pallas) is a Python-level
# except that cannot fire inside an enclosing jit trace, so the kernel
# stays on the explicit concat-diff entry point (score_nap) only.

def _base_loss_of(dfs):
    """Per-window BASE MSE-sum from the input-layer diff tap: dfs[0] IS
    x_hat - x, so the loss trace costs no second forward (the
    FullTest.py:54-98 show_detect_slip loss semantics)."""
    return jnp.sum(dfs[0].astype(jnp.float32) ** 2, axis=-1)


@partial(jax.jit, static_argnames=("model",))
def _nap_windows_exact_one(model, params, state, stats, x):
    """fp32: exact diff extraction + HIGHEST-precision whitening.
    Returns (scores, base_loss)."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device

    d = diffs_batch(model, params, state, x)
    return (nap_score_device(stats, jnp.concatenate(d, axis=-1)),
            _base_loss_of(d))


@partial(jax.jit, static_argnames=("model",))
def _nap_windows_lowp_one(model, params, state, v, offset, inv_std, x):
    """bf16: mixed-precision taps + bf16 whitening matmul, fp32
    accumulation/score — the same _nap_score_xla epilogue the mesh and
    export paths run (ONE definition; score_nap_windows serving
    semantics).  Returns (scores, base_loss)."""
    dfs = serving_diffs_batch(model, params, state, x)
    cat = jnp.concatenate(dfs, axis=-1).astype(v.dtype)
    return _nap_score_xla(v, offset, inv_std, cat, None), _base_loss_of(dfs)


@partial(jax.jit, static_argnames=("model", "exact"))
def _nap_windows_int8_one(model, params, state, pack, x, *, exact):
    """nap_quant='int8': extraction at the serving dtype, int8 MXU
    whitening with the split-precision bf16 tail.
    Returns (scores, base_loss)."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

    d = (diffs_batch if exact else serving_diffs_batch)(
        model, params, state, x)
    return (_nap_score_int8_xla(pack, jnp.concatenate(d, axis=-1)),
            _base_loss_of(d))


@partial(jax.jit, static_argnames=("model", "exact"))
def _sap_windows_one(model, params, state, x, *, exact):
    """SAP (mean square over concat diffs) as one program."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

    d = (diffs_batch if exact else serving_diffs_batch)(
        model, params, state, x)
    cat = jnp.concatenate(d, axis=-1)
    return jnp.mean(cat * cat, axis=-1)


@partial(jax.jit, static_argnames=("model", "keys"))
def _score_raw(model, params, state, fusion_params, keys, mods):
    x = fuse(fusion_params, sensor="All", **mods)
    x_hat = _forward(model, params, state, x)
    d = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
    return jnp.mean(d * d, axis=-1)


@partial(jax.jit, static_argnames=("dtype",))
def _fuse_sensor(fusion_params, r, d, t, m, *, dtype):
    from icra2021_multimodal_ad_tpu.ops.fusion import normalize_mods

    rn, dn, tn, mn = normalize_mods(r, d, t, m)
    return fuse(fusion_params, sensor="All",
                r=rn.astype(dtype), d=dn.astype(dtype),
                t=tn.astype(dtype), m=mn.astype(dtype))


@partial(jax.jit, static_argnames=("model", "dtype"))
def _score_sensor(model, params, state, fusion_params, r, d, t, m, *, dtype):
    x = _fuse_sensor(fusion_params, r, d, t, m, dtype=dtype)
    x_hat = _forward(model, params, state, x)
    delta = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
    return jnp.mean(delta * delta, axis=-1)


def bf16_accuracy_guard(config, model, params, state, x,
                        tol: float = 5e-2) -> float:
    """Mean relative BASE-score error of the bf16 serving path vs fp32 on a
    probe batch; raises if above tol (deploy-time sanity check)."""
    import numpy as np

    fp32 = make_serving(config.replace(compute_dtype="float32"),
                        model, params, state)
    bf16 = make_serving(config.replace(compute_dtype="bfloat16"),
                        model, params, state)
    s32 = np.asarray(fp32.score_fused(jnp.asarray(x)))
    s16 = np.asarray(bf16.score_fused(jnp.asarray(x)))
    rel = float(np.mean(np.abs(s16 - s32) / (np.abs(s32) + 1e-6)))
    if rel > tol:
        raise ValueError(f"bf16 serving rel err {rel:.4f} > tol {tol}")
    return rel


def nap_accuracy_guard(config, model, params, state, nap_stats, x,
                       tol: float = 5e-2,
                       nap_var_floor_rel=NAP_VAR_FLOOR_REL_BF16,
                       nap_quant="auto",
                       fast_serving: Optional[ServingModel] = None,
                       return_scores: bool = False):
    """Mean relative NAP-score error of the low-precision serving path
    (mixed-precision diff extraction + bf16 — or, with nap_quant='int8',
    int8 — whitening matmul) vs the fp32 path on a probe batch of fused
    windows; raises above tol.

    NAP is the risky score to run at low precision: whitening divides each
    rotated column by the train-diff std, so forward-pass rounding on a
    well-trained model (whose diffs are small) is amplified relative to the
    signal.  Both bundles here use the SAME variance floor (the bf16
    default), so the guard isolates the precision error — run it before
    enabling bf16/int8 NAP serving.  Pass nap_var_floor_rel=0 to compare
    against un-floored whitening (expected to fail on degenerate fits; that
    failure is the guard doing its job).

    `nap_quant` follows make_serving's contract: "auto" (default) reads
    `config.nap_quant`, so the guard certifies the SAME path the config
    deploys — a Config(nap_quant='int8') deployment must not be certified
    by a bf16 measurement.  Pass None/'int8' to pin a path explicitly.

    `fast_serving`: a pre-built low-precision bundle to certify instead of
    building a fresh one — callers that will serve with that exact bundle
    (full_test.py) pass it here so the probe batch is scored once, not
    twice.  It must have been built on the SAME variance floor as
    `nap_var_floor_rel` (make_serving's "auto" default IS this guard's
    default), or the guard would measure floor drift, not precision error.
    `return_scores=True` returns (rel, fast_scores) so the caller can
    reuse the certified fast-path scores outright."""
    import numpy as np

    if nap_quant == "auto":
        nap_quant = getattr(config, "nap_quant", None)
    fp32 = make_serving(config.replace(compute_dtype="float32"),
                        model, params, state, nap_stats=nap_stats,
                        nap_var_floor_rel=nap_var_floor_rel, nap_quant=None)
    if fast_serving is not None:
        # the bundle must BE the path the resolved nap_quant names — a
        # guard that scores a bf16 bundle but raises/reports as 'int8'
        # (or vice versa) certifies a path it never measured
        fast_kind = ("int8" if fast_serving.nap_int8 is not None
                     else "bf16"
                     if fast_serving.compute_dtype == jnp.bfloat16
                     else None)
        want_kind = "int8" if nap_quant == "int8" else (
            "bf16" if fast_serving.compute_dtype == jnp.bfloat16 else None)
        if fast_kind is None:
            raise ValueError("fast_serving has no low-precision path to "
                             "guard (fp32 compute_dtype, no nap_quant)")
        if fast_kind != want_kind:
            raise ValueError(
                f"fast_serving is the {fast_kind} path but the resolved "
                f"nap_quant asks the guard to certify {want_kind or 'bf16'}"
                " — build the bundle and the guard from the same config")
        fast = fast_serving
    else:
        fast = make_serving(config.replace(compute_dtype="bfloat16"),
                            model, params, state, nap_stats=nap_stats,
                            nap_var_floor_rel=nap_var_floor_rel,
                            nap_quant=nap_quant)
    x = jnp.asarray(x)
    s32 = np.asarray(fp32.score_nap_windows(x))
    s16 = np.asarray(fast.score_nap_windows(x))
    rel = float(np.mean(np.abs(s16 - s32) / (np.abs(s32) + 1e-6)))
    if rel > tol:
        kind = "int8" if nap_quant == "int8" else "bf16"
        raise ValueError(f"{kind} NAP serving rel err {rel:.4f} > tol {tol}")
    return (rel, s16) if return_scores else rel


def run_precision_guard(config, model, params, state, nap_stats, probe,
                        tol: float,
                        serving: Optional[ServingModel] = None):
    """Run the accuracy guard matching a serving bundle's precision:
    int8/bf16 NAP when NAP stats exist and any low-precision path is on,
    bf16 BASE otherwise, None for exact-fp32 bundles (nothing to guard).
    ONE definition of the deploy-guard dispatch for every deployment
    surface — serve.py, export.py, and ScoreServer.serve_guard all call
    this, so the contract can't drift between them.  Returns the measured
    mean relative score error, or None when the bundle is exact."""
    if serving is None:
        serving = make_serving(config, model, params, state,
                               nap_stats=nap_stats)
    low_nap = (nap_stats is not None
               and (serving.compute_dtype == jnp.bfloat16
                    or serving.nap_int8 is not None))
    if low_nap:
        return float(nap_accuracy_guard(config, model, params, state,
                                        nap_stats, probe, tol=tol,
                                        fast_serving=serving))
    if serving.compute_dtype == jnp.bfloat16:
        return float(bf16_accuracy_guard(config, model, params, state,
                                         probe, tol=tol))
    return None


# ---------------------------------------------------------------------------
# Serialized serving artifacts (jax.export / StableHLO)
# ---------------------------------------------------------------------------


def export_base_scorer(serving: ServingModel, batch_size: int,
                       input_size: int, path: Optional[str] = None) -> bytes:
    """Serialize the fused BASE scorer (weights baked in as constants) to a
    StableHLO artifact.  The artifact is loadable WITHOUT this package or
    the model code — the deployment story the reference's torch.save state
    dicts (novelty_detection.py:196) never had.  Shapes are static
    (batch_size x input_size), matching the serving batch contract."""
    from jax import export as jexport

    model, params, state = serving.model, serving.params, serving.state
    dtype = serving.compute_dtype

    def fn(x):
        # diff against the DTYPE-ROUNDED input, exactly like the live
        # score_fused path the accuracy guard certifies — diffing against
        # the unrounded fp32 x would make the artifact's scores drift from
        # the guarded ones as |x_hat - x| approaches the rounding magnitude
        x_c = x.astype(dtype)
        x_hat = _forward(model, params, state, x_c)
        d = x_hat.astype(jnp.float32) - x_c.astype(jnp.float32)
        return jnp.mean(d * d, axis=-1)

    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, input_size), jnp.float32)
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_nap_scorer(serving: ServingModel, batch_size: int,
                      cat_size: int, path: Optional[str] = None) -> bytes:
    """Serialize rotate+standardize+mean-square NAP scoring of concat diffs
    (whitening stats baked in), at the bundle's precision: int8 bundles
    ship the int8 MXU whitening, bf16 bundles the bf16 matmul, fp32 the
    exact `nap_score_device` — the same dispatch as the live `score_nap`
    (XLA form; Pallas doesn't serialize portably), so an artifact's
    provenance matches the precision its accuracy guard certified."""
    from jax import export as jexport

    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device

    stats = serving.nap_stats
    if stats is None:
        raise ValueError("export_nap_scorer needs nap_stats")

    def fn(x_cat):
        if serving.nap_int8 is not None:
            return _nap_score_int8_xla(serving.nap_int8, x_cat)
        if serving.compute_dtype != jnp.float32:
            dtype = serving.compute_dtype
            offset, inv_std = (serving.nap_pre if serving.nap_pre is not None
                               else nap_precompute(stats))
            v = stats.rotater.v.astype(dtype)
            return _nap_score_xla(v, offset, inv_std,
                                  x_cat.astype(dtype), None)
        return nap_score_device(stats, x_cat)

    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, cat_size), jnp.float32)
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def _nap_from_fused(serving: ServingModel):
    """Closure: fused (B, input) windows -> NAP score at the bundle's
    precision — ONE definition of the export-time dispatch (fp32 exact /
    bf16 / int8 whitening), shared by export_nap_window_scorer and
    export_sensor_scorer so per-artifact precision provenance can't
    drift between them."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device

    if serving.nap_stats is None:
        raise ValueError("NAP export needs nap_stats")
    model, params, state = serving.model, serving.params, serving.state
    stats = serving.nap_stats
    dtype = serving.compute_dtype

    def fn(x):
        # diff extraction at the bundle's precision, exactly like the live
        # score_nap_windows path
        if dtype == jnp.float32:
            d = diffs_batch(model, params, state, x)
        else:
            d = serving_diffs_batch(model, params, state, x.astype(dtype))
        if serving.nap_int8 is not None:
            # ship exactly the live int8 path the accuracy guard certified
            # (concat taps -> dynamic per-row quant -> int8 GEMM) — for
            # fp32 AND bf16 bundles; an fp32-compute int8 bundle must not
            # silently export the exact scorer its guard never measured
            cat32 = jnp.concatenate(d, axis=-1)
            return _nap_score_int8_xla(serving.nap_int8, cat32)
        if dtype == jnp.float32:
            return nap_score_device(stats, jnp.concatenate(d, axis=-1))
        cat = jnp.concatenate(d, axis=-1).astype(dtype)
        offset, inv_std = (serving.nap_pre if serving.nap_pre is not None
                           else nap_precompute(stats))
        v = stats.rotater.v.astype(dtype)
        return _nap_score_xla(v, offset, inv_std, cat, None)

    return fn


def export_nap_window_scorer(serving: ServingModel, batch_size: int,
                             input_size: int,
                             path: Optional[str] = None) -> bytes:
    """Serialize the FULL streaming NAP pipeline — fused windows -> RaPP
    diff extraction -> whitened score — with weights AND whitening stats
    baked in.  This is the deployable form of score_nap_windows: a single
    StableHLO artifact that scores (batch, input) windows with no model
    code, the artifact a robot-side scorer actually ships."""
    from jax import export as jexport

    fn = _nap_from_fused(serving)
    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, input_size), jnp.float32)
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_sensor_scorer(serving: ServingModel, batch_size: int,
                         op: str = "base", h: int = 32, w: int = 32,
                         path: Optional[str] = None) -> bytes:
    """Serialize the INGESTION-NATIVE raw-sensor pipeline as ONE StableHLO
    artifact: uint8 camera/depth frames + force in newtons + fp32 MFCC
    frames -> device-side fixed-range normalization
    (ops/fusion.normalize_mods; the reference's realtime semantics,
    utils/data_loaders.py:703-731) -> fusion convs -> BASE score
    (op="base"), or onward through RaPP diff extraction to the whitened
    NAP score (op="nap") at the bundle's certified precision.

    The deployable form of score_sensor / score_nap_sensor: the robot
    host ships NATIVE payloads (uint8 images are 4x smaller than fp32
    fused windows on the wire and in HBM) and needs neither the model
    code nor the fusion frontend — the seeded fusion projection, the AE
    weights, and the whitening stats are all baked into the artifact."""
    from jax import export as jexport

    from icra2021_multimodal_ad_tpu.ops.fusion import normalize_mods

    if serving.fusion_params is None:
        raise ValueError("export_sensor_scorer needs fusion_params "
                         "(a sensor='All' bundle)")
    if op not in ("base", "nap"):
        raise ValueError(f"op must be 'base' or 'nap', got {op!r}")
    nap_fn = _nap_from_fused(serving) if op == "nap" else None
    model, params, state = serving.model, serving.params, serving.state
    fusion_params = serving.fusion_params
    dtype = serving.compute_dtype

    def fn(r, d, t, m):
        rn, dn, tn, mn = normalize_mods(r, d, t, m)
        x = fuse(fusion_params, sensor="All",
                 r=rn.astype(dtype), d=dn.astype(dtype),
                 t=tn.astype(dtype), m=mn.astype(dtype))
        if nap_fn is not None:
            # x is already at the bundle dtype; the shared NAP dispatch
            # casts idempotently, so this is bit-identical to the live
            # score_nap_sensor = score_nap_windows(fuse_sensor(...))
            return nap_fn(x)
        x_hat = _forward(model, params, state, x)
        delta = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
        return jnp.mean(delta * delta, axis=-1)

    exp = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, 3, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, 1, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, 1), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 1, 13), jnp.float32),
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_scorer(blob_or_path):
    """Deserialize an exported scorer; returns a callable(x) -> scores."""
    from jax import export as jexport

    import os

    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob_or_path = f.read()
    exported = jexport.deserialize(blob_or_path)
    return exported.call
