"""Probe: is the int8 NAP whitening error concentrated in the large-inv_std
(near-null) whitened directions, and does computing a small bf16 tail of
columns recover most of the fp32 accuracy?

Replicates bench.py's int8 NAP scenario exactly (random-init canonical
All-sensor AE, uniform raw modalities, 4096-row fit, floored stats,
`nap_int8_pack` arithmetic) — the fit on which `nap_int8_score_rel_err`
measured 5.3%, above the guard's 5e-2 default tolerance.

Run on the TPU (analysis is computed on-device, only scalars fetched):
  python scripts/int8_split_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init
from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
from icra2021_multimodal_ad_tpu.ops.scoring import nap_effective_stats, nap_fit
from icra2021_multimodal_ad_tpu.ops.serving import (
    NAP_VAR_FLOOR_REL_BF16, nap_int8_pack, nap_precompute,
)


def main():
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    Bn = 4096
    rng = np.random.default_rng(0)
    raw = {
        "r": jnp.asarray(rng.uniform(0, 1, (Bn, 3, 32, 32)), jnp.float32),
        "d": jnp.asarray(rng.uniform(0, 1, (Bn, 1, 32, 32)), jnp.float32),
        "t": jnp.asarray(rng.uniform(0, 1, (Bn, 1)), jnp.float32),
        "m": jnp.asarray(rng.uniform(-1, 1, (Bn, 1, 13)), jnp.float32),
    }
    small = fuse(fusion_params, sensor="All", **raw)
    diffs = diffs_batch(model, params, state, small)
    cat32 = jnp.concatenate(diffs, axis=-1)
    stats = nap_fit(cat32)
    stats_f = nap_effective_stats(stats, NAP_VAR_FLOOR_REL_BF16)
    offset, inv_std = nap_precompute(stats_f)
    offset = offset.reshape(1, -1)
    inv_std = inv_std.reshape(1, -1)
    v = stats_f.rotater.v.astype(jnp.float32)
    pack = nap_int8_pack(stats_f, precomputed=(offset, inv_std))

    @jax.jit
    def analyze(x):
        # fp32 truth (same floored stats)
        t32 = (jnp.dot(x, v, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
               - offset) * inv_std
        s32 = jnp.mean(t32 * t32, axis=-1)
        # pure int8 (_nap_score_int8_xla arithmetic, columns kept)
        y = x / pack.sk
        row_max = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        sx = jnp.where(row_max > 0, row_max / 127.0, 1.0)
        x8 = jnp.round(y / sx).astype(jnp.int8)
        rot8 = jax.lax.dot_general(
            x8, pack.v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) \
            * sx * pack.sv
        t8 = (rot8 - offset) * inv_std
        s8 = jnp.mean(t8 * t8, axis=-1)
        rel8 = jnp.mean(jnp.abs(s8 - s32) / (jnp.abs(s32) + 1e-6))

        # per-column |t8^2 - t32^2| share, ordered by descending inv_std
        err_col = jnp.mean(jnp.abs(t8 * t8 - t32 * t32), axis=0)
        order = jnp.argsort(-(pack.sv[0] * inv_std[0]))
        cum = jnp.cumsum(err_col[order]) / jnp.sum(err_col)

        # bf16 tail splits: replace the top-T columns (by inv_std) with a
        # bf16 whitening matmul of those V columns
        x16 = x.astype(jnp.bfloat16)
        rels = []
        j = v.shape[1]
        for frac in (1 / 32, 1 / 16, 1 / 8, 1 / 4):
            t_cols = max(128, int(round(j * frac / 128)) * 128)
            tail = order[:t_cols]
            v_tail = jnp.take(v, tail, axis=1).astype(jnp.bfloat16)
            rot16 = jnp.dot(x16, v_tail,
                            preferred_element_type=jnp.float32)
            tt = (rot16 - offset[0][tail]) * inv_std[0][tail]
            # mixed score: int8 columns minus their tail contribution,
            # plus the bf16 tail contribution
            s_tail8 = jnp.sum(jnp.take(t8, tail, axis=1) ** 2, axis=1)
            s_mix = s8 + (jnp.sum(tt * tt, axis=1) - s_tail8) / j
            rels.append((t_cols,
                         jnp.mean(jnp.abs(s_mix - s32)
                                  / (jnp.abs(s32) + 1e-6))))
        return rel8, cum, rels

    rel8, cum, rels = analyze(cat32)
    cum = np.asarray(cum)
    j = v.shape[1]
    print(f"J={j}  pure int8 rel err: {float(rel8):.4f}")
    for frac in (1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4):
        k = max(1, int(j * frac))
        print(f"top {frac:.4f} of cols by inv_std carry "
              f"{cum[k - 1]:.3f} of the error")
    for t_cols, r in rels:
        print(f"bf16 tail {t_cols} cols ({t_cols / j:.3f}): "
              f"rel err {float(r):.4f}")


if __name__ == "__main__":
    main()
