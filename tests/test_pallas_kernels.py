"""Fused Pallas NAP kernel vs the XLA reference path (interpreter mode on the
CPU test mesh; the real-TPU comparison runs in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.ops.normalize import RotaterStats, StandardizerStats
from icra2021_multimodal_ad_tpu.ops.pallas_kernels import (
    nap_precompute,
    nap_score_pallas,
)
from icra2021_multimodal_ad_tpu.ops.scoring import NapStats, nap_fit, nap_score_device


def _stats_and_data(n=96, k=70, seed=0):
    rng = np.random.default_rng(seed)
    train = rng.normal(size=(n, k)).astype(np.float32) * rng.uniform(0.5, 2, k)
    stats = nap_fit(jnp.asarray(train))
    x = rng.normal(size=(33, k)).astype(np.float32)
    return stats, jnp.asarray(x)


def test_nap_pallas_matches_xla_unaligned_shapes():
    # 70 columns, 33 rows: exercises padding on every axis
    stats, x = _stats_and_data()
    ours = np.asarray(nap_score_pallas(stats, x, tb=16, tj=128))
    ref = np.asarray(nap_score_device(stats, x))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-5)


def test_nap_pallas_precomputed_offset():
    stats, x = _stats_and_data(seed=1)
    pre = nap_precompute(stats)
    ours = np.asarray(nap_score_pallas(stats, x, tb=16, tj=128, precomputed=pre))
    ref = np.asarray(nap_score_device(stats, x))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-5)


def test_nap_pallas_identity_whitening():
    # with identity rotation and unit variance, score == mean(x^2)
    k = 128
    stats = NapStats(
        rotater=RotaterStats(mu=jnp.zeros(k), v=jnp.eye(k)),
        standardizer=StandardizerStats(mu=jnp.zeros(k), var=jnp.ones(k)),
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(24, k)),
                    dtype=jnp.float32)
    ours = np.asarray(nap_score_pallas(stats, x, tb=8, tj=128))
    np.testing.assert_allclose(ours, np.asarray(jnp.mean(x * x, axis=1)),
                               rtol=1e-4)
