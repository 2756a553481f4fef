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


def test_nap_pallas_pack_matches_unpacked():
    """The build-time padded pack (the streaming hot-path form) must score
    identically to the per-call padding path."""
    from icra2021_multimodal_ad_tpu.ops.pallas_kernels import nap_pallas_pack

    stats, x = _stats_and_data(seed=3)
    pack = nap_pallas_pack(stats, dtype=jnp.float32, tj=128)
    ours = np.asarray(nap_score_pallas(stats, x, tb=16, tj=128,
                                       precomputed=pack))
    ref = np.asarray(nap_score_pallas(stats, x, tb=16, tj=128))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_fused_mlp_rejects_unsupported_activation():
    """pack_module_layers must refuse activations the kernel doesn't
    implement rather than silently computing leakyrelu."""
    import pytest

    from icra2021_multimodal_ad_tpu.models.fc_module import (
        fc_module_init,
        fc_module_spec,
    )
    from icra2021_multimodal_ad_tpu.ops.pallas_kernels import (
        pack_module_layers,
    )

    spec = fc_module_spec(16, 8, [12], act="tanh")
    params, state = fc_module_init(jax.random.PRNGKey(0), spec)
    with pytest.raises(NotImplementedError, match="tanh"):
        pack_module_layers(spec, params, state)


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


def test_fused_mlp_kernel_matches_serving_forward():
    """The whole-module fused kernel (weights VMEM-resident, BN folded to a
    per-lane affine, padded lanes pinned to zero) must reproduce the
    layer-by-layer serving forward."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.pallas_kernels import (
        fused_module_forward,
        pack_module_layers,
    )
    from icra2021_multimodal_ad_tpu.ops.serving import (
        cast_floats,
        serving_ae_forward,
    )

    cfg = Config(sensor="All", n_layers=3, btl_size=16, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    p16 = cast_floats(params, jnp.bfloat16)

    enc_l, enc_a = pack_module_layers(model.encoder, p16["encoder"],
                                      state["encoder"])
    dec_l, dec_a = pack_module_layers(model.decoder, p16["decoder"],
                                      state["decoder"])
    x = jnp.asarray(np.random.default_rng(0).normal(size=(37, 1728)),
                    jnp.bfloat16)
    z = fused_module_forward(enc_l, enc_a, x)[:, : cfg.btl_size]
    xh = fused_module_forward(dec_l, dec_a, z)[:, : 1728]
    ref = serving_ae_forward(model, p16, state, x)
    rel = np.mean(
        np.abs(np.asarray(xh, np.float32) - np.asarray(ref, np.float32))
        / (np.abs(np.asarray(ref, np.float32)) + 1e-3)
    )
    assert rel < 1e-2, rel
    # padded output lanes are exactly zero
    full = fused_module_forward(dec_l, dec_a, z)
    assert full.shape[1] >= 1792
    np.testing.assert_array_equal(np.asarray(full[:, 1728:]), 0.0)

def test_vmem_oom_matcher_ignores_hbm_oom():
    """Only VMEM/scoped-allocation overflows are retryable by tile
    shrinking; a generic RESOURCE_EXHAUSTED (HBM OOM) must not trigger the
    retry loop — each futile retry recompiles (20-120 s over the tunnel)
    without shrinking the HBM-resident operands."""
    from icra2021_multimodal_ad_tpu.ops.pallas_kernels import _is_vmem_oom

    assert _is_vmem_oom(Exception(
        "Mosaic failed: scoped allocation of 20971520 bytes exceeds limit"))
    assert _is_vmem_oom(Exception(
        "RESOURCE_EXHAUSTED: exceeded VMEM limit of 16777216 bytes"))
    assert not _is_vmem_oom(Exception(
        "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
        "17179869184 bytes in hbm"))
    assert not _is_vmem_oom(Exception("unrelated compile error"))
