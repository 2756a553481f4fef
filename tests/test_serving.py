"""bf16 serving path: config.compute_dtype drives the operand dtype; scores
track the fp32 path within tolerance (the explicit fast path of CLAUDE.md /
BASELINE.md's throughput configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fusion_init
from icra2021_multimodal_ad_tpu.ops.serving import (
    bf16_accuracy_guard,
    cast_floats,
    make_serving,
)


def _setup():
    cfg = Config(sensor="All", n_layers=3, btl_size=16, verbose=0, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    return cfg, model, params, state


def test_cast_floats_only_touches_float_leaves():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.arange(3)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == tree["i"].dtype


def test_bf16_serving_tracks_fp32_scores():
    cfg, model, params, state = _setup()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 1728)), jnp.float32
    )
    rel = bf16_accuracy_guard(cfg, model, params, state, x, tol=5e-2)
    assert rel < 5e-2

    serving = make_serving(cfg.replace(compute_dtype="bfloat16"),
                           model, params, state)
    assert serving.params["encoder"][0]["w"].dtype == jnp.bfloat16
    s = serving.score_fused(x)
    assert s.dtype == jnp.float32 and s.shape == (64,)


def test_serving_raw_modality_path():
    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    serving = make_serving(cfg.replace(compute_dtype="bfloat16"),
                           model, params, state, fusion_params=fusion_params)
    rng = np.random.default_rng(1)
    mods = {
        "r": jnp.asarray(rng.uniform(0, 1, (8, 3, 32, 32)), jnp.float32),
        "d": jnp.asarray(rng.uniform(0, 1, (8, 1, 32, 32)), jnp.float32),
        "t": jnp.asarray(rng.uniform(0, 1, (8, 1)), jnp.float32),
        "m": jnp.asarray(rng.uniform(-1, 1, (8, 1, 13)), jnp.float32),
    }
    s16 = np.asarray(serving.score_raw(**mods))

    fp32 = make_serving(cfg, model, params, state,
                        fusion_params=fusion_init(jax.random.PRNGKey(0)))
    s32 = np.asarray(fp32.score_raw(**mods))
    assert s16.shape == (8,)
    np.testing.assert_allclose(s16, s32, rtol=8e-2)


def test_serving_nap_kernel_path():
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        nap_fit,
        nap_score_device,
    )

    cfg, model, params, state = _setup()
    # well-conditioned whitening fit (rows >> dims); rank-deficient fits
    # amplify layout noise in null directions and are covered elsewhere
    cat = jnp.asarray(
        np.random.default_rng(2).normal(size=(512, 384)), jnp.float32
    )
    stats = nap_fit(cat)

    serving = make_serving(cfg, model, params, state, nap_stats=stats)
    ours = np.asarray(serving.score_nap(cat))
    ref = np.asarray(nap_score_device(stats, cat))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)

    serving16 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                             model, params, state, nap_stats=stats)
    s16 = np.asarray(serving16.score_nap(cat))
    assert s16.shape == ref.shape and np.isfinite(s16).all()


def test_streaming_detector_bf16_serving_mode():
    """StreamingDetector honors config.compute_dtype: bf16 BASE scorer
    tracks the fp32 one; NAP keeps fp32 params."""
    from icra2021_multimodal_ad_tpu.data.streaming import StreamingDetector

    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(10, 1728)), jnp.float32
    )

    det32 = StreamingDetector(cfg, model, params, state, fusion_params)
    det16 = StreamingDetector(cfg.replace(compute_dtype="bfloat16"),
                              model, params, state, fusion_params)
    s32 = det32.score_batch(x)
    s16 = det16.score_batch(x)
    rel = np.mean(np.abs(s16 - s32) / (np.abs(s32) + 1e-6))
    assert rel < 5e-2
    assert det16._serve_params["encoder"][0]["w"].dtype == jnp.bfloat16
    assert det16.params["encoder"][0]["w"].dtype == jnp.float32  # NAP path


def test_exported_scorer_roundtrip(tmp_path):
    """jax.export artifact: serialize the fused BASE scorer with weights
    baked in, deserialize, and match the live path exactly."""
    from icra2021_multimodal_ad_tpu.ops.serving import (
        export_base_scorer,
        export_nap_scorer,
        load_scorer,
    )
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        nap_fit,
        nap_score_device,
    )

    cfg, model, params, state = _setup()
    serving = make_serving(cfg, model, params, state)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(32, 1728)), jnp.float32
    )

    path = str(tmp_path / "base_scorer.bin")
    blob = export_base_scorer(serving, 32, 1728, path=path)
    assert len(blob) > 1000

    scorer = load_scorer(path)
    np.testing.assert_allclose(
        np.asarray(scorer(x)), np.asarray(serving.score_fused(x)),
        rtol=1e-6,
    )

    cat = jnp.asarray(
        np.random.default_rng(6).normal(size=(256, 128)), jnp.float32
    )
    stats = nap_fit(cat)
    serving_n = make_serving(cfg, model, params, state, nap_stats=stats)
    blob_n = export_nap_scorer(serving_n, 256, 128)
    scorer_n = load_scorer(blob_n)
    np.testing.assert_allclose(
        np.asarray(scorer_n(cat)), np.asarray(nap_score_device(stats, cat)),
        rtol=1e-5,
    )


def test_serving_forward_matches_exact_forward():
    """The mixed-precision serving forward must track the exact fp32
    forward closely (it trades ~0.4% reconstruction error for ~1.9x
    throughput), including on VIB models (deterministic z = mu head)."""
    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward
    from icra2021_multimodal_ad_tpu.ops.serving import serving_ae_forward

    cfg, model, params, state = _setup()
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(32, 1728)), jnp.float32
    )
    ref, _ = ae_forward(model, params, state, x, train=False)
    p16 = cast_floats(params, jnp.bfloat16)
    out = serving_ae_forward(model, p16, state, x.astype(jnp.bfloat16))
    rel = np.mean(np.abs(np.asarray(out, np.float32) - np.asarray(ref))
                  / (np.abs(np.asarray(ref)) + 1e-3))
    assert rel < 2e-2, rel

    # VIB model: deterministic head
    vib_cfg = cfg.replace(distribution="normal", k=2, sensor="force_torque",
                          n_layers=2, btl_size=4)
    vib_cfg = vib_cfg.replace(input_size=64)
    vmodel, vparams, vstate = get_model(vib_cfg)
    xv = jnp.asarray(np.random.default_rng(8).normal(size=(8, 64)),
                     jnp.float32)
    vref, _ = ae_forward(vmodel, vparams, vstate, xv, train=False)
    vout = serving_ae_forward(vmodel, cast_floats(vparams, jnp.bfloat16),
                              vstate, xv.astype(jnp.bfloat16))
    assert vout.shape == vref.shape
    vrel = np.mean(np.abs(np.asarray(vout, np.float32) - np.asarray(vref))
                   / (np.abs(np.asarray(vref)) + 1e-3))
    assert vrel < 3e-2, vrel


def test_fp32_serving_is_deterministic_for_stochastic_vib():
    """fp32 serving of a VIB model built with stochastic_inference=True must
    not require a PRNG key (review finding: only the bf16 branch overrode
    the flag)."""
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0,
                 distribution="normal", k=2, stochastic_inference=True)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64)),
                    jnp.float32)
    serving = make_serving(cfg, model, params, state)  # fp32 default
    s1 = np.asarray(serving.score_fused(x))
    s2 = np.asarray(serving.score_fused(x))
    np.testing.assert_array_equal(s1, s2)  # deterministic, no key needed
