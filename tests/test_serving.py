"""bf16 serving path: config.compute_dtype drives the operand dtype; scores
track the fp32 path within tolerance (the explicit fast path of CLAUDE.md /
BASELINE.md's throughput configuration)."""

import functools

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
    # ACCURACY bound on the bf16 kernel path: on a well-conditioned fit the
    # documented achievable error is < 5e-2 relative — finite garbage
    # (dropped whitening, wrong offset) must fail here.  bf16 serving
    # applies the variance floor, so compare against the floored stats.
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_effective_stats
    from icra2021_multimodal_ad_tpu.ops.serving import NAP_VAR_FLOOR_REL_BF16

    ref_floored = np.asarray(nap_score_device(
        nap_effective_stats(stats, NAP_VAR_FLOOR_REL_BF16), cat))
    rel = np.abs(s16 - ref_floored) / (np.abs(ref_floored) + 1e-6)
    assert rel.mean() < 5e-2, rel.mean()


def test_streaming_detector_bf16_serving_mode():
    """StreamingDetector honors config.compute_dtype: bf16 BASE scorer
    tracks the fp32 one; the exact fp32 params stay available for the
    fp32 NAP path."""
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
    assert det16.params["encoder"][0]["w"].dtype == jnp.float32  # exact path


def test_serving_diffs_batch_matches_exact_fp32():
    """serving_diffs_batch with fp32 operands must reproduce diffs_batch
    (on CPU both resolve to the same fp32 matmuls), and with bf16 operands
    every per-layer diff must stay finite and close on an untrained model."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.serving import serving_diffs_batch

    cfg, model, params, state = _setup()
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(16, 1728)), jnp.float32
    )
    ref = diffs_batch(model, params, state, x)
    got = serving_diffs_batch(model, params, state, x)
    assert len(got) == len(ref) == cfg.n_layers + 1
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)

    got16 = serving_diffs_batch(model, cast_floats(params, jnp.bfloat16),
                                state, x.astype(jnp.bfloat16))
    for r, g in zip(ref, got16):
        assert g.dtype == jnp.float32  # taps/diffs stay fp32
        rel = np.mean(np.abs(np.asarray(g) - np.asarray(r))
                      / (np.abs(np.asarray(r)) + 1e-3))
        assert rel < 5e-2, rel

    # SAP at serving precision: mean square over the same concat diffs
    cat_ref = np.concatenate([np.asarray(r) for r in ref], axis=-1)
    sap_ref = np.mean(cat_ref * cat_ref, axis=-1)
    serving = make_serving(cfg, model, params, state)
    np.testing.assert_allclose(np.asarray(serving.score_sap_windows(x)),
                               sap_ref, rtol=1e-5)
    serving16 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                             model, params, state)
    sap16 = np.asarray(serving16.score_sap_windows(x))
    assert np.mean(np.abs(sap16 - sap_ref) / (sap_ref + 1e-6)) < 5e-2


def test_bf16_nap_serving_on_trained_model():
    """The deploy-risk case for bf16 NAP: on a TRAINED model the diffs are
    small, so forward rounding is amplified by the whitening divide.  The
    guard must pass on in-distribution windows and the bf16 score must
    preserve the anomaly separation (direction + margin) of the fp32 path.
    """
    from icra2021_multimodal_ad_tpu.data.streaming import (
        SimulatedSensors,
        StreamingDetector,
        get_realtime_dataloader,
    )
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit
    from icra2021_multimodal_ad_tpu.ops.serving import nap_accuracy_guard
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = Config(sensor="All", batch_size=10, n_layers=3, btl_size=16,
                 verbose=0, n_epochs=10, lr=3e-3, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    src = SimulatedSensors(batch_size=10, seed=7)
    for _ in range(12):
        src.tick()
    rows = []
    for _ in range(20):
        src.tick()
        rows.append(np.asarray(get_realtime_dataloader(
            cfg, fusion_params,
            src.force_q.snapshot(), src.hand_q.snapshot(),
            src.depth_q.snapshot(), src.mic_q.snapshot(),
        )))
    windows = np.concatenate(rows, axis=0)
    n_valid = len(windows) // 5
    res = NoveltyDetecter(cfg.replace(batch_size=64)).train(
        model, params, state, windows[n_valid:], windows[:n_valid]
    )

    stats = nap_fit(concat_diffs(
        get_diffs(windows[n_valid:], model, res.params, res.state)
    ))

    # guard passes on in-distribution (normal) windows (both precisions on
    # the default bf16 variance floor).  This fit is deliberately worst-case
    # degenerate — 160 rows against ~5k diff dims — so the bf16 error is at
    # its ceiling here (~0.1); well-conditioned fits measure <5e-2 (see
    # nap_effective_stats docstring).  A deployment whose guard exceeds its
    # tolerance should raise the floor or keep NAP on fp32.
    rel = nap_accuracy_guard(cfg, model, res.params, res.state, stats,
                             windows[:64], tol=0.15)
    assert rel < 0.15, rel

    # ...and CATCHES the un-floored degenerate case: this fit has 160 rows
    # against ~5k diff dims, so without the floor the whitening divides by
    # near-zero variances and bf16 rounding explodes (measured >1e5x)
    with pytest.raises(ValueError, match="rel err"):
        nap_accuracy_guard(cfg, model, res.params, res.state, stats,
                           windows[:64], tol=5e-2, nap_var_floor_rel=0)

    # anomaly separation survives bf16: score normal + anomalous batches
    anom = SimulatedSensors(batch_size=10, seed=9)
    anom.fill()
    for _ in range(10):
        anom.tick(anomaly=True)
    x_anom = get_realtime_dataloader(
        cfg, fusion_params,
        anom.force_q.snapshot(), anom.hand_q.snapshot(),
        anom.depth_q.snapshot(), anom.mic_q.snapshot(),
    )
    x_norm = jnp.asarray(windows[:10])
    serving16 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                             model, res.params, res.state, nap_stats=stats)
    s_norm = np.asarray(serving16.score_nap_windows(x_norm))
    s_anom = np.asarray(serving16.score_nap_windows(x_anom))
    assert s_anom.mean() > 2.0 * s_norm.mean(), (s_norm.mean(), s_anom.mean())

    # the streaming detector's bf16 NAP branch tracks the fp32 one under
    # the same floored whitening (the fp32 detector gets pre-floored stats;
    # its own path applies no floor — exact reference semantics)
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_effective_stats
    from icra2021_multimodal_ad_tpu.ops.serving import NAP_VAR_FLOOR_REL_BF16

    det32 = StreamingDetector(
        cfg, model, res.params, res.state, fusion_params,
        nap_stats=nap_effective_stats(stats, NAP_VAR_FLOOR_REL_BF16),
    )
    det16 = StreamingDetector(cfg.replace(compute_dtype="bfloat16"),
                              model, res.params, res.state,
                              fusion_params, nap_stats=stats)
    n32 = det32.score_batch(x_norm, nap=True)
    n16 = det16.score_batch(x_norm, nap=True)
    # same worst-case-degenerate-fit ceiling as the guard above
    assert np.mean(np.abs(n16 - n32) / (np.abs(n32) + 1e-6)) < 0.15


def test_mesh_sharded_serving_matches_single_device():
    """make_serving(mesh=...) shards every scorer over the window axis; the
    scores must match the unsharded bundle (fp32 exactly-ish, bf16 within
    the usual tolerance), including non-divisible batches (padding)."""
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg, model, params, state = _setup()
    mesh = get_mesh(8)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(37, 1728)), jnp.float32)  # 37 % 8 != 0

    # well-conditioned whitening fit on plain diffs
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

    fit_x = jnp.asarray(rng.normal(size=(96, 1728)), jnp.float32)
    cat = jnp.concatenate(diffs_batch(model, params, state, fit_x), axis=-1)
    stats = nap_fit(cat)

    for dtype, rtol in (("float32", 2e-4), ("bfloat16", 8e-2)):
        c = cfg.replace(compute_dtype=dtype)
        single = make_serving(c, model, params, state, nap_stats=stats)
        sharded = make_serving(c, model, params, state, nap_stats=stats,
                               mesh=mesh)
        s_base_1 = np.asarray(single.score_fused(x))
        s_base_m = np.asarray(sharded.score_fused(x))
        assert s_base_m.shape == (37,)
        np.testing.assert_allclose(s_base_m, s_base_1, rtol=rtol, atol=1e-5)

        d1 = np.asarray(single.nap_diffs(x))
        dm = np.asarray(sharded.nap_diffs(x))
        np.testing.assert_allclose(dm, d1, rtol=rtol, atol=1e-4)

        n1 = np.asarray(single.score_nap_windows(x))
        nm = np.asarray(sharded.score_nap_windows(x))
        assert nm.shape == (37,)
        # Pallas kernel (single) vs XLA matmul (mesh): same math, different
        # tiling — compare at the dtype's tolerance
        rel = np.mean(np.abs(nm - n1) / (np.abs(n1) + 1e-6))
        assert rel < (1e-3 if dtype == "float32" else 8e-2), rel

        sap_m = np.asarray(sharded.score_sap_windows(x))
        sap_1 = np.asarray(single.score_sap_windows(x))
        np.testing.assert_allclose(sap_m, sap_1, rtol=rtol, atol=1e-5)


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

    # bf16 artifact must reproduce the guard-certified live path (diff
    # against the dtype-ROUNDED input, like score_fused)
    serving16 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                             model, params, state)
    scorer16 = load_scorer(export_base_scorer(serving16, 32, 1728))
    np.testing.assert_allclose(
        np.asarray(scorer16(x)), np.asarray(serving16.score_fused(x)),
        rtol=1e-5,
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

    # precision fidelity: an int8 bundle's concat-diff artifact ships the
    # int8 whitening its guard certifies, matching the live score_nap —
    # a regression to exporting the exact fp32 scorer would miss this by
    # the ~1e-2 quantization error
    serving8 = make_serving(cfg.replace(nap_quant="int8"), model, params,
                            state, nap_stats=stats)
    scorer8 = load_scorer(export_nap_scorer(serving8, 256, 128))
    got8 = np.asarray(scorer8(cat))
    want8 = np.asarray(serving8.score_nap(cat))
    rel8 = np.mean(np.abs(got8 - want8) / (np.abs(want8) + 1e-6))
    assert rel8 < 1e-4, rel8


def test_exported_nap_window_scorer_matches_live_pipeline():
    """The full windows->diffs->NAP artifact (the deployable streaming
    scorer) must reproduce score_nap_windows, fp32 and bf16."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit
    from icra2021_multimodal_ad_tpu.ops.serving import (
        export_nap_window_scorer,
        load_scorer,
    )

    cfg, model, params, state = _setup()
    rng = np.random.default_rng(7)
    x_fit = jnp.asarray(rng.normal(size=(64, 1728)), jnp.float32)
    stats = nap_fit(jnp.concatenate(
        diffs_batch(model, params, state, x_fit), axis=-1))
    x = jnp.asarray(rng.normal(size=(16, 1728)), jnp.float32)

    # tolerances: the artifact compiles the whole pipeline as ONE program
    # (different fusion/accumulation tiling than the live path's separate
    # programs) — ~1e-5 relative in fp32; bf16 additionally scores through
    # the Pallas kernel live vs the XLA matmul in the artifact
    for dtype_name, rtol in (("float32", 1e-4), ("bfloat16", 5e-3)):
        serving = make_serving(cfg.replace(compute_dtype=dtype_name),
                               model, params, state, nap_stats=stats)
        scorer = load_scorer(export_nap_window_scorer(serving, 16, 1728))
        np.testing.assert_allclose(
            np.asarray(scorer(x)),
            np.asarray(serving.score_nap_windows(x)),
            rtol=rtol, atol=1e-6,
        )

    # an int8-quantized bundle must export the SAME int8 program the
    # accuracy guard certified, not silently fall back to bf16 (or, for
    # fp32-compute int8 bundles, exact fp32) whitening
    for dtype_name in ("bfloat16", "float32"):
        serving8 = make_serving(cfg.replace(compute_dtype=dtype_name),
                                model, params, state, nap_stats=stats,
                                nap_quant="int8")
        scorer8 = load_scorer(export_nap_window_scorer(serving8, 16, 1728))
        np.testing.assert_allclose(
            np.asarray(scorer8(x)),
            np.asarray(serving8.score_nap_windows(x)),
            rtol=5e-3, atol=1e-6,
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


# ---------------------------------------------------------------------------
# int8 NAP serving (nap_quant="int8")
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=2)
def _trained_with_stats(seed=0):
    # cached: five int8 tests share one trained fixture instead of paying
    # the 8-epoch train + NAP fit each on the single-core CPU host
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = Config(sensor="force_torque", n_layers=3, btl_size=10,
                 verbose=0, n_epochs=8, batch_size=64, seed=seed)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(512, 6))
    w = np.linalg.qr(rng.normal(size=(6, cfg.input_size)).T)[0].T
    xtr = (z @ w + 0.05 * rng.normal(size=(512, cfg.input_size))).astype(
        np.float32)
    xva = xtr[:96]
    res = NoveltyDetecter(cfg).train(model, jax.tree.map(jnp.copy, params),
                                     jax.tree.map(jnp.copy, state),
                                     jnp.asarray(xtr[96:]), jnp.asarray(xva))
    stats = nap_fit(concat_diffs(
        get_diffs(xtr[96:], model, res.params, res.state)))
    return cfg, model, res.params, res.state, stats, xtr


def test_int8_nap_serving_tracks_fp32():
    from icra2021_multimodal_ad_tpu.ops.serving import nap_accuracy_guard

    cfg, model, params, state, stats, x = _trained_with_stats()
    assert stats.feat_absmax is not None  # nap_fit records the calibration
    rel = nap_accuracy_guard(cfg, model, params, state, stats,
                             x[:64], tol=0.05, nap_quant="int8")
    assert rel < 0.05, rel


def test_int8_nap_calibration_persistence_and_fallback(tmp_path):
    """feat_absmax (the int8 static scales) round-trips through the stats
    npz; pre-int8 stats files (no feat_absmax key) still load and the int8
    pack falls back to sk=1 global per-row quantization."""
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        load_nap_stats,
        save_nap_stats,
    )
    from icra2021_multimodal_ad_tpu.ops.serving import nap_int8_pack

    cfg, model, params, state, stats, x = _trained_with_stats()
    p = str(tmp_path / "stats")
    save_nap_stats(p, stats)
    st2 = load_nap_stats(p)
    np.testing.assert_allclose(np.asarray(st2.feat_absmax),
                               np.asarray(stats.feat_absmax))

    # legacy file: same arrays minus the calibration key
    import numpy as _np
    _np.savez(str(tmp_path / "old"),
              rot_mu=_np.asarray(stats.rotater.mu),
              rot_v=_np.asarray(stats.rotater.v),
              std_mu=_np.asarray(stats.standardizer.mu),
              std_var=_np.asarray(stats.standardizer.var))
    old = load_nap_stats(str(tmp_path / "old"))
    assert old.feat_absmax is None
    pk = nap_int8_pack(old)
    np.testing.assert_array_equal(np.asarray(pk.sk),
                                  np.ones((1, pk.k), np.float32))
    s8 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                      model, params, state, nap_stats=old,
                      nap_quant="int8")
    scores = np.asarray(s8.score_nap_windows(jnp.asarray(x[:16])))
    assert scores.shape == (16,) and np.all(np.isfinite(scores))


def test_int8_nap_bundle_and_anomaly_separation():
    cfg, model, params, state, stats, x = _trained_with_stats()
    s8 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                      model, params, state, nap_stats=stats,
                      nap_quant="int8")
    assert s8.nap_int8 is not None
    assert s8.nap_int8.v8.dtype == jnp.int8
    assert s8.nap_pack is None  # the Pallas bf16 pack is not also built
    scores = np.asarray(s8.score_nap_windows(jnp.asarray(x[:32])))
    assert scores.shape == (32,) and np.all(np.isfinite(scores))

    # score_nap on concat diffs routes through the same int8 program
    d = s8.nap_diffs(jnp.asarray(x[:32]))
    scores2 = np.asarray(s8.score_nap(d))
    np.testing.assert_allclose(scores2, scores, rtol=1e-5)

    # anomalous windows must stay separated under quantization
    rng = np.random.default_rng(9)
    x_anom = (x[:32] * 4.0 + rng.normal(size=(32, x.shape[1])).astype(
        np.float32))
    s_anom = np.asarray(s8.score_nap_windows(jnp.asarray(x_anom)))
    assert s_anom.mean() > 2.0 * scores.mean()


def test_int8_split_precision_tail_beats_pure_int8():
    """The split-precision bf16 tail (NAP_INT8_TAIL_FRAC of the whitened
    directions, ordered by sv*inv_std) must track fp32 strictly better
    than the pure-int8 pack on the same fit (tail_frac=0), and the two
    packs must partition the same J total (the score mean's denominator).
    Measured on the bench fit: 5.6% -> 1.3% (scripts/int8_split_probe.py);
    this pins the mechanism, not the bench magnitudes."""
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_score_device
    from icra2021_multimodal_ad_tpu.ops.serving import (
        _nap_score_int8_xla,
        nap_int8_pack,
    )

    cfg, model, params, state, stats, x = _trained_with_stats()
    d = jnp.concatenate(
        get_diffs_for(cfg, model, params, state, x[:64]), axis=-1)
    s32 = np.asarray(nap_score_device(stats, d))

    pk_split = nap_int8_pack(stats)
    pk_pure = nap_int8_pack(stats, tail_frac=0)
    assert pk_split.v16 is not None and pk_pure.v16 is None
    assert pk_split.v8.shape[1] + pk_split.v16.shape[1] == pk_pure.j
    assert pk_split.j == pk_pure.j

    rel = lambda s: float(np.mean(np.abs(np.asarray(s) - s32)
                                  / (np.abs(s32) + 1e-6)))
    r_split = rel(_nap_score_int8_xla(pk_split, d))
    r_pure = rel(_nap_score_int8_xla(pk_pure, d))
    assert r_split < r_pure, (r_split, r_pure)


def get_diffs_for(cfg, model, params, state, x):
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch

    return diffs_batch(model, params, state, jnp.asarray(x))


def test_int8_nap_config_knob_and_cli_guard():
    """Config(nap_quant='int8') flows through make_serving's 'auto' — and
    through nap_accuracy_guard's, so the guard certifies the path the
    config actually deploys, not silently the bf16 one."""
    from unittest import mock

    from icra2021_multimodal_ad_tpu.ops import serving as serving_mod

    cfg, model, params, state, stats, x = _trained_with_stats()
    cfg8 = cfg.replace(compute_dtype="bfloat16", nap_quant="int8")
    bundle = make_serving(cfg8, model, params, state, nap_stats=stats)
    assert bundle.nap_int8 is not None
    with pytest.raises(ValueError, match="nap_quant"):
        make_serving(cfg, model, params, state, nap_stats=stats,
                     nap_quant="int4")

    seen = []
    real = serving_mod.make_serving

    def spy(config, *a, **kw):
        seen.append(kw.get("nap_quant", "auto"))
        return real(config, *a, **kw)

    with mock.patch.object(serving_mod, "make_serving", side_effect=spy):
        serving_mod.nap_accuracy_guard(cfg8, model, params, state, stats,
                                       x[:16], tol=0.15)
    # fp32 reference bundle pins None; the fast bundle must carry int8
    assert seen == [None, "int8"], seen


def test_int8_nap_mesh_matches_single_device():
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg, model, params, state, stats, x = _trained_with_stats()
    kw = dict(nap_stats=stats, nap_quant="int8")
    s1 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                      model, params, state, **kw)
    sm = make_serving(cfg.replace(compute_dtype="bfloat16"),
                      model, params, state, mesh=get_mesh(8), **kw)
    xq = jnp.asarray(x[:19])  # non-divisible rows: padding path
    a = np.asarray(s1.score_nap_windows(xq))
    b = np.asarray(sm.score_nap_windows(xq))
    # int32 accumulation is exact and rows quantize per-row, but the
    # sharded bf16 diff extraction can differ from the unsharded one at
    # the LSB (per-device tiling), flipping int8 rounding decisions —
    # so close, not bit-identical (dryrun measures ~1e-3 worst-case on a
    # degenerate fit; this trained full-rank fit stays ~1e-6)
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_int8_streaming_tick_matches_serving_bundle():
    from icra2021_multimodal_ad_tpu.data.streaming import (
        SimulatedSensors,
        StreamingDetector,
        get_realtime_dataloader,
    )
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = Config(sensor="All", batch_size=10, n_layers=3, btl_size=16,
                 verbose=0, n_epochs=6, lr=3e-3, seed=0,
                 compute_dtype="bfloat16", nap_quant="int8")
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    src = SimulatedSensors(batch_size=10, seed=7)
    src.fill()
    rows = []
    for _ in range(12):
        src.tick()
        rows.append(np.asarray(get_realtime_dataloader(
            cfg, fusion_params,
            src.force_q.snapshot(), src.hand_q.snapshot(),
            src.depth_q.snapshot(), src.mic_q.snapshot())))
    windows = np.concatenate(rows, axis=0)
    res = NoveltyDetecter(cfg.replace(batch_size=32)).train(
        model, params, state, jnp.asarray(windows[24:]),
        jnp.asarray(windows[:24]))
    stats = nap_fit(concat_diffs(
        get_diffs(windows[24:], model, res.params, res.state)))

    det = StreamingDetector(cfg, model, res.params, res.state,
                            fusion_params, nap_stats=stats)
    from icra2021_multimodal_ad_tpu.data.streaming import hsr_window_batch

    det_mfcc = _mic_frames(cfg, src)
    tick = det.score_queues(src.force_q.snapshot(), src.hand_q.snapshot(),
                            src.depth_q.snapshot(), det_mfcc, nap=True)
    x = hsr_window_batch(cfg, fusion_params,
                         src.force_q.snapshot(), src.hand_q.snapshot(),
                         src.depth_q.snapshot(), det_mfcc)
    via_batch = det.score_batch(x, nap=True)
    np.testing.assert_allclose(tick, via_batch, rtol=2e-2, atol=1e-7)

    # fp32 + int8 (exact diffs into the int8 whitening): the one-program
    # tick must route through the int8 path at dtype float32 and match the
    # bundle exactly (no bf16 rounding anywhere in the diff extraction)
    cfg32 = cfg.replace(compute_dtype="float32")
    det32 = StreamingDetector(cfg32, model, res.params, res.state,
                              fusion_params, nap_stats=stats)
    tick32 = det32.score_queues(
        src.force_q.snapshot(), src.hand_q.snapshot(),
        src.depth_q.snapshot(), det_mfcc, nap=True)
    via_batch32 = det32.score_batch(x, nap=True)
    np.testing.assert_allclose(tick32, via_batch32, rtol=1e-5)


def _mic_frames(cfg, src):
    from icra2021_multimodal_ad_tpu.ops.mfcc import mfcc_from_int16_chunks

    return mfcc_from_int16_chunks(src.mic_q.snapshot(), cfg,
                                  length=cfg.batch_size / 10.0)


def test_guard_fast_serving_reuse_and_return_scores():
    """nap_accuracy_guard(fast_serving=..., return_scores=True): the guard
    certifies the CALLER's bundle and hands back its fast-path scores, so
    eval CLIs (full_test.py) score the batch twice total (fp32 + fast)
    instead of three times; an fp32 bundle is rejected as unguardable."""
    from icra2021_multimodal_ad_tpu.ops.serving import nap_accuracy_guard

    cfg, model, params, state, stats, x = _trained_with_stats()
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    bundle = make_serving(cfg16, model, params, state, nap_stats=stats)
    rel, s_fast = nap_accuracy_guard(cfg16, model, params, state, stats,
                                     x[:64], tol=0.2,
                                     fast_serving=bundle,
                                     return_scores=True)
    assert rel < 0.2, rel
    # the returned scores ARE the certified bundle's own scores
    np.testing.assert_allclose(
        s_fast, np.asarray(bundle.score_nap_windows(jnp.asarray(x[:64]))),
        rtol=1e-6)

    fp32 = make_serving(cfg, model, params, state, nap_stats=stats)
    with pytest.raises(ValueError, match="no low-precision path"):
        nap_accuracy_guard(cfg, model, params, state, stats, x[:64],
                           fast_serving=fp32)

def test_fp32_int8_nap_combo_end_to_end():
    """compute_dtype=float32 + nap_quant=int8: exact fp32 diff extraction
    feeding the int8 whitening matmul — honored consistently by
    make_serving, nap_accuracy_guard, and StreamingDetector (the detector
    used to silently fall back to exact fp32 NAP and the live guard to
    no-op for this combo, diverging from the exported artifact)."""
    from icra2021_multimodal_ad_tpu.data.streaming import StreamingDetector
    from icra2021_multimodal_ad_tpu.ops.serving import (
        _nap_score_int8_xla,
        nap_accuracy_guard,
    )

    cfg, model, params, state, stats, x = _trained_with_stats()
    cfg8 = cfg.replace(nap_quant="int8")  # compute_dtype stays float32
    bundle = make_serving(cfg8, model, params, state, nap_stats=stats)
    assert bundle.nap_int8 is not None
    assert bundle.compute_dtype == jnp.float32
    xq = jnp.asarray(x[:32])
    scores = np.asarray(bundle.score_nap_windows(xq))

    # reference: EXACT fp32 diffs -> the bundle's int8 whitening
    d = jnp.concatenate(get_diffs_for(cfg8, model, params, state, xq),
                        axis=-1)
    ref = np.asarray(_nap_score_int8_xla(bundle.nap_int8, d))
    np.testing.assert_allclose(scores, ref, rtol=1e-6)

    # the guard certifies the combo — and accepts the bundle itself
    rel = nap_accuracy_guard(cfg8, model, params, state, stats, x[:64],
                             tol=0.05, fast_serving=bundle)
    assert rel < 0.05, rel

    # StreamingDetector honors it (score_batch routes through the bundle)
    det = StreamingDetector(cfg8, model, params, state, fusion_params=None,
                            nap_stats=stats)
    det_scores = det.score_batch(xq, nap=True)
    np.testing.assert_allclose(det_scores, scores, rtol=1e-6)


def test_guard_fast_serving_kind_mismatch_raises():
    """The guard must refuse a fast_serving bundle whose quantization path
    is not the one the resolved nap_quant names — otherwise it certifies
    (and reports) a path it never measured."""
    from icra2021_multimodal_ad_tpu.ops.serving import nap_accuracy_guard

    cfg, model, params, state, stats, x = _trained_with_stats()
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    bf16_bundle = make_serving(cfg16, model, params, state, nap_stats=stats)
    with pytest.raises(ValueError, match="same config"):
        nap_accuracy_guard(cfg16.replace(nap_quant="int8"), model, params,
                           state, stats, x[:16], fast_serving=bf16_bundle)
    int8_bundle = make_serving(cfg16.replace(nap_quant="int8"), model,
                               params, state, nap_stats=stats)
    with pytest.raises(ValueError, match="same config"):
        nap_accuracy_guard(cfg16, model, params, state, stats, x[:16],
                           fast_serving=int8_bundle)


def _sensor_payloads(B, seed=3):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(0, 256, (B, 3, 32, 32)), jnp.uint8),
        jnp.asarray(rng.integers(0, 256, (B, 1, 32, 32)), jnp.uint8),
        jnp.asarray(rng.uniform(0, 400, (B, 1)), jnp.float32),
        jnp.asarray(rng.uniform(-30, 30, (B, 1, 13)), jnp.float32),
    )


def test_score_sensor_native_payloads_match_host_normalized():
    """score_sensor takes NATIVE uint8 camera payloads + newtons + MFCC
    frames and normalizes on device; fp32 must reproduce score_raw on the
    equivalently-normalized tensors bit-for-bit (fixed-range normalization
    of integer values is exact), bf16 within the serving tolerance."""
    from icra2021_multimodal_ad_tpu.ops.fusion import normalize_mods

    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    r, d, t, m = _sensor_payloads(8)
    rn, dn, tn, mn = jax.jit(normalize_mods)(r, d, t, m)

    fp32 = make_serving(cfg, model, params, state,
                        fusion_params=fusion_params)
    s_sensor = np.asarray(fp32.score_sensor(r, d, t, m))
    s_raw = np.asarray(fp32.score_raw(r=rn, d=dn, t=tn, m=mn))
    assert s_sensor.shape == (8,)
    np.testing.assert_array_equal(s_sensor, s_raw)

    bf16 = make_serving(cfg.replace(compute_dtype="bfloat16"),
                        model, params, state, fusion_params=fusion_params)
    s16 = np.asarray(bf16.score_sensor(r, d, t, m))
    rel = np.abs(s16 - s_sensor) / (np.abs(s_sensor) + 1e-6)
    assert rel.mean() < 5e-2, rel.mean()

    # fused windows of the sensor path == fuse(normalize) exactly (fp32)
    x_sensor = np.asarray(fp32.fuse_sensor(r, d, t, m))
    from icra2021_multimodal_ad_tpu.ops.fusion import fuse

    x_ref = np.asarray(fuse(fusion_params, sensor="All",
                            r=rn, d=dn, t=tn, m=mn))
    np.testing.assert_array_equal(x_sensor, x_ref)


def test_score_nap_sensor_matches_windows_path():
    """score_nap_sensor == fuse_sensor -> score_nap_windows (same stats,
    same precision) — the NAP form of the native-payload entry."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit

    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    r, d, t, m = _sensor_payloads(12, seed=5)
    rng = np.random.default_rng(6)
    fit_x = jnp.asarray(rng.normal(size=(96, 1728)), jnp.float32)
    cat = jnp.concatenate(diffs_batch(model, params, state, fit_x), axis=-1)
    stats = nap_fit(cat)

    serving = make_serving(cfg, model, params, state,
                           fusion_params=fusion_params, nap_stats=stats)
    s1 = np.asarray(serving.score_nap_sensor(r, d, t, m))
    s2 = np.asarray(serving.score_nap_windows(serving.fuse_sensor(r, d, t, m)))
    assert s1.shape == (12,)
    np.testing.assert_array_equal(s1, s2)


def test_mesh_score_sensor_matches_single_device():
    """Mesh-sharded score_sensor must equal the single-device scores on a
    NON-divisible batch: the pad rows are edge-REPLICATED (zero rows would
    shift the batch-global mic min-max and perturb real rows — the exact
    failure this test guards)."""
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    mesh = get_mesh(8)
    r, d, t, m = _sensor_payloads(37, seed=7)  # 37 % 8 != 0
    # make row 0 NOT the batch min/max carrier so replication is exercised
    # on a row whose values genuinely lie inside the range
    m = m.at[0].set(0.0)

    single = make_serving(cfg, model, params, state,
                          fusion_params=fusion_params)
    sharded = make_serving(cfg, model, params, state,
                           fusion_params=fusion_params, mesh=mesh)
    s1 = np.asarray(single.score_sensor(r, d, t, m))
    sm = np.asarray(sharded.score_sensor(r, d, t, m))
    assert sm.shape == (37,)
    np.testing.assert_allclose(sm, s1, rtol=2e-4, atol=1e-6)


def test_exported_sensor_scorer_matches_live_pipeline():
    """The ingestion-native artifact (uint8 frames + newtons + MFCC ->
    normalize -> fuse -> score) must reproduce the live
    score_sensor / score_nap_sensor at each certified precision — the
    robot-side deployable form of the uint8 path, with the seeded fusion
    projection baked in."""
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit
    from icra2021_multimodal_ad_tpu.ops.serving import (
        export_sensor_scorer,
        load_scorer,
    )

    cfg, model, params, state = _setup()
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    r, d, t, m = _sensor_payloads(16, seed=9)
    rng = np.random.default_rng(10)
    fit_x = jnp.asarray(rng.normal(size=(96, 1728)), jnp.float32)
    stats = nap_fit(jnp.concatenate(
        diffs_batch(model, params, state, fit_x), axis=-1))

    # BASE: fp32 artifact is bit-exact vs the live one-program path
    fp32 = make_serving(cfg, model, params, state,
                        fusion_params=fusion_params, nap_stats=stats)
    scorer = load_scorer(export_sensor_scorer(fp32, 16, op="base"))
    np.testing.assert_allclose(
        np.asarray(scorer(r, d, t, m)),
        np.asarray(fp32.score_sensor(r, d, t, m)), rtol=1e-6)

    # NAP at fp32, bf16, and int8 — the artifact must ship the same
    # precision path the guard certifies (shared _nap_from_fused dispatch)
    for dtype_name, quant, rtol in (("float32", None, 1e-4),
                                    ("bfloat16", None, 5e-3),
                                    ("bfloat16", "int8", 5e-3)):
        serving = make_serving(cfg.replace(compute_dtype=dtype_name),
                               model, params, state,
                               fusion_params=fusion_params,
                               nap_stats=stats, nap_quant=quant)
        s = load_scorer(export_sensor_scorer(serving, 16, op="nap"))
        np.testing.assert_allclose(
            np.asarray(s(r, d, t, m)),
            np.asarray(serving.score_nap_sensor(r, d, t, m)),
            rtol=rtol, atol=1e-6, err_msg=f"{dtype_name}/{quant}")

    # contract guards: no fusion frontend / bad op are clear errors
    bare = make_serving(cfg, model, params, state, nap_stats=stats)
    with pytest.raises(ValueError, match="fusion_params"):
        export_sensor_scorer(bare, 4, op="base")
    with pytest.raises(ValueError, match="op must be"):
        export_sensor_scorer(fp32, 4, op="sap")
