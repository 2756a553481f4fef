"""RaPP diff extraction + BASE/SAP/NAP scoring contracts.

Oracle: a direct numpy re-derivation of the pathway semantics
(reconstruction_aggregation.py:6-37) driven through our own layer applies,
plus closed-form checks of the score definitions (utils/metric.py:132-238).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models import (
    ae_forward,
    ae_init,
    build_autoencoder,
    fc_module_apply_taps,
)
from icra2021_multimodal_ad_tpu.ops import (
    get_d_loss,
    get_d_norm_loss,
    get_diffs,
    get_recon_loss,
)
from icra2021_multimodal_ad_tpu.ops.scoring import (
    NapStats,
    concat_diffs,
    load_nap_stats,
    nap_fit,
    nap_score_from_diffs,
    save_nap_stats,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(input_size=24, btl_size=6, n_layers=3, seed=0)
    model = build_autoencoder(cfg)
    params, state = ae_init(jax.random.PRNGKey(0), model)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 24)).astype(np.float32)
    return cfg, model, params, state, x


def test_get_diffs_shapes_and_semantics(setup):
    cfg, model, params, state, x = setup
    diffs = get_diffs(x, model, params, state)
    assert len(diffs) == cfg.n_layers + 1
    assert diffs[0].shape == (40, 24)
    # manual pathway: diffs[i+1] = enc_taps(x_hat)[i] - enc_taps(x)[i]
    x_hat, _ = ae_forward(model, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(diffs[0]), np.asarray(x_hat) - x, rtol=1e-5, atol=1e-6
    )
    taps_x, _ = fc_module_apply_taps(
        model.encoder, params["encoder"], state["encoder"], jnp.asarray(x),
        train=False,
    )
    taps_h, _ = fc_module_apply_taps(
        model.encoder, params["encoder"], state["encoder"], x_hat, train=False
    )
    for i in range(cfg.n_layers):
        np.testing.assert_allclose(
            np.asarray(diffs[i + 1]),
            np.asarray(taps_h[i]) - np.asarray(taps_x[i]),
            rtol=1e-4, atol=1e-5,
        )


def test_get_diffs_chunked_equals_full(setup):
    cfg, model, params, state, x = setup
    full = get_diffs(x, model, params, state)
    chunked = get_diffs(x, model, params, state, batch_size=7)  # 40 = 5*7+5
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_base_score_definition(setup):
    cfg, model, params, state, x = setup
    diffs = get_diffs(x, model, params, state)
    label = np.zeros(40, bool)
    label[:10] = True
    rep = get_recon_loss(diffs[0], diffs[0], label)
    np.testing.assert_allclose(
        rep.score, (np.asarray(diffs[0]) ** 2).mean(axis=1), rtol=1e-5
    )


def test_sap_score_definition(setup):
    cfg, model, params, state, x = setup
    diffs = get_diffs(x, model, params, state)
    label = np.zeros(40, bool)
    label[:10] = True
    rep = get_d_loss(diffs, diffs, diffs, label)
    cat = np.concatenate([np.asarray(d) for d in diffs], axis=-1)
    np.testing.assert_allclose(rep.score, (cat**2).mean(axis=1), rtol=1e-5)


def test_nap_score_properties(setup):
    cfg, model, params, state, x = setup
    train_diffs = get_diffs(x, model, params, state)
    # anomalies: perturbed inputs
    x_anom = x + np.random.default_rng(1).normal(size=x.shape).astype(np.float32) * 3
    test_x = np.concatenate([x[:20], x_anom[:20]])
    test_diffs = get_diffs(test_x, model, params, state)
    label = np.r_[np.zeros(20, bool), np.ones(20, bool)]

    rep = get_d_norm_loss(train_diffs, train_diffs, test_diffs, label,
                          save_stats_path=None)
    # anomalous rows must score far above normal rows -> near-perfect AUROC
    assert rep.auroc > 0.95
    assert rep.score.shape == (40,)
    # NAP on the training distribution itself: whitened coords have unit
    # variance, so the mean score over train rows ~ 1
    stats = nap_fit(concat_diffs(train_diffs))
    train_scores = np.asarray(nap_score_from_diffs(stats, train_diffs))
    assert 0.5 < train_scores.mean() < 1.5


def test_layer_range_slicing(setup):
    cfg, model, params, state, x = setup
    diffs = get_diffs(x, model, params, state)
    label = np.zeros(40, bool)
    label[:5] = True
    # start beyond range clamps to last layer (utils/metric.py:155-159)
    rep = get_d_loss(diffs, diffs, diffs, label, start_layer_index=99)
    np.testing.assert_allclose(
        rep.score, (np.asarray(diffs[-1]) ** 2).mean(axis=1), rtol=1e-5
    )


def test_nap_effective_stats_idempotent(setup):
    """Re-flooring already-floored stats must be a no-op — the +inf
    variance sentinels previously made floor=inf, silently collapsing
    every score on a rebuilt serving bundle to 0.0."""
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        nap_effective_stats,
        nap_fit,
        nap_score_device,
    )

    rng = np.random.default_rng(0)
    # degenerate fit (rows < dims) so the floor actually zeroes directions
    cat = jnp.asarray(rng.normal(size=(20, 64)), jnp.float32)
    stats = nap_fit(cat)
    once = nap_effective_stats(stats, 1e-6)
    twice = nap_effective_stats(once, 1e-6)
    np.testing.assert_array_equal(np.asarray(once.standardizer.var),
                                  np.asarray(twice.standardizer.var))
    s1 = np.asarray(nap_score_device(once, cat))
    s2 = np.asarray(nap_score_device(twice, cat))
    np.testing.assert_array_equal(s1, s2)
    assert np.any(s1 != 0.0)


def test_scoring_rejects_unknown_kwargs_but_tolerates_gpu_id(setup):
    """The reference passes gpu_id (tolerated); any other stray kwarg —
    e.g. method= instead of config.nap_fit_method — must raise instead of
    silently running the default path."""
    import pytest

    from icra2021_multimodal_ad_tpu.ops.scoring import (
        get_d_loss,
        get_d_norm_loss,
    )

    diffs = tuple(jnp.asarray(np.random.default_rng(1).normal(size=(12, d)),
                              jnp.float32) for d in (6, 4))
    label = np.random.default_rng(2).integers(0, 2, 12).astype(bool)
    get_d_loss(diffs, diffs, diffs, label, gpu_id=0)  # parity: tolerated
    with pytest.raises(TypeError, match="method"):
        get_d_norm_loss(diffs, diffs, diffs, label, method="gram")
    with pytest.raises(TypeError, match="start_layer"):
        get_d_loss(diffs, diffs, diffs, label, start_layer=1)


def test_nap_stats_roundtrip(tmp_path, setup):
    cfg, model, params, state, x = setup
    diffs = get_diffs(x, model, params, state)
    stats = nap_fit(concat_diffs(diffs))
    path = str(tmp_path / "stats.npz")
    save_nap_stats(path, stats)
    loaded = load_nap_stats(path)
    s1 = np.asarray(nap_score_from_diffs(stats, diffs))
    s2 = np.asarray(nap_score_from_diffs(loaded, diffs))
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
