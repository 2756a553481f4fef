"""Whitening transforms vs the reference semantics (utils/normalize.py):
Standardizer uses unbiased diag covariance; Rotater projects centered data
onto right singular vectors; Truncater rank-k reconstructs and re-adds mu."""

import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.ops import normalize as N


def _data(n=64, d=12, seed=0):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


def test_standardizer_matches_npcov():
    x = _data()
    stats = N.standardizer_fit(x)
    np.testing.assert_allclose(np.asarray(stats.mu), x.mean(0), rtol=1e-5)
    # reference: np.cov(xc.T).diagonal() == unbiased variance
    ref_var = np.cov((x - x.mean(0)).T).diagonal()
    np.testing.assert_allclose(np.asarray(stats.var), ref_var, rtol=1e-4)
    out = np.asarray(N.standardizer_run(stats, x))
    ref = (x - x.mean(0)) / np.sqrt(ref_var)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)


def test_rotater_projection_is_valid_svd_rotation():
    x = _data(128, 16, 1)
    stats = N.rotater_fit(x)
    v = np.asarray(stats.v)
    # v columns orthonormal
    np.testing.assert_allclose(v.T @ v, np.eye(v.shape[1]), atol=1e-4)
    rotated = np.asarray(N.rotater_run(stats, x))
    xc = x - x.mean(0)
    # projection preserves norms (rotation) and diagonalizes covariance
    np.testing.assert_allclose(
        np.linalg.norm(rotated, axis=1), np.linalg.norm(xc, axis=1), rtol=1e-4
    )
    cov = np.cov(rotated.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-3
    # variance sorted descending (singular values ordered)
    dv = np.diag(cov)
    assert np.all(np.diff(dv) < 1e-3)


def test_rotater_matches_torch_svd_projection():
    torch = pytest.importorskip("torch")
    x = _data(96, 10, 2)
    stats = N.rotater_fit(x)
    ours = np.asarray(N.rotater_run(stats, x))

    xt = torch.from_numpy(x)
    mu = xt.mean(dim=0)
    xc = xt - mu
    _, _, v = torch.svd(xc)
    ref = (xc @ v).numpy()
    # singular vector signs are arbitrary; compare |.| and the NAP-relevant
    # quadratic form
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        (ours**2).mean(axis=1), (ref**2).mean(axis=1), rtol=1e-4
    )


def test_truncater_rank_k_reconstruction():
    x = _data(80, 8, 3)
    stats = N.rotater_fit(x)
    full = np.asarray(N.truncater_run(stats, x, trunc=8))
    np.testing.assert_allclose(full, x, rtol=1e-3, atol=1e-4)
    rank2 = np.asarray(N.truncater_run(stats, x, trunc=2))
    # rank-2 reconstruction error should be the optimal (PCA) one
    xc = x - x.mean(0)
    u, s, vh = np.linalg.svd(xc, full_matrices=False)
    best = (u[:, :2] * s[:2]) @ vh[:2] + x.mean(0)
    np.testing.assert_allclose(rank2, best, rtol=1e-3, atol=1e-4)
    # trunc<=0 returns input unchanged (utils/normalize.py:111-112)
    out = N.truncater_run(stats, x, trunc=0)
    np.testing.assert_allclose(np.asarray(out), x)


def test_oo_wrappers():
    x = _data(50, 6, 4)
    r = N.Rotater().fit(x)
    s = N.Standardizer().fit(r.run(x))
    z = np.asarray(s.run(r.run(x)))
    assert z.shape == x.shape
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(0, ddof=1), 1, rtol=1e-3)


def test_gram_fit_matches_svd_fit_on_healthy_spectrum():
    """rotater_fit_gram (Gram + eigh) must reproduce the SVD fit's whitening
    on a well-conditioned matrix: same per-direction variances, same NAP
    scores within fp32 tolerance, same sign convention."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops.normalize import (
        rotater_fit,
        rotater_fit_gram,
        rotater_run,
    )
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        nap_fit,
        nap_score_device,
    )

    rng = np.random.default_rng(0)
    # anisotropic but well-conditioned: distinct singular values
    scales = np.linspace(0.5, 4.0, 96)
    x = jnp.asarray(rng.normal(size=(4096, 96)) * scales, jnp.float32)
    test = jnp.asarray(rng.normal(size=(256, 96)) * scales, jnp.float32)

    svd = rotater_fit(x)
    gram = rotater_fit_gram(x)
    np.testing.assert_allclose(np.asarray(gram.mu), np.asarray(svd.mu),
                               rtol=1e-6)
    # same whitening directions (up to tolerance) under the sign convention
    np.testing.assert_allclose(np.abs(np.asarray(gram.v)),
                               np.abs(np.asarray(svd.v)),
                               atol=5e-3)

    s_svd = nap_score_device(nap_fit(x, method="svd"), test)
    s_gram = nap_score_device(nap_fit(x, method="gram"), test)
    np.testing.assert_allclose(np.asarray(s_gram), np.asarray(s_svd),
                               rtol=1e-3)


def test_gram_fit_runs_sharded_without_gather():
    """With row-sharded input, the Gram contraction reduces over the mesh
    (per-shard partials + all-reduce) — the distributed-Gram alternative to
    gathering the diffs (SURVEY.md §5)."""
    import jax
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops.normalize import rotater_fit_gram
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh, shard_batch

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)
    ref = rotater_fit_gram(x)
    sharded = rotater_fit_gram(shard_batch(get_mesh(8), x))
    np.testing.assert_allclose(np.asarray(sharded.v), np.asarray(ref.v),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded.mu), np.asarray(ref.mu),
                               atol=1e-6)


def test_gram_fit_truncates_to_thin_svd_rank():
    """With fewer rows than columns the Gram fit must match the thin SVD's
    (d, min(n, d)) column contract — the full eigenbasis would standardize
    exact-null directions with ~1e-13 variances (review finding)."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops.normalize import (
        rotater_fit,
        rotater_fit_gram,
    )
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit

    x = jnp.asarray(np.random.default_rng(0).normal(size=(20, 64)),
                    jnp.float32)
    svd = rotater_fit(x)
    gram = rotater_fit_gram(x)
    assert svd.v.shape == (64, 20)
    assert gram.v.shape == (64, 20)
    stats = nap_fit(x, method="gram")
    assert stats.standardizer.var.shape == (20,)
