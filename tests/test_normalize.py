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
