"""Fusion frontend + image + MFCC ops.

Fusion oracle: stock torch convs assembled per the reference's architecture
(utils/data_loaders.py:152-229) with weights copied from our params — checks
that one batched XLA conv program reproduces the per-sample torch loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from icra2021_multimodal_ad_tpu.ops import image as I
from icra2021_multimodal_ad_tpu.ops import mfcc as A
from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init


@pytest.fixture(scope="module")
def params():
    return fusion_init(jax.random.PRNGKey(0))


def _torch_conv2d(p, stride, padding):
    w = torch.from_numpy(np.asarray(p["w"]))
    conv = nn.Conv2d(w.shape[1], w.shape[0], w.shape[2], stride=stride,
                     padding=padding)
    conv.weight.data = w
    conv.bias.data = torch.from_numpy(np.asarray(p["b"]))
    return conv


def _torch_conv1d(p, stride, padding):
    w = torch.from_numpy(np.asarray(p["w"]))
    conv = nn.Conv1d(w.shape[1], w.shape[0], w.shape[2], stride=stride,
                     padding=padding)
    conv.weight.data = w
    conv.bias.data = torch.from_numpy(np.asarray(p["b"]))
    return conv


def _torch_fused(params, r, d, t, m):
    """Reference HSR_Net forward (per-sample loop, data_loaders.py:180-229)
    rebuilt from stock torch ops."""
    c1r = _torch_conv2d(params.rgb1, 2, 0)
    c2r = _torch_conv2d(params.rgb2, 1, 1)
    c3r = _torch_conv2d(params.rgb3, 2, 0)
    c1d = _torch_conv2d(params.dep1, 2, 0)
    c2d = _torch_conv2d(params.dep2, 1, 1)
    c3d = _torch_conv2d(params.dep3, 2, 0)
    c1l = _torch_conv1d(params.lid1, 9, 9)
    c2l = _torch_conv1d(params.lid2, 2, 0)

    outs = []
    with torch.no_grad():
        for i in range(r.shape[0]):
            rr = F.relu(c3r(F.relu(c2r(F.relu(c1r(r[i : i + 1]))))))
            dd = F.relu(c3d(F.relu(c2d(F.relu(c1d(d[i : i + 1]))))))
            tt = t[i].repeat(1, 1, 8, 8)
            mm = F.relu(c2l(F.relu(c1l(m[i : i + 1]))))
            mm = mm.view(-1, 2, 8, 1).repeat(1, 1, 1, 8)
            outs.append(torch.cat((rr, dd, tt, mm), dim=1))
    return torch.cat(outs, 0).view(r.shape[0], -1).numpy()


def test_fused_all_matches_torch_loop(params):
    rng = np.random.default_rng(0)
    B = 4
    r = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)
    d = rng.normal(size=(B, 1, 32, 32)).astype(np.float32)
    t = rng.normal(size=(B, 1)).astype(np.float32)
    m = rng.normal(size=(B, 1, 13)).astype(np.float32)

    ours = np.asarray(
        fuse(params, sensor="All", r=jnp.asarray(r), d=jnp.asarray(d),
             t=jnp.asarray(t), m=jnp.asarray(m))
    )
    ref = _torch_fused(
        params, torch.from_numpy(r), torch.from_numpy(d),
        torch.from_numpy(t), torch.from_numpy(m),
    )
    assert ours.shape == (B, 1728)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_unimodal_feature_widths(params):
    """Sensor -> feature width table (utils/data_loaders.py:16-29)."""
    rng = np.random.default_rng(1)
    B = 3
    cases = {
        "hand_camera": (1024, dict(r=rng.normal(size=(B, 3, 32, 32)))),
        "head_depth": (512, dict(d=rng.normal(size=(B, 1, 32, 32)))),
        "force_torque": (64, dict(t=rng.normal(size=(B, 1)))),
        "mic": (128, dict(m=rng.normal(size=(B, 1, 13)))),
        "LiDAR": (2048, dict(l=rng.normal(size=(B, 1, 963)))),
    }
    for sensor, (width, kw) in cases.items():
        kw = {k: jnp.asarray(v.astype(np.float32)) for k, v in kw.items()}
        out = fuse(params, sensor=sensor, **kw)
        assert out.shape == (B, width), sensor


def test_fusion_is_seeded_and_reproducible():
    p1 = fusion_init(jax.random.PRNGKey(7))
    p2 = fusion_init(jax.random.PRNGKey(7))
    x = jnp.ones((2, 1))
    np.testing.assert_array_equal(
        np.asarray(fuse(p1, sensor="force_torque", t=x)),
        np.asarray(fuse(p2, sensor="force_torque", t=x)),
    )


# -- image ops ---------------------------------------------------------------


def test_resize_nearest_matches_torch_interpolate():
    x = np.random.default_rng(2).normal(size=(2, 3, 24, 32)).astype(np.float32)
    ours = np.asarray(I.resize_nearest(jnp.asarray(x), 32, 32))
    ref = F.interpolate(torch.from_numpy(x), size=(32, 32), mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref)


def test_norm_minmax_per_column_matches_reference_numpy():
    v = np.random.default_rng(3).normal(size=(20, 5)).astype(np.float32)
    v[:, 2] = 1.0  # constant column -> 0/0 -> nan -> 0
    ours = np.asarray(I.norm_minmax_per_column(jnp.asarray(v)))
    lo, hi = v.min(0), v.max(0)
    with np.errstate(invalid="ignore"):
        ref = np.nan_to_num((v - lo) / (hi - lo))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert np.all(ours[:, 2] == 0)


def test_norm_minmax_global_fixed_range():
    v = np.array([[0.0, 127.5, 255.0]], dtype=np.float32)
    out = np.asarray(I.norm_minmax_global(jnp.asarray(v), in_lo=0.0, in_hi=255.0))
    np.testing.assert_allclose(out, [[-1.0, 0.0, 1.0]], atol=1e-6)


# -- MFCC ---------------------------------------------------------------------


def test_dct_matrix_matches_scipy():
    from scipy.fft import dct as scipy_dct

    x = np.random.default_rng(4).normal(size=(128, 7)).astype(np.float64)
    d = A.dct_matrix(13, 128).astype(np.float64)
    ours = d @ x
    ref = scipy_dct(x, type=2, axis=0, norm="ortho")[:13]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)


def test_mel_filterbank_properties():
    fb = A.mel_filterbank(44100, 4410, 128)
    assert fb.shape == (128, 2206)
    # every filter is nonnegative with exactly one contiguous support region
    assert np.all(fb >= 0)
    assert np.all(fb.sum(axis=1) > 0)
    # Slaney normalization: peak ~ 2/bandwidth -> integral over Hz ~ 1
    df = 44100 / 2 / 2205
    areas = fb.sum(axis=1) * df
    assert np.all((areas > 0.5) & (areas < 1.5))


def test_melspectrogram_framing_and_parseval():
    # a pure tone must concentrate energy at the right mel bin
    sr, nfft = 44100, 4410
    tvec = np.arange(sr) / sr  # 1 second -> 11 frames
    y = np.sin(2 * np.pi * 2000.0 * tvec).astype(np.float32)
    S = np.asarray(A.melspectrogram(jnp.asarray(y), n_fft=nfft, hop=nfft))
    assert S.shape == (128, 11)
    fb = A.mel_filterbank(sr, nfft, 128)
    # find the mel filter whose peak frequency is nearest 2 kHz
    freqs = np.linspace(0, sr / 2, 2206)
    peak_bins = freqs[np.argmax(fb, axis=1)]
    expect = np.argmin(np.abs(peak_bins - 2000.0))
    got = np.argmax(S.mean(axis=1))
    assert abs(int(got) - int(expect)) <= 1


def test_power_to_db_ref_max_and_topdb():
    S = jnp.asarray(np.array([[1e-12, 1.0, 100.0]], dtype=np.float32))
    db = np.asarray(A.power_to_db(S))
    assert db.max() == pytest.approx(0.0, abs=1e-3)    # ref = max
    assert db.min() == pytest.approx(-80.0, abs=1e-3)  # top_db floor
    assert db[0, 1] == pytest.approx(-20.0, abs=1e-3)  # 10*log10(1/100)


def test_mfcc_from_wave_contract():
    y = np.random.default_rng(5).normal(size=44100).astype(np.float32)
    m = A.mfcc_from_wave(y)
    assert m.shape == (11, 13)  # time-major (concatdata_maker.py:36-37)
    assert np.all(np.isfinite(m))


def test_mfcc_frame_count_matches_librosa_for_odd_nfft():
    """The ETL path (sr=22050, 0.1 s windows) has an ODD n_fft (2205):
    librosa's centered frame count is 1 + (len + 2*(n_fft//2) - n_fft)//hop,
    one fewer than 1 + len//hop when hop divides len."""
    y = np.zeros(22050, dtype=np.float32)
    m = A.mfcc_from_wave(y, sr=22050)
    assert m.shape == (10, 13)  # librosa gives 10 frames here, not 11
    # even n_fft (the realtime 44.1k path) is unchanged
    m44 = A.mfcc_from_wave(np.zeros(44100, dtype=np.float32), sr=44100)
    assert m44.shape == (11, 13)


def test_mfcc_realtime_chunks_trim():
    class Cfg:
        batch_size = 10

    rng = np.random.default_rng(6)
    chunks = [rng.integers(-3000, 3000, 1024, dtype=np.int16).tobytes()
              for _ in range(90)]  # ~2.09 s of audio
    m = A.mfcc_from_int16_chunks(chunks, Cfg, length=1.0)
    assert m.shape == (10, 13)


def test_mfcc_device_variant_matches_host_variant():
    """The streaming tick's ONE-dispatch device MFCC
    (mfcc_from_int16_chunks_device: mel + power_to_db + DCT fused into a
    single program, result left on device) must produce the host
    variant's values on a window-aligned ring — same ops, one program
    boundary instead of three."""
    class Cfg:
        batch_size = 10

    rng = np.random.default_rng(7)
    # window-aligned ring: 12 chunks x 4410 samples (one 0.1 s window
    # each) — the device variant's compile-bounding floor is a no-op here
    chunks = [rng.integers(-3000, 3000, 4410, dtype=np.int16).tobytes()
              for _ in range(12)]
    host = A.mfcc_from_int16_chunks(chunks, Cfg, length=1.0)
    dev = A.mfcc_from_int16_chunks_device(chunks, Cfg, length=1.0)
    import jax

    assert isinstance(dev, jax.Array)  # stays on device (no host fetch)
    # one fused program vs three separate programs: XLA fuses the mel
    # matmul / max-reduce / DCT differently, shifting fp32 LSBs (~1e-5
    # on O(1) mfcc values) — tight-but-not-bitwise is the contract
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-4, atol=1e-4)
    # starvation guard behaves like the host variant
    import pytest

    with pytest.raises(ValueError, match="wait for source.ready"):
        A.mfcc_from_int16_chunks_device(chunks[:2], Cfg, length=1.0)


def test_mfcc_device_variant_floors_to_whole_windows():
    """On an UNALIGNED ring the device variant consumes only the last
    whole number of 0.1 s windows (compile bounding: one program per
    steady chunk-size regime) — values must equal the host pipeline run
    on the floored wave, and the consumed length must be identical for
    ring totals that differ by less than one window."""
    class Cfg:
        batch_size = 10

    rng = np.random.default_rng(8)
    chunks = [rng.integers(-3000, 3000, 1024, dtype=np.int16).tobytes()
              for _ in range(90)]  # 92160 samples: NOT a multiple of 4410
    dev = np.asarray(A.mfcc_from_int16_chunks_device(chunks, Cfg,
                                                     length=1.0))
    y = np.frombuffer(b"".join(chunks), np.int16).astype(np.float32)
    yf = y[len(y) - (len(y) // 4410) * 4410:]
    want = A.mfcc_from_wave(yf, 44100)[-Cfg.batch_size:]
    np.testing.assert_allclose(dev, want, rtol=1e-4, atol=1e-4)
    # a ring whose total stays inside the same window bucket floors to
    # the SAME consumed suffix (same compiled program, bit-identical
    # output) even though extra old samples were prepended
    extra = rng.integers(-3000, 3000, 400, dtype=np.int16).tobytes()
    dev2 = np.asarray(A.mfcc_from_int16_chunks_device([extra] + chunks,
                                                      Cfg, length=1.0))
    np.testing.assert_array_equal(dev2, dev)
