"""Audio features: mel spectrogram -> power_to_db -> MFCC, as device GEMMs.

Capability parity with the reference's librosa pipeline
(concatdata_maker.py:15-49 offline, utils/data_loaders.py:676-701 realtime):

    S      = melspectrogram(y, sr=44100, n_mels=128, n_fft=hop=0.1s)
    log_S  = power_to_db(S, ref=max)        # global max, top_db=80
    mfcc   = dct(log_S, type=II, norm=ortho)[:13].T   # time-major

librosa semantics replicated natively (librosa is not a dependency):
  * STFT: centered (reflect-pad n_fft//2), hann window (periodic,
    fftbins=True), win_length = n_fft, power-2 magnitude.
  * mel filterbank: htk=False (Slaney mel scale: linear below 1 kHz,
    log-spaced above), norm='slaney' (2 / bandwidth area normalization).
  * power_to_db(ref=np.max): 10*log10(max(S, 1e-10)) relative to the global
    max, floored at (max - 80 dB).
  * MFCC: DCT-II orthonormal over the mel axis, first n_mfcc rows.

TPU-native design: framing is a reshape (the reference always uses
hop == n_fft), the FFT is XLA's native rfft, and the mel projection and DCT
are two matmuls that land on the MXU.  The filterbank/DCT matrices are
compile-time constants.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SR = 44100
N_MELS = 128
N_MFCC = 13


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney scale
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore", invalid="ignore"):
        log_branch = min_log_mel + np.log(f / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int = SR, n_fft: int = 4410, n_mels: int = N_MELS,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-normalized triangular filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@lru_cache(maxsize=4)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in): scipy.fftpack.dct(norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    m[0] *= 1.0 / np.sqrt(2.0)
    return (m * np.sqrt(1.0 / (2.0 * n_in))).astype(np.float32)


@lru_cache(maxsize=4)
def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop", "sr", "n_mels"))
def melspectrogram(y: jax.Array, n_fft: int = 4410, hop: int = 4410,
                   sr: int = SR, n_mels: int = N_MELS) -> jax.Array:
    """Power mel spectrogram, (n_mels, n_frames).  Requires hop == n_fft
    (the only configuration the reference uses: window_size == stride == 0.1s,
    concatdata_maker.py:29-31), which turns framing into a reshape."""
    if hop != n_fft:
        raise NotImplementedError("framework uses hop == n_fft (0.1 s grid)")
    y = y.astype(jnp.float32)
    pad = n_fft // 2
    # right pad covers the last centered frame even for odd n_fft
    y_p = jnp.pad(y, (pad, n_fft - pad), mode="reflect")
    # librosa's centered frame count: 1 + (len + 2*(n_fft//2) - n_fft)//hop
    # (for odd n_fft this is one FEWER than 1 + len//hop when hop | len)
    n_frames = 1 + (y.shape[0] + 2 * pad - n_fft) // hop
    frames = y_p[: n_frames * n_fft].reshape(n_frames, n_fft)
    window = jnp.asarray(_hann_periodic(n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2  # (n_frames, n_bins)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.dot(power, fb.T, precision=jax.lax.Precision.HIGHEST).T


@jax.jit
def power_to_db(S: jax.Array, top_db: float = 80.0) -> jax.Array:
    """librosa.power_to_db(ref=np.max) — global-max reference."""
    amin = 1e-10
    ref = jnp.maximum(jnp.max(S), amin)
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin)) - 10.0 * jnp.log10(ref)
    return jnp.maximum(log_spec, jnp.max(log_spec) - top_db)


@partial(jax.jit, static_argnames=("n_mfcc",))
def mfcc_from_log_mel(log_S: jax.Array, n_mfcc: int = N_MFCC) -> jax.Array:
    """(n_mfcc, n_frames) from a (n_mels, n_frames) log-mel spectrogram."""
    d = jnp.asarray(dct_matrix(n_mfcc, log_S.shape[0]))
    return jnp.dot(d, log_S, precision=jax.lax.Precision.HIGHEST)


def mfcc_from_wave(y, sr: int = SR, window_size: float = 0.1,
                   stride: float = 0.1, n_mfcc: int = N_MFCC) -> np.ndarray:
    """Wave -> time-major (n_frames, n_mfcc) MFCC matrix
    (concatdata_maker.py:15-49 contract, including the transpose)."""
    y = jnp.asarray(np.asarray(y, dtype=np.float32))
    nfft = int(round(sr * window_size))
    hop = int(round(sr * stride))
    S = melspectrogram(y, n_fft=nfft, hop=hop, sr=sr)
    log_S = power_to_db(S)
    return np.asarray(mfcc_from_log_mel(log_S, n_mfcc).T)


@partial(jax.jit, static_argnames=("n_fft", "hop", "sr", "n_mfcc"))
def _mfcc_wave_one_program(y: jax.Array, n_fft: int, hop: int, sr: int,
                           n_mfcc: int) -> jax.Array:
    """melspectrogram -> power_to_db -> DCT as ONE device program,
    (n_frames, n_mfcc) time-major.  The offline mfcc_from_wave issues the
    three stages as separate dispatches (kept as-is: the ETL feature cache
    and oracle parity are keyed on its exact program boundaries); the
    streaming tick uses this fused single-dispatch form — over the
    tunneled device each extra dispatch is a full RTT on the tick's
    critical path."""
    S = melspectrogram(y, n_fft=n_fft, hop=hop, sr=sr)
    return mfcc_from_log_mel(power_to_db(S), n_mfcc).T


def _wave_from_chunks(chunks, config, length: float, stride: float,
                      strict: bool) -> np.ndarray:
    """Join raw int16 byte chunks into one fp32 wave, with the shared
    starvation guard: fewer than `length` seconds of samples raises a
    clear ValueError (strict) instead of surfacing later as an opaque
    fusion shape error; strict=False restores the reference's behavior of
    printing a warning and proceeding (data_loaders.py:688-691)."""
    y = np.frombuffer(b"".join(chunks), dtype=np.int16).astype(np.float32)
    if len(y) < SR * length:
        msg = (f"mic queue holds {len(y) / SR:.3f} s of audio but the "
               f"window batch needs {length} s ({config.batch_size} frames "
               f"at {stride} s) — wait for source.ready() before scoring")
        if strict:
            raise ValueError(msg)
        print(msg)
    return y


def mfcc_from_int16_chunks_device(chunks, config, length: float,
                                  window_size: float = 0.1,
                                  stride: float = 0.1,
                                  strict: bool = True) -> jax.Array:
    """mfcc_from_int16_chunks, but ONE device dispatch and NO host fetch:
    returns the trimmed (batch_size, n_mfcc) frames as a DEVICE array, so
    a caller feeding them into another device program (the streaming tick)
    chains device-side — the tunneled link then pays a single result fetch
    per tick instead of an MFCC fetch + re-upload.  Same values as the
    host variant on a window-aligned ring (same ops, one program; pinned
    by tests/test_fusion_pipeline.py).

    Compile bounding: the jitted program is shape-specialized on len(y),
    and a varying-chunk-size publisher floats the MicRing total within
    [budget, budget + chunk) — one compile per distinct length would put
    a 20-120 s tunnel compile inside the 0.1 s tick loop.  So this
    variant keeps only the LAST whole number of hop windows (drops < one
    0.1 s window of the OLDEST audio): the frame grid's anchor — the
    ring's oldest byte — is an arbitrary chunk boundary that moves on
    every eviction anyway, so the alignment change is within the path's
    existing nondeterminism, and the consumed length becomes constant
    per steady chunk-size regime (exactly one compiled program)."""
    y = _wave_from_chunks(chunks, config, length, stride, strict)
    nfft = int(round(SR * window_size))
    hop = int(round(SR * stride))
    y = y[len(y) - (len(y) // hop) * hop:]
    m = _mfcc_wave_one_program(jnp.asarray(y), nfft, hop, SR, N_MFCC)
    return m[m.shape[0] - config.batch_size:, :]


def mfcc_from_int16_chunks(chunks, config, length: float,
                           window_size: float = 0.1,
                           stride: float = 0.1,
                           strict: bool = True) -> np.ndarray:
    """Realtime variant (utils/data_loaders.py:676-701): raw int16 byte
    chunks -> MFCC, trimmed to the last `batch_size` frames.  Starvation
    guard semantics in _wave_from_chunks (shared with the device
    variant)."""
    y = _wave_from_chunks(chunks, config, length, stride, strict)
    m = mfcc_from_wave(y, SR, window_size, stride)
    return m[len(m) - config.batch_size :, :]
