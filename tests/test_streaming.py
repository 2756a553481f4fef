"""Streaming inference: ring buffers, realtime loader contract, simulator +
detector loop, anomaly visibility in the BASE score trace."""

import jax
import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.data.streaming import (
    RingBuffer,
    SimulatedSensors,
    StreamingDetector,
    get_realtime_dataloader,
)
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fusion_init


def _cfg(**kw):
    cfg = Config(sensor="All", batch_size=10, n_layers=3, btl_size=16,
                 verbose=0, **kw)
    return cfg.replace(input_size=get_input_size(cfg))


def test_ring_buffer_maxlen_and_snapshot():
    rb = RingBuffer(3)
    for i in range(5):
        rb.append(i)
    assert rb.snapshot() == [2, 3, 4]
    assert rb.full
    snap = rb.snapshot()
    rb.append(9)
    assert snap == [2, 3, 4]  # snapshot is a copy


def test_simulator_fills_buffers():
    src = SimulatedSensors(batch_size=10, seed=0)
    src.fill()
    assert src.ready()
    assert len(src.force_q.snapshot()) == 10
    # the sample-budgeted mic ring keeps at least (batch+1) windows of
    # audio (readiness) and at most the budget + one chunk (memory bound)
    samples = sum(len(c) // 2 for c in src.mic_q.snapshot())
    need = src._MIC_WINDOW_SAMPLES * 11
    assert need <= samples <= src.mic_q._budget + 2048


def test_realtime_dataloader_shape():
    cfg = _cfg()
    src = SimulatedSensors(batch_size=10, seed=1)
    # mic ring holds 3x batch chunks; fill enough for >= 1.0 s of audio
    for _ in range(12):
        src.tick()
    x = get_realtime_dataloader(
        cfg, fusion_init(jax.random.PRNGKey(0)),
        src.force_q.snapshot(), src.hand_q.snapshot(),
        src.depth_q.snapshot(), src.mic_q.snapshot(),
    )
    assert x.shape == (10, 1728)
    assert np.isfinite(np.asarray(x)).all()


def _collect_normal_windows(cfg, fusion_params, n_ticks=25, seed=7):
    """Gather fused windows from the simulator's normal regime (the
    training-set analog of the robot's no-drop episodes)."""
    src = SimulatedSensors(batch_size=cfg.batch_size, seed=seed)
    for _ in range(12):
        src.tick()
    rows = []
    for _ in range(n_ticks):
        src.tick()
        rows.append(np.asarray(get_realtime_dataloader(
            cfg, fusion_params,
            src.force_q.snapshot(), src.hand_q.snapshot(),
            src.depth_q.snapshot(), src.mic_q.snapshot(),
        )))
    return np.concatenate(rows, axis=0)


def test_streaming_detector_trained_model_anomaly_raises_score():
    """With a TRAINED model the anomaly must raise the BASE score — a
    directional assertion with margin, not just 'the trace changed'
    (realtime_tester.py:291-309 intent: score spikes on the drop)."""
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = _cfg(n_epochs=12, lr=3e-3, seed=0)
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    windows = _collect_normal_windows(cfg, fusion_params)
    n_valid = len(windows) // 5
    res = NoveltyDetecter(cfg.replace(batch_size=64)).train(
        model, params, state, windows[n_valid:], windows[:n_valid]
    )

    det = StreamingDetector(cfg, model, res.params, res.state, fusion_params)
    src = SimulatedSensors(batch_size=10, seed=2)
    src.fill()
    anomaly_after = 12
    trace = det.run(
        src, n_ticks=24,
        tick_hook=lambda i: src.tick(anomaly=i >= anomaly_after),
    )
    assert trace.shape == (24, 10)
    pre = trace[2:anomaly_after].mean()
    post = trace[-5:].mean()
    # direction AND margin: the drop signature must raise the trained
    # model's reconstruction error decisively
    assert post > 2.0 * pre, (pre, post)

    stats = det.latency_stats()
    assert stats["ticks"] == 24
    assert stats["p50_ms"] > 0

    # NAP streaming on the same trained model: same direction
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    stats_nap = nap_fit(concat_diffs(
        get_diffs(windows[n_valid:], model, res.params, res.state)
    ))
    det_nap = StreamingDetector(cfg, model, res.params, res.state,
                                fusion_params, nap_stats=stats_nap)
    src2 = SimulatedSensors(batch_size=10, seed=4)
    src2.fill()
    trace_nap = det_nap.run(
        src2, n_ticks=24, nap=True,
        tick_hook=lambda i: src2.tick(anomaly=i >= anomaly_after),
    )
    assert trace_nap[-5:].mean() > 2.0 * trace_nap[2:anomaly_after].mean()


def test_run_waits_for_cold_buffers_then_scores():
    """A cold source (empty ring buffers) must not be scored — run() waits
    for source.ready() while tick_hook fills the buffers, then scores
    exactly n_ticks batches (the reference spins on its deque lengths
    before the loop, realtime_tester.py:236-244)."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(0)))
    src = SimulatedSensors(batch_size=10, seed=5)  # NOT filled
    trace = det.run(src, n_ticks=3, tick_hook=lambda i: src.tick())
    assert trace.shape == (3, 10)
    assert np.isfinite(trace).all()


def test_pipelined_run_trace_identical_to_sequential():
    """pipelined=True changes only the fetch schedule: the score trace is
    bit-identical to the sequential run on the same deterministic source,
    every tick is latency-accounted, and on_tick indices arrive in order
    (one tick late by contract, flushed at the end)."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    fp = fusion_init(jax.random.PRNGKey(0))

    def run(pipelined):
        det = StreamingDetector(cfg, model, params, state, fp)
        src = SimulatedSensors(batch_size=10, seed=5)
        src.fill(12)
        seen = []
        trace = det.run(src, n_ticks=6, pipelined=pipelined,
                        tick_hook=lambda i: src.tick(),
                        on_tick=lambda i, s: seen.append(i))
        return trace, seen, det.latency_stats()

    seq, seen_seq, _ = run(False)
    pipe, seen_pipe, stats = run(True)
    np.testing.assert_array_equal(pipe, seq)
    assert pipe.shape == (6, 10)
    assert seen_pipe == seen_seq == list(range(6))
    assert stats["ticks"] == 6  # every dispatch latency-accounted


def test_latency_stats_reflect_most_recent_run():
    """run() resets the latency accumulator: back-to-back sequential and
    pipelined runs on ONE detector must not mix their ticks (the warm-up
    drop is per-mode, and percentiles across modes would skew both)."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(0)))
    for pipelined in (False, True):
        src = SimulatedSensors(batch_size=10, seed=5)
        src.fill(12)
        det.run(src, n_ticks=4, pipelined=pipelined,
                tick_hook=lambda i: src.tick())
        stats = det.latency_stats()
        assert stats["ticks"] == 4  # not cumulative across runs
        assert np.isfinite(stats["p50_ms"])


def test_pipelined_run_nap_path():
    """Pipelining composes with the NAP tick (same dispatch_queues program
    selection as the sequential path)."""
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    cfg = _cfg()
    model, params, state = get_model(cfg)
    fp = fusion_init(jax.random.PRNGKey(0))
    xfit = np.random.default_rng(0).normal(
        0, 1, (64, cfg.input_size)).astype(np.float32)
    stats = nap_fit(concat_diffs(get_diffs(xfit, model, params, state)))

    def run(pipelined):
        det = StreamingDetector(cfg, model, params, state, fp,
                                nap_stats=stats)
        src = SimulatedSensors(batch_size=10, seed=3)
        src.fill(12)
        return det.run(src, n_ticks=4, nap=True, pipelined=pipelined,
                       tick_hook=lambda i: src.tick())

    np.testing.assert_array_equal(run(True), run(False))


def test_run_raises_when_buffers_never_fill():
    from icra2021_multimodal_ad_tpu.data.orchestration import SensorTimeout

    cfg = _cfg()
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(0)))
    src = SimulatedSensors(batch_size=10, seed=5)  # never filled
    with pytest.raises(SensorTimeout):
        det.run(src, n_ticks=1, connection_timeout_s=0.05)
    # no tick was scored — stats must report that, not crash on an empty
    # percentile (the real error would otherwise be masked)
    assert det.latency_stats()["ticks"] == 0


def test_warmup_tolerates_healthy_slow_fill():
    """A source that keeps APPENDING but needs many periods to fill must
    not be aborted by the warm-up (the abort condition is silence, not
    total fill time)."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(1)))
    src = SimulatedSensors(batch_size=10, seed=6)  # cold
    trace = det.run(src, n_ticks=2, connection_timeout_s=0.5,
                    tick_hook=lambda i: src.tick())
    assert trace.shape == (2, 10)


def test_ready_requires_enough_audio_for_batch():
    """Full image/force rings with a nearly-empty mic queue are NOT ready:
    fewer than batch_size MFCC frames would produce mismatched modality
    rows (the crash the gate exists to prevent)."""
    from icra2021_multimodal_ad_tpu.data.streaming import SensorSource

    src = SensorSource(batch_size=4)
    rng = np.random.default_rng(0)
    for _ in range(4):
        src.force_q.append(210.0)
        src.hand_q.append(np.zeros((32, 32, 3), np.uint8))
        src.depth_q.append(np.zeros((32, 32), np.float32))
    src.mic_q.append(rng.integers(-10, 10, 2048, dtype=np.int16).tobytes())
    assert not src.ready()  # one chunk != 4 windows of audio
    need = src._MIC_WINDOW_SAMPLES * 5  # (batch+1) windows, int16 samples
    src.mic_q.append(np.zeros(need, dtype=np.int16).tobytes())
    assert src.ready()


def test_window_batch_resizes_full_resolution_frames():
    """A real camera pushes full-resolution frames; the loader resizes to
    32x32 like the reference's subscriber-side cv2.resize
    (realtime_tester.py:121-130)."""
    from icra2021_multimodal_ad_tpu.data.streaming import hsr_window_batch

    cfg = _cfg().replace(batch_size=4)
    rng = np.random.default_rng(0)
    x = hsr_window_batch(
        cfg, fusion_init(jax.random.PRNGKey(0)),
        [210.0] * 4,
        [rng.uniform(0, 255, (480, 640, 3)) for _ in range(4)],
        [rng.uniform(0, 255, (480, 640)) for _ in range(4)],
        rng.normal(size=(4, 13)),
    )
    assert x.shape == (4, 1728)
    assert np.isfinite(np.asarray(x)).all()


def test_window_batch_rejects_mismatched_rows():
    from icra2021_multimodal_ad_tpu.data.streaming import hsr_window_batch

    cfg = _cfg()
    with pytest.raises(ValueError, match="row counts"):
        hsr_window_batch(
            cfg, fusion_init(jax.random.PRNGKey(0)),
            [1.0] * 10,
            [np.zeros((32, 32, 3))] * 10,
            [np.zeros((32, 32))] * 10,
            np.zeros((3, 13)),  # mic short
        )


def test_streaming_nap_path():
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    cfg = _cfg()
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))

    # fit NAP stats on a batch of "normal" windows from the simulator
    src = SimulatedSensors(batch_size=10, seed=3)
    for _ in range(12):
        src.tick()
    x = get_realtime_dataloader(
        cfg, fusion_params,
        src.force_q.snapshot(), src.hand_q.snapshot(),
        src.depth_q.snapshot(), src.mic_q.snapshot(),
    )
    stats = nap_fit(concat_diffs(get_diffs(x, model, params, state)))

    det = StreamingDetector(cfg, model, params, state, fusion_params,
                            nap_stats=stats)
    scores = det.score_batch(x, nap=True)
    assert scores.shape == (10,)
    assert np.isfinite(scores).all()


def test_ready_reachable_for_any_chunk_size_and_batch():
    """The mic ring is bounded by SAMPLES, not chunk count: ready() must be
    reachable for batch_size < 3 (the reference's 3x-batch deque could
    never hold (batch+1) windows there — warm-up hung forever, ADVICE r1)
    AND for publishers pushing small mono chunks (1024 samples), where any
    fixed chunk-count cap starves readiness too (review r2)."""
    from icra2021_multimodal_ad_tpu.data.streaming import SensorSource

    rng = np.random.default_rng(0)
    for b, chunk_samples in [(1, 2048), (2, 2048), (10, 1024), (1, 256)]:
        src = SensorSource(batch_size=b)
        for _ in range(b):
            src.force_q.append(210.0)
            src.hand_q.append(np.zeros((32, 32, 3), np.uint8))
            src.depth_q.append(np.zeros((32, 32), np.float32))
        for _ in range(2000):
            if src.ready():
                break
            src.mic_q.append(
                rng.integers(-5, 5, chunk_samples, np.int16).tobytes()
            )
        assert src.ready(), f"batch={b} chunk={chunk_samples} never ready"
        # and the ring stays memory-bounded near its budget
        samples = sum(len(c) // 2 for c in src.mic_q.snapshot())
        assert samples <= src.mic_q._budget + chunk_samples


def test_small_batch_warmup_completes_and_scores():
    """End-to-end: a batch_size=2 detector warm-up must terminate (it hung
    before the ring fix) and score real ticks."""
    cfg = _cfg().replace(batch_size=2)
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(0)))
    src = SimulatedSensors(batch_size=2, seed=8)
    trace = det.run(src, n_ticks=2, connection_timeout_s=2.0,
                    tick_hook=lambda i: src.tick())
    assert trace.shape == (2, 2)
    assert np.isfinite(trace).all()


def test_tick_hook_sees_each_index_exactly_once():
    """Warm-up iterations must not replay the same hook index: hooks that
    count or rate-limit by the index argument need one-call-per-index
    semantics (ADVICE r1, streaming.py:311)."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    det = StreamingDetector(cfg, model, params, state,
                            fusion_init(jax.random.PRNGKey(0)))
    src = SimulatedSensors(batch_size=10, seed=9)  # cold: needs warm-up
    seen = []

    def hook(i):
        seen.append(i)
        src.tick()

    det.run(src, n_ticks=2, connection_timeout_s=2.0, tick_hook=hook)
    assert seen == list(range(len(seen)))  # strictly sequential, no dups
    assert len(seen) >= 2  # warm-up iterations included


def test_starved_mic_queue_raises_clear_error():
    """A mic queue holding less audio than the window batch needs must
    raise a clear ValueError pointing at ready(), not surface later as an
    opaque fusion shape error (VERDICT r1 item 7)."""
    from icra2021_multimodal_ad_tpu.ops.mfcc import mfcc_from_int16_chunks

    cfg = _cfg()
    src = SimulatedSensors(batch_size=10, seed=10)
    src.tick()  # one tick: ~0.116 s of audio << the 1.0 s the batch needs
    with pytest.raises(ValueError, match="ready"):
        get_realtime_dataloader(
            cfg, fusion_init(jax.random.PRNGKey(0)),
            src.force_q.snapshot(), src.hand_q.snapshot(),
            src.depth_q.snapshot(), src.mic_q.snapshot(),
        )
    # strict=False restores the reference's print-and-proceed behavior
    # (utils/data_loaders.py:688-691) for deliberate partial-audio scoring
    out = mfcc_from_int16_chunks(src.mic_q.snapshot(), cfg, length=1.0,
                                 strict=False)
    assert out.shape[1] == 13


def test_one_program_tick_matches_two_step_path():
    """score_queues (the ONE-dispatch tick the run() loop uses) must
    reproduce the two-step hsr_window_batch + score_batch path for every
    scorer configuration: BASE fp32/bf16, NAP fp32 (exact, un-floored
    stats), NAP bf16 (serving semantics: variance-floored stats +
    mixed-precision diffs)."""
    from icra2021_multimodal_ad_tpu.data.streaming import (
        hsr_window_batch,
    )
    from icra2021_multimodal_ad_tpu.ops.mfcc import mfcc_from_int16_chunks
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    cfg = _cfg()
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(0))
    src = SimulatedSensors(batch_size=cfg.batch_size, seed=3)
    for _ in range(12):
        src.tick()
    force_q = src.force_q.snapshot()
    hand_q = src.hand_q.snapshot()
    depth_q = src.depth_q.snapshot()
    mic_frames = mfcc_from_int16_chunks(
        src.mic_q.snapshot(), cfg, length=cfg.batch_size / 10.0)
    x = hsr_window_batch(cfg, fusion_params, force_q, hand_q, depth_q,
                         mic_frames)
    rng = np.random.default_rng(0)
    fit_x = jax.numpy.asarray(
        rng.normal(size=(64, cfg.input_size)), jax.numpy.float32)
    stats = nap_fit(concat_diffs(get_diffs(fit_x, model, params, state)))

    for dtype_name in ("float32", "bfloat16"):
        c = cfg.replace(compute_dtype=dtype_name)
        det = StreamingDetector(c, model, params, state, fusion_params,
                                nap_stats=stats)
        for nap in (False, True):
            want = det.score_batch(x, nap=nap)
            got = det.score_queues(force_q, hand_q, depth_q, mic_frames,
                                   nap=nap)
            np.testing.assert_allclose(
                got, want, rtol=2e-4, atol=1e-6,
                err_msg=f"dtype={dtype_name} nap={nap}")


def test_run_guard_tol_gates_low_precision_streaming(capsys):
    """guard_tol on run(): a low-precision NAP stream is certified against
    fp32 on the first live snapshot (prints the measured rel err), an
    impossible tolerance aborts before any tick is trusted, and exact fp32
    runs treat the flag as a no-op."""
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = _cfg(n_epochs=10, lr=3e-3, seed=0,
               compute_dtype="bfloat16", nap_quant="int8")
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    windows = _collect_normal_windows(cfg, fusion_params, n_ticks=15)
    res = NoveltyDetecter(cfg.replace(batch_size=64)).train(
        model, params, state, windows[30:], windows[:30])
    stats = nap_fit(concat_diffs(
        get_diffs(windows[30:], model, res.params, res.state)))

    det = StreamingDetector(cfg, model, res.params, res.state,
                            fusion_params, nap_stats=stats)
    src = SimulatedSensors(batch_size=10, seed=3)
    src.fill()
    trace = det.run(src, n_ticks=3, nap=True, guard_tol=0.25,
                    tick_hook=lambda i: src.tick())
    assert trace.shape == (3, 10)
    out = capsys.readouterr().out
    assert "serving guard (int8 NAP vs fp32, live batch)" in out

    # impossible tolerance: abort before streaming
    src2 = SimulatedSensors(batch_size=10, seed=3)
    src2.fill()
    det2 = StreamingDetector(cfg, model, res.params, res.state,
                             fusion_params, nap_stats=stats)
    with pytest.raises(ValueError, match="rel err"):
        det2.run(src2, n_ticks=3, nap=True, guard_tol=1e-12,
                 tick_hook=lambda i: src2.tick())

    # exact fp32: nothing to guard, flag is a no-op
    cfg32 = _cfg(seed=0)
    det32 = StreamingDetector(cfg32, model, res.params, res.state,
                              fusion_params, nap_stats=stats)
    src3 = SimulatedSensors(batch_size=10, seed=3)
    src3.fill()
    trace32 = det32.run(src3, n_ticks=2, nap=True, guard_tol=1e-12,
                        tick_hook=lambda i: src3.tick())
    assert trace32.shape == (2, 10)


def test_guard_live_missing_nap_stats_clear_error():
    """A bf16 NAP run with guard_tol but no persisted NapStats surfaces the
    streaming path's clear diagnostic, not an obscure 'score_nap needs
    nap_stats' from deep inside the guard's internal bundle."""
    cfg = _cfg(seed=0, compute_dtype="bfloat16")
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    det = StreamingDetector(cfg, model, params, state, fusion_params,
                            nap_stats=None)
    src = SimulatedSensors(batch_size=10, seed=3)
    src.fill()
    with pytest.raises(ValueError, match="NAP streaming needs persisted"):
        det.run(src, n_ticks=1, nap=True, guard_tol=0.5,
                tick_hook=lambda i: src.tick())

def test_mic_ring_full_is_sample_readiness():
    """MicRing.full must reflect the SAMPLE threshold, not the inherited
    deque len==maxlen predicate (always False on an unbounded deque) —
    callers applying the .full readiness idiom of the other three rings to
    mic_q would otherwise conclude the mic never fills."""
    from icra2021_multimodal_ad_tpu.data.streaming import MicRing

    src = SimulatedSensors(batch_size=4, seed=0)
    assert not src.mic_q.full
    src.fill()
    while not src.mic_q.full:
        src.tick()
    # full <-> ready()'s audio requirement: (batch+1) MFCC windows
    assert src.mic_q.sample_count() >= src._MIC_WINDOW_SAMPLES * 5
    assert src.ready()

    ring = MicRing(1000)  # standalone default: full at the eviction budget
    assert not ring.full
    ring.append(np.zeros(1000, np.int16).tobytes())
    assert ring.full


def test_guard_live_certifies_cached_bundle(monkeypatch):
    """_guard_live must certify the EXACT cached serving bundle the ticks
    score with (fast_serving=self._nap_serving()), not a rebuilt twin —
    a twin duplicates device prep per process start and certifies
    different array instances than the ones streaming."""
    from icra2021_multimodal_ad_tpu.ops import serving as serving_mod
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    cfg = _cfg(seed=0, compute_dtype="bfloat16")
    model, params, state = get_model(cfg)
    fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
    windows = _collect_normal_windows(cfg, fusion_params, n_ticks=12)
    stats = nap_fit(concat_diffs(get_diffs(windows, model, params, state)))
    det = StreamingDetector(cfg, model, params, state, fusion_params,
                            nap_stats=stats)
    src = SimulatedSensors(batch_size=10, seed=3)
    src.fill()

    seen = {}
    real = serving_mod.nap_accuracy_guard

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(serving_mod, "nap_accuracy_guard", spy)
    det.run(src, n_ticks=1, nap=True, guard_tol=1e9,
            tick_hook=lambda i: src.tick())
    assert seen.get("fast_serving") is det._nap_serving()


def test_uint8_rings_score_bit_identical_to_fp32_rings():
    """_stack_host_inputs keeps the camera rings' native uint8 dtype (4x
    smaller host->device transfer); the device-side fixed-range
    normalization must make the scores BIT-identical to fp32-stacked rings
    of the same values."""
    from icra2021_multimodal_ad_tpu.data.streaming import _stack_host_inputs
    from icra2021_multimodal_ad_tpu.ops.mfcc import mfcc_from_int16_chunks

    cfg = _cfg()
    model, params, state = get_model(cfg)
    fp = fusion_init(jax.random.PRNGKey(0))
    det = StreamingDetector(cfg, model, params, state, fusion_params=fp)

    src = SimulatedSensors(batch_size=cfg.batch_size, seed=3)
    for _ in range(12):
        src.tick()
    force_q = src.force_q.snapshot()
    hand_q = src.hand_q.snapshot()
    depth_q = src.depth_q.snapshot()
    mic_frames = mfcc_from_int16_chunks(src.mic_q.snapshot(), cfg,
                                        length=cfg.batch_size / 10.0)
    assert hand_q[0].dtype == np.uint8  # the simulator publishes uint8

    r, d, t, m = _stack_host_inputs(cfg, force_q, hand_q, depth_q,
                                    mic_frames)
    assert r.dtype == np.uint8 and d.dtype == np.uint8

    s_u8 = det.score_queues(force_q, hand_q, depth_q, mic_frames)
    s_f32 = det.score_queues(force_q,
                             [h.astype(np.float32) for h in hand_q],
                             [dd.astype(np.float32) for dd in depth_q],
                             mic_frames)
    np.testing.assert_array_equal(s_u8, s_f32)
