"""Scoring service (ops/score_server): wire protocol, bucketed padding,
parity with the in-process serving bundle, startup guard, error surfaces."""

import time

import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.score_server import (
    ScoreClient,
    ScoreServer,
    _next_bucket,
)


def _cfg(**kw):
    cfg = Config(sensor="force_torque", n_layers=2, btl_size=6, verbose=0,
                 **kw)
    return cfg.replace(input_size=get_input_size(cfg))


@pytest.fixture(scope="module")
def served():
    """One server (fp32, with NAP stats from a random-diff fit) shared by
    the protocol tests; torn down at module end.  The stats are variance-
    floored: an untrained fit's near-null whitened directions amplify
    batch-shape-dependent fp32 LSB differences (bucketed padding compiles
    different shapes than a direct full-batch call) into percent-level
    score noise, which is fit conditioning, not a protocol property."""
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        concat_diffs,
        nap_effective_stats,
        nap_fit,
    )

    cfg = _cfg()
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(0)
    xfit = rng.normal(0, 1, (256, cfg.input_size)).astype(np.float32)
    stats = nap_effective_stats(
        nap_fit(concat_diffs(get_diffs(xfit, model, params, state))), 1e-6)
    server = ScoreServer(cfg, model, params, state, nap_stats=stats,
                         max_batch=32)
    port = server.start()
    yield server, port, cfg
    server.stop()


def test_next_bucket():
    assert _next_bucket(1, 64) == 1
    assert _next_bucket(2, 64) == 2
    assert _next_bucket(3, 64) == 4
    assert _next_bucket(33, 64) == 64
    assert _next_bucket(500, 64) == 64  # capped at max_batch


def test_scores_match_in_process_bundle_across_ragged_sizes(served):
    server, port, cfg = served
    rng = np.random.default_rng(1)
    with ScoreClient(("127.0.0.1", port)) as client:
        for n in (1, 7, 32, 40, 81):  # buckets 1..32 + multi-chunk > max
            x = rng.normal(0, 1, (n, cfg.input_size)).astype(np.float32)
            for op, direct in (
                ("score_base", server.serving.score_fused),
                ("score_sap", server.serving.score_sap_windows),
                ("score_nap", server.serving.score_nap_windows),
            ):
                got = client.score(x, op=op)
                want = np.asarray(direct(x))
                assert got.shape == (n,), (op, n)
                # NAP at 1e-3: the padded-bucket programs compile per
                # shape and XLA's shape-dependent reduction tiling flips
                # fp32 LSBs, which the whitening's 1/std amplifies (up to
                # sqrt(1/floor) = 1e3) — same mechanism, same bound as
                # the mesh-vs-single-device serving tests
                tol = 1e-3 if op == "score_nap" else 1e-5
                np.testing.assert_allclose(
                    got, want, rtol=tol, atol=1e-7,
                    err_msg=f"{op} n={n} diverges from the bundle")


def test_pipelined_client_fifo_parity_and_errors(served):
    """PipelinedScoreClient: replies arrive in submission order and match
    the blocking client per request; a failed request's error surfaces at
    ITS collect() (order preserved), the connection survives, and
    collect() without a submit is a clear client-side error."""
    from icra2021_multimodal_ad_tpu.ops.score_server import (
        PipelinedScoreClient,
    )

    server, port, cfg = served
    rng = np.random.default_rng(5)
    xs = [rng.normal(0, 1, (n, cfg.input_size)).astype(np.float32)
          for n in (3, 8, 5)]
    want = [np.asarray(server.serving.score_fused(x)) for x in xs]
    with PipelinedScoreClient(("127.0.0.1", port)) as c:
        for x in xs:  # depth 3: all in flight before the first collect
            c.submit(x)
        assert c.outstanding == 3
        got = [c.collect() for _ in xs]
        assert c.outstanding == 0
        for g, w, x in zip(got, want, xs):
            assert g.shape == (len(x),)
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-7)

        # interleaved: submit i+1 before collecting i (the streaming use)
        prev = None
        for i, x in enumerate(xs):
            c.submit(x, op="score_nap")
            if prev is not None:
                np.testing.assert_allclose(
                    c.collect(), prev, rtol=1e-3, atol=1e-7)
            prev = np.asarray(server.serving.score_nap_windows(x))
        np.testing.assert_allclose(c.collect(), prev, rtol=1e-3,
                                   atol=1e-7)

        # error stays in order and the connection survives it
        c.submit(xs[0])
        c.submit(np.zeros((2, cfg.input_size + 1), np.float32))
        c.submit(xs[1])
        np.testing.assert_allclose(c.collect(), want[0], rtol=1e-5,
                                   atol=1e-7)
        with pytest.raises(RuntimeError, match="shape"):
            c.collect()
        np.testing.assert_allclose(c.collect(), want[1], rtol=1e-5,
                                   atol=1e-7)

        with pytest.raises(RuntimeError, match="no outstanding"):
            c.collect()


def test_info_and_error_surfaces(served):
    server, port, cfg = served
    with ScoreClient(("127.0.0.1", port)) as client:
        info = client.info()
        assert info["input_size"] == cfg.input_size
        assert info["compute_dtype"] == "float32"
        assert info["has_nap_stats"] is True
        assert set(ScoreServer.OPS) <= set(info["ops"])

        with pytest.raises(RuntimeError, match="unknown op"):
            client.score(np.zeros((2, cfg.input_size), np.float32),
                         op="score_bogus")
        with pytest.raises(RuntimeError, match="shape"):
            client.score(np.zeros((2, cfg.input_size + 1), np.float32))
        # the connection survives an errored request
        out = client.score(np.zeros((2, cfg.input_size), np.float32))
        assert out.shape == (2,)


def test_concurrent_clients_get_consistent_scores(served):
    import threading

    server, port, cfg = served
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (16, cfg.input_size)).astype(np.float32)
    want = np.asarray(server.serving.score_fused(x))
    results, errors = {}, []

    def worker(i):
        try:
            with ScoreClient(("127.0.0.1", port)) as c:
                results[i] = c.score(x)
        except Exception as e:  # noqa: BLE001 — surfaced by the assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    for i, got in results.items():
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7,
                                   err_msg=f"client {i}")


def test_dynamic_batching_coalesces_concurrent_requests(served):
    """Requests that queue while a dispatch is in flight score as ONE
    concatenated device call, with per-request results identical to
    individual scoring.  The in-flight dispatch is simulated by holding
    the server's score lock: a plug request blocks inside _score, the
    K followers pile up in the queue, and releasing the lock lets the
    batcher drain them as a single group."""
    import threading
    import time

    server, port, cfg = served
    rng = np.random.default_rng(4)
    xs = [rng.normal(0, 1, (n, cfg.input_size)).astype(np.float32)
          for n in (3, 5, 2, 7)]
    want = [np.asarray(server.serving.score_fused(x)) for x in xs]
    before = dict(server.batch_stats)
    results, errors = {}, []

    def worker(i, x):
        try:
            with ScoreClient(("127.0.0.1", port)) as c:
                results[i] = c.score(x)
        except Exception as e:  # noqa: BLE001 — surfaced by the assert
            errors.append(e)

    with server._score_lock:  # the "in-flight dispatch"
        plug = threading.Thread(target=worker, args=(99, xs[0][:1]))
        plug.start()
        # wait until the plug request is popped and blocked in _score
        deadline = time.time() + 30
        while (server.batch_stats["requests"] == before["requests"]
               and time.time() < deadline):
            time.sleep(0.01)
        threads = [threading.Thread(target=worker, args=(i, x))
                   for i, x in enumerate(xs)]
        for t in threads:
            t.start()
        # wait until all followers are enqueued behind the plug
        deadline = time.time() + 30
        while len(server._queue) < len(xs) and time.time() < deadline:
            time.sleep(0.01)
        assert len(server._queue) >= len(xs), "followers never queued"
    for t in [plug] + threads:
        t.join(timeout=60)
    assert not errors, errors
    for i, x in enumerate(xs):
        assert results[i].shape == (x.shape[0],)
        np.testing.assert_allclose(results[i], want[i], rtol=1e-5,
                                   atol=1e-7, err_msg=f"request {i}")
    stats = server.batch_stats
    assert stats["coalesced_dispatches"] > before["coalesced_dispatches"]
    assert stats["max_group"] >= len(xs)


def test_batching_off_scores_inline():
    cfg = _cfg()
    model, params, state = get_model(cfg)
    server = ScoreServer(cfg, model, params, state, batching=False)
    port = server.start()
    try:
        assert server._batch_thread is None
        x = np.random.default_rng(5).normal(
            0, 1, (4, cfg.input_size)).astype(np.float32)
        with ScoreClient(("127.0.0.1", port)) as client:
            assert client.info()["batching"] is False
            got = client.score(x)
        np.testing.assert_allclose(
            got, np.asarray(server.serving.score_fused(x)),
            rtol=1e-5, atol=1e-7)
        assert server.batch_stats["requests"] == 0
    finally:
        server.stop()


@pytest.fixture(scope="module")
def native_client(tmp_path_factory):
    """Compile native/score_client.cpp once for the module."""
    import shutil
    import subprocess

    from icra2021_multimodal_ad_tpu.data.native_lib import repo_native_src

    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    exe = tmp_path_factory.mktemp("native") / "score_client"
    subprocess.run(
        ["g++", "-O3", "-std=c++17", repo_native_src("score_client.cpp"),
         "-o", str(exe)],
        check=True, capture_output=True, timeout=120)
    return str(exe)


def test_native_cpp_client_speaks_the_protocol(served, native_client):
    """The C++ binary scores stdin float32 rows against a live server and
    its output matches the in-process bundle byte-for-byte (same device
    program via the same bucket) — the protocol's any-language claim,
    executed."""
    import json
    import subprocess

    server, port, cfg = served
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (9, cfg.input_size)).astype(np.float32)

    info = subprocess.run(
        [native_client, "127.0.0.1", str(port), "info"],
        capture_output=True, timeout=60)
    assert info.returncode == 0, info.stderr.decode()
    meta = json.loads(info.stdout.decode())
    assert meta["input_size"] == cfg.input_size

    for op in ("score_base", "score_sap", "score_nap"):
        run = subprocess.run(
            [native_client, "127.0.0.1", str(port), op,
             str(x.shape[0]), str(x.shape[1])],
            input=x.astype("<f4").tobytes(), capture_output=True,
            timeout=120)
        assert run.returncode == 0, (op, run.stderr.decode())
        got = np.frombuffer(run.stdout, "<f4")
        with ScoreClient(("127.0.0.1", port)) as c:
            want = c.score(x, op=op)
        np.testing.assert_array_equal(got, want, err_msg=op)

    bad = subprocess.run(
        [native_client, "127.0.0.1", str(port), "score_bogus", "2",
         str(cfg.input_size)],
        input=np.zeros((2, cfg.input_size), "<f4").tobytes(),
        capture_output=True, timeout=60)
    assert bad.returncode == 3
    assert b"unknown op" in bad.stderr


def test_nap_without_stats_is_a_clear_request_error():
    cfg = _cfg()
    model, params, state = get_model(cfg)
    server = ScoreServer(cfg, model, params, state, nap_stats=None)
    port = server.start()
    try:
        with ScoreClient(("127.0.0.1", port)) as client:
            assert client.info()["has_nap_stats"] is False
            with pytest.raises(RuntimeError, match="NAP stats"):
                client.score(np.zeros((2, cfg.input_size), np.float32),
                             op="score_nap")
    finally:
        server.stop()


def test_serve_guard_certifies_low_precision_and_noops_fp32():
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, nap_fit

    cfg = _cfg()
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(3)
    xfit = rng.normal(0, 1, (256, cfg.input_size)).astype(np.float32)
    stats = nap_fit(concat_diffs(get_diffs(xfit, model, params, state)))
    probe = xfit[:64]

    fp32 = ScoreServer(cfg, model, params, state, nap_stats=stats)
    assert fp32.serve_guard(probe, tol=1e-9) is None  # nothing to guard

    bf16 = ScoreServer(cfg.replace(compute_dtype="bfloat16"),
                       model, params, state, nap_stats=stats)
    rel = bf16.serve_guard(probe, tol=0.25)
    assert rel is not None and rel < 0.25
    assert bf16.info()["guard_rel_err"] == rel
    with pytest.raises(ValueError, match="rel err"):
        bf16.serve_guard(probe, tol=1e-12)

    # fp32 + int8: the combo has a low-precision NAP path to certify
    int8 = ScoreServer(cfg.replace(nap_quant="int8"),
                       model, params, state, nap_stats=stats)
    rel8 = int8.serve_guard(probe, tol=0.25)
    assert rel8 is not None and rel8 < 0.25


def test_malformed_frames_get_an_error_reply_not_a_dead_thread(served):
    """A garbage length prefix or invalid JSON header must surface as the
    documented {"ok": false} error frame (then a closed connection — the
    stream position can't be trusted), not an unhandled handler-thread
    traceback with no reply."""
    import socket
    import struct

    from icra2021_multimodal_ad_tpu.ops.score_server import _recv_frame

    server, port, cfg = served

    # invalid JSON header (unquoted key), stream fully consumed
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        blob = b'{"op": score_base}\n'
        s.sendall(struct.pack(">I", len(blob)) + blob)
        head, _ = _recv_frame(s)
        assert head["ok"] is False
        assert "JSONDecodeError" in head["error"]
        assert s.recv(1) == b""  # server closed after the reply

    # length prefix above the 1 GiB ceiling — rejected before any read
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        s.sendall(struct.pack(">I", (1 << 30) + 1))
        head, _ = _recv_frame(s)
        assert head["ok"] is False
        assert "ceiling" in head["error"]
        assert s.recv(1) == b""

    # the server is still healthy for well-formed clients
    with ScoreClient(("127.0.0.1", port)) as client:
        out = client.score(np.zeros((2, cfg.input_size), np.float32))
        assert out.shape == (2,)


def test_server_restarts_after_stop():
    """stop()/start() must bring up a working server again (fresh accept
    loop AND batcher), not one that accepts TCP but never serves."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    x = np.random.default_rng(7).normal(
        0, 1, (3, cfg.input_size)).astype(np.float32)
    server = ScoreServer(cfg, model, params, state)
    try:
        port = server.start()
        with ScoreClient(("127.0.0.1", port)) as c:
            first = c.score(x)
        server.stop()
        port = server.start()
        with ScoreClient(("127.0.0.1", port)) as c:
            again = c.score(x)
        np.testing.assert_array_equal(first, again)
    finally:
        server.stop()


def test_dead_batcher_fails_fast_instead_of_hanging():
    """_score_batched must raise when the batcher cannot complete the
    request — whether the server was stopped or the batch thread is
    simply not running — rather than polling forever."""
    cfg = _cfg()
    model, params, state = get_model(cfg)
    x = np.zeros((2, cfg.input_size), np.float32)

    # batching requested but the server (hence the batcher) never started
    cold = ScoreServer(cfg, model, params, state)
    with pytest.raises(ConnectionError, match="batcher is not running"):
        cold._score_batched("score_base", x)

    # stopped server: the stop-specific message
    stopped = ScoreServer(cfg, model, params, state)
    stopped.start()
    stopped.stop()
    with pytest.raises(ConnectionError, match="stopped mid-request"):
        stopped._score_batched("score_base", x)


def test_stop_closes_accepted_connections_across_restart():
    """stop() must terminate accepted client connections: a client blocked
    in the old generation's handler (600 s recv timeout) must NOT be
    silently revived and served by the next start() generation (advisor
    r2).  Each server generation serves only clients that connected to it."""
    import socket as socketlib
    import threading
    import time

    cfg = _cfg()
    model, params, state = get_model(cfg)
    x = np.random.default_rng(9).normal(
        0, 1, (2, cfg.input_size)).astype(np.float32)
    server = ScoreServer(cfg, model, params, state)
    try:
        port = server.start()
        old = ScoreClient(("127.0.0.1", port), timeout_s=10.0)
        old.score(x)  # handler is live and idle in _recv_frame

        server.stop()
        # the old generation's handler count drains to zero (conns closed)
        deadline = time.time() + 5.0
        while time.time() < deadline and server._conns:
            time.sleep(0.02)
        assert not server._conns, "stop() left accepted connections open"

        port2 = server.start()
        # the old client is dead for good — its socket was closed server-
        # side, so the next request fails instead of reaching the new
        # generation
        with pytest.raises((RuntimeError, ConnectionError, OSError,
                            socketlib.timeout)):
            old.score(x)
        old.close()

        # exactly one live batcher after the restart (no rival loops)
        batchers = [t for t in threading.enumerate()
                    if t is server._batch_thread and t.is_alive()]
        assert server._batch_thread is not None and len(batchers) == 1

        with ScoreClient(("127.0.0.1", port2)) as c:
            np.testing.assert_array_equal(
                c.score(x), np.asarray(server.serving.score_fused(x)))
    finally:
        server.stop()


@pytest.fixture(scope="module")
def served_all():
    """A sensor='All' server (fusion frontend rebuilt from config.seed) for
    the raw-sensor-op tests; fp32 + variance-floored NAP stats like
    `served`."""
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        concat_diffs,
        nap_effective_stats,
        nap_fit,
    )

    cfg = Config(sensor="All", n_layers=2, btl_size=6, verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(2)
    xfit = rng.normal(0, 1, (96, cfg.input_size)).astype(np.float32)
    stats = nap_effective_stats(
        nap_fit(concat_diffs(get_diffs(xfit, model, params, state))), 1e-6)
    server = ScoreServer(cfg, model, params, state, nap_stats=stats,
                         max_batch=32)
    port = server.start()
    yield server, port, cfg
    server.stop()


def _sensor_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (n, 3, 32, 32)).astype(np.uint8),
            rng.integers(0, 256, (n, 1, 32, 32)).astype(np.uint8),
            rng.uniform(0, 400, (n, 1)).astype(np.float32),
            rng.uniform(-30, 30, (n, 1, 13)).astype(np.float32))


def test_sensor_ops_match_in_process_bundle(served_all):
    """Raw-sensor ops ship uint8 frames + newtons + MFCC frames; the
    server normalizes/fuses/scores.  Scores must match the in-process
    bundle on NON-bucket sizes too — the pad rows are edge-replicated so
    the per-request mic min-max is untouched."""
    server, port, cfg = served_all
    bundle = server.serving
    assert bundle.fusion_params is not None
    with ScoreClient(("127.0.0.1", port)) as client:
        for n in (1, 7, 31):
            r, d, t, m = _sensor_batch(n, seed=n)
            for op, want in (
                ("score_base_sensor",
                 bundle.score_sensor(r, d, t, m)),
                ("score_sap_sensor",
                 bundle.score_sap_windows(bundle.fuse_sensor(r, d, t, m))),
                ("score_nap_sensor",
                 bundle.score_nap_sensor(r, d, t, m)),
            ):
                got = client.score_sensor(r, d, t, m, op=op)
                np.testing.assert_allclose(
                    got, np.asarray(want), rtol=1e-4, atol=1e-6,
                    err_msg=f"{op} n={n}")


def test_sensor_ops_listed_and_gated_by_fusion(served, served_all):
    """info() advertises SENSOR_OPS only when the server has the fusion
    frontend; a non-All server rejects them with a clear error."""
    _, port_ft, _ = served
    _, port_all, _ = served_all
    with ScoreClient(("127.0.0.1", port_all)) as c:
        assert "score_base_sensor" in c.info()["ops"]
    with ScoreClient(("127.0.0.1", port_ft)) as c:
        assert "score_base_sensor" not in c.info()["ops"]
        r, d, t, m = _sensor_batch(2)
        with pytest.raises(RuntimeError, match="sensor='All'"):
            c.score_sensor(r, d, t, m)


def test_sensor_request_size_and_shape_errors(served_all):
    """Requests above max_batch are refused (a request IS the
    normalization window); mismatched payload sizes get a clear error."""
    server, port, cfg = served_all
    with ScoreClient(("127.0.0.1", port)) as c:
        r, d, t, m = _sensor_batch(server.max_batch + 1)
        with pytest.raises(RuntimeError, match="max_batch"):
            c.score_sensor(r, d, t, m)
        # row-count mismatch across modalities
        r2, d2, t2, m2 = _sensor_batch(4)
        with pytest.raises(RuntimeError, match="rows"):
            c.score_sensor(r2, d2, t2[:3], m2)


def test_pipelined_client_transport_failure_keeps_fifo_accounting():
    """A transport-level failure in collect() must NOT decrement
    outstanding — no reply was consumed, and eager decrementing would
    mis-attribute every later reply by one (the collect() docstring
    contract).  Server-side: a socket that accepts, never replies, and
    holds the connection so the client times out deterministically."""
    import socket as sk
    import threading

    from icra2021_multimodal_ad_tpu.ops.score_server import (
        PipelinedScoreClient,
    )

    srv = sk.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    release = threading.Event()

    def _accept():
        conn, _ = srv.accept()
        release.wait(10)  # hold open, never reply
        conn.close()

    threading.Thread(target=_accept, daemon=True).start()
    try:
        c = PipelinedScoreClient(("127.0.0.1", port), timeout_s=1.0)
        c.submit(np.zeros((1, 4), np.float32))
        assert c.outstanding == 1
        with pytest.raises(OSError):  # recv timeout
            c.collect()
        assert c.outstanding == 1  # unchanged: reply never consumed
        c.close()
    finally:
        release.set()
        srv.close()


def test_pipelined_client_sensor_ops(served_all):
    """submit_sensor/collect: native payloads pipeline with the same FIFO
    contract, matching the blocking score_sensor per request — and window
    and sensor submissions interleave on one connection in order."""
    from icra2021_multimodal_ad_tpu.ops.score_server import (
        PipelinedScoreClient,
    )

    server, port, cfg = served_all
    bundle = server.serving
    batches = [_sensor_batch(n, seed=20 + n) for n in (2, 5, 3)]
    want = [np.asarray(bundle.score_sensor(*b)) for b in batches]
    with PipelinedScoreClient(("127.0.0.1", port)) as c:
        prev = None
        for b, w in zip(batches, want):
            c.submit_sensor(*b)
            if prev is not None:
                np.testing.assert_allclose(c.collect(), prev,
                                           rtol=1e-4, atol=1e-6)
            prev = w
        np.testing.assert_allclose(c.collect(), prev, rtol=1e-4,
                                   atol=1e-6)
        # window + sensor requests interleave FIFO on one connection
        rng = np.random.default_rng(9)
        xw = rng.normal(0, 1, (4, cfg.input_size)).astype(np.float32)
        c.submit(xw)
        c.submit_sensor(*batches[0], op="score_nap_sensor")
        np.testing.assert_allclose(
            c.collect(), np.asarray(bundle.score_fused(xw)),
            rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            c.collect(), np.asarray(bundle.score_nap_sensor(*batches[0])),
            rtol=1e-3, atol=1e-6)


def test_native_cpp_client_sensor_ops(served_all, native_client):
    """The C++ binary ships NATIVE sensor payloads (uint8 frames + f32
    force/MFCC concatenated in _SENSOR_FIELDS wire order) and its scores
    match the Python client byte-for-byte — the robot-host path where the
    4x wire saving matters most, executed through the real binary."""
    import subprocess

    server, port, cfg = served_all
    r, d, t, m = _sensor_batch(5, seed=11)
    blob = (r.tobytes() + d.tobytes()
            + t.astype("<f4").tobytes() + m.astype("<f4").tobytes())
    for op in ("score_base_sensor", "score_sap_sensor", "score_nap_sensor"):
        run = subprocess.run(
            [native_client, "127.0.0.1", str(port), op, "5", "32", "32"],
            input=blob, capture_output=True, timeout=120)
        assert run.returncode == 0, (op, run.stderr.decode())
        got = np.frombuffer(run.stdout, "<f4")
        with ScoreClient(("127.0.0.1", port)) as c:
            want = c.score_sensor(r, d, t, m, op=op)
        np.testing.assert_array_equal(got, want, err_msg=op)

    # missing W argument: usage error before stdin is ever read
    bad = subprocess.run(
        [native_client, "127.0.0.1", str(port), "score_base_sensor",
         "5", "32"],
        input=blob, capture_output=True, timeout=60)
    assert bad.returncode == 1
    assert b"needs N H W" in bad.stderr

    # truncated stdin: read_exact short-reads and dies client-side with
    # the expected-byte-count message, nothing hits the server
    short = subprocess.run(
        [native_client, "127.0.0.1", str(port), "score_base_sensor",
         "5", "32", "32"],
        input=blob[: len(blob) // 2], capture_output=True, timeout=60)
    assert short.returncode == 1
    assert b"payload bytes on stdin" in short.stderr


class _DelayProxy:
    """TCP relay injecting a fixed ONE-WAY delay in each direction — a
    simulated WAN link between a robot host and the scoring service.

    Propagation-delay semantics, not store-and-forward: each received
    chunk is stamped `due = now + delay` and a per-direction sender
    thread forwards it when due, so multiple frames can be IN FLIGHT
    simultaneously (sleeping in the receive loop would serialize the
    link at one frame per delay and erase exactly the overlap the
    pipelined client exists to exploit)."""

    def __init__(self, upstream, delay_s):
        import queue
        import socket as sk
        import threading

        self._sk = sk
        self._queue_mod = queue
        self._threading = threading
        self.upstream = upstream
        self.delay_s = delay_s
        self.listener = sk.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(4)
        self.port = self.listener.getsockname()[1]
        self._socks = []
        self._lock = threading.Lock()
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self.listener.accept()
            except OSError:
                return  # listener closed
            up = self._sk.create_connection(self.upstream, timeout=10)
            with self._lock:
                self._socks += [conn, up]
            self._pipe(conn, up)
            self._pipe(up, conn)

    def _pipe(self, src, dst):
        q = self._queue_mod.Queue()

        def recv():
            while True:
                try:
                    data = src.recv(65536)
                except OSError:
                    data = b""
                q.put((time.perf_counter() + self.delay_s, data))
                if not data:
                    return

        def send():
            while True:
                due, data = q.get()
                time.sleep(max(0.0, due - time.perf_counter()))
                if not data:
                    try:
                        dst.shutdown(self._sk.SHUT_WR)
                    except OSError:
                        pass
                    return
                try:
                    dst.sendall(data)
                except OSError:
                    return

        self._threading.Thread(target=recv, daemon=True).start()
        self._threading.Thread(target=send, daemon=True).start()

    def close(self):
        try:
            self.listener.close()
        except OSError:
            pass
        with self._lock:
            for s in self._socks:
                try:
                    s.close()
                except OSError:
                    pass


def test_pipelined_client_rate_bound_under_injected_latency(served):
    """The PipelinedScoreClient docstring's raison d'être, measured
    (VERDICT r4 weak #6): on a link with real latency, depth-2
    pipelining bounds the steady-state period by max(link RTT, server
    processing) — the blocking client pays RTT + processing per request.
    A delay proxy injects 40 ms each way (RTT 80 ms >> the tiny fp32
    model's processing), so theory says blocking ~ 80 ms + proc and
    pipelined depth-2 ~ (RTT + proc)/2: strictly under both the blocking
    period and the docstring's max() bound.  Scores through the proxy
    stay identical to the direct path (same server, same bytes)."""
    from icra2021_multimodal_ad_tpu.ops.score_server import (
        PipelinedScoreClient,
    )

    server, port, cfg = served
    delay = 0.04
    n = 10
    rng = np.random.default_rng(17)
    x = rng.normal(0, 1, (4, cfg.input_size)).astype(np.float32)
    want = np.asarray(server.serving.score_fused(x))
    proxy = _DelayProxy(("127.0.0.1", port), delay)
    try:
        # blocking client through the delayed link
        with ScoreClient(("127.0.0.1", proxy.port), timeout_s=30) as c:
            np.testing.assert_allclose(  # parity + bucket warm-up
                c.score(x), want, rtol=1e-5, atol=1e-7)
            t0 = time.perf_counter()
            for _ in range(n):
                c.score(x)
            blocking_s = (time.perf_counter() - t0) / n

        # depth-2 pipelined client through the SAME link
        with PipelinedScoreClient(("127.0.0.1", proxy.port),
                                  timeout_s=30) as c:
            c.submit(x)
            c.submit(x)
            np.testing.assert_allclose(c.collect(), want, rtol=1e-5,
                                       atol=1e-7)
            c.submit(x)  # steady state: always 2 outstanding
            t0 = time.perf_counter()
            for _ in range(n):
                c.collect()
                c.submit(x)
            pipelined_s = (time.perf_counter() - t0) / n
            c.collect()
            c.collect()
            assert c.outstanding == 0
    finally:
        proxy.close()

    rtt = 2 * delay
    # sanity: the proxy really delayed the blocking path
    assert blocking_s >= rtt, (blocking_s, rtt)
    proc = blocking_s - rtt
    # the win: strictly faster than blocking (theory: ~2x when RTT
    # dominates; 0.75 leaves room for 1-core scheduling jitter)
    assert pipelined_s < 0.75 * blocking_s, (pipelined_s, blocking_s)
    # the docstring's bound: period <= max(link RTT, processing), with
    # 15 ms of scheduler slack on this 1-core host
    assert pipelined_s <= max(rtt, proc) + 0.015, (
        pipelined_s, rtt, proc)
