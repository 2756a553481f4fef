"""Config CLI surface (new flags incl. VIB + plot paths) and the profiling
utilities (SURVEY.md §5 tracing replacement)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_config
from icra2021_multimodal_ad_tpu.utils.profiling import Timer, timed, trace


def test_cli_parses_vib_and_plot_flags():
    cfg = get_config([
        "--sensor", "force_torque",
        "--distribution", "normal", "--k", "3",
        "--roc_plot_path", "/tmp/r.png",
        "--pr_plot_path", "/tmp/p.png",
        "--train_diffs", "/tmp/d.npz",
    ])
    assert cfg.distribution == "normal" and cfg.k == 3
    assert cfg.roc_plot_path == "/tmp/r.png"
    assert cfg.pr_plot_path == "/tmp/p.png"
    # defaults stay None / identity
    cfg2 = get_config(["--sensor", "force_torque"])
    assert cfg2.distribution is None and cfg2.k == 1
    assert cfg2.roc_plot_path is None


def test_cli_slicing_downgrade_fixup():
    # novelty_detection.py:171-173 intended behavior (`!=`, not `is not`)
    cfg = get_config(["--file_name", "other_sum"])
    assert cfg.slicing_size == 7000
    assert get_config([]).slicing_size == 56000


def test_timer_spans_accumulate():
    t = Timer()
    with t.span("a"):
        jnp.ones((8, 8)).sum()
    with t.span("a"):
        jnp.ones((8, 8)).sum()
    with t.span("b", sync=False):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] > 0
    assert rep["b"]["count"] == 1


def test_timed_excludes_compile():
    """Falsifiable version: a fn whose FIRST call is slow (stand-in for the
    20-120 s tunnel compile) must not leak into the reported mean — if the
    warmup is dropped, dt jumps by the fake compile time and this fails."""
    import time as _time

    calls = {"n": 0}

    def fn(x):
        calls["n"] += 1
        if calls["n"] == 1:
            _time.sleep(0.3)  # "compile"
        return jnp.asarray(x) + 1

    dt = timed(fn, jnp.ones(8), warmup=1, iters=5)
    assert dt < 0.05, dt  # the slow first call was excluded by warmup
    assert calls["n"] == 6

    f = jax.jit(lambda x: (x * x).sum())
    dt2 = timed(f, jnp.ones((256, 256)), warmup=1, iters=3)
    assert 0 < dt2 < 5.0


def test_timed_loop_stats_median_within_spread():
    """timed_loop_stats (the bench's spread instrumentation) returns
    paired-difference samples whose median lies within [min, max], all
    positive, with the requested sample count — and agrees with
    timed_loop's scale on the same body."""
    from icra2021_multimodal_ad_tpu.utils.profiling import (
        timed_loop,
        timed_loop_stats,
    )

    def make_body():
        def body(i, acc):
            x = jnp.full((64, 64), acc + i.astype(jnp.float32))
            return acc + jnp.sum(x @ x) * 1e-20
        return body

    st = timed_loop_stats(make_body, n_iters=4, repeats=3)
    assert st["samples"] == 3
    assert 0 < st["min_s"] <= st["median_s"] <= st["max_s"]
    # The bare timed_loop keeps noise-inverted pairs (clamped to its
    # 1e-9 floor) — measured ~13% of runs on this µs-scale CPU body —
    # which is exactly the failure mode timed_loop_stats discards, so
    # retry until a VALID sample carries the scale cross-check.
    for _ in range(10):
        t = timed_loop(make_body, n_iters=4)
        if t > 1e-8:
            break
    assert t > 1e-8, "timed_loop returned only clamped samples in 10 tries"
    # same compiled programs, same machinery — within an order of magnitude
    assert st["median_s"] < 50 * t and t < 50 * st["median_s"]


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(log_dir):
        found += files
    assert found, "profiler trace produced no files"


def test_multihost_init_is_noop_on_single_host(monkeypatch):
    from icra2021_multimodal_ad_tpu.parallel.distributed import (
        initialize_multihost,
    )

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False


def test_persistent_compile_cache_knob(tmp_path, monkeypatch):
    """CLIs enable the persistent XLA compilation cache (tunnel compiles
    cost 20-120 s per program per invocation without it); opt-out env wins."""
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    monkeypatch.setenv("ICRA_TPU_NO_COMPILE_CACHE", "1")
    assert enable_persistent_cache() is None
    monkeypatch.delenv("ICRA_TPU_NO_COMPILE_CACHE")

    d = str(tmp_path / "cache")
    try:
        assert enable_persistent_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_reconcile_model_config_adopts_checkpoint_fields():
    """Eval CLIs must score with the checkpoint's architecture/seed, not the
    possibly-mismatched flags (a wrong --seed would silently fuse features
    with different projection weights than training used)."""
    from icra2021_multimodal_ad_tpu.config import (
        Config,
        reconcile_model_config,
    )

    cfg = Config(n_layers=5, btl_size=100, seed=0)
    meta = {"config": {"n_layers": 3, "btl_size": 16, "seed": 7,
                       "distribution": "normal", "k": 2,
                       "lr": 0.123}}  # lr is NOT a model-shape field
    out = reconcile_model_config(cfg, meta, verbose=False)
    assert (out.n_layers, out.btl_size, out.seed) == (3, 16, 7)
    assert out.distribution == "normal" and out.k == 2
    assert out.lr == cfg.lr  # non-shape fields keep the CLI values
    # checkpoints without a saved config pass through unchanged
    assert reconcile_model_config(cfg, {}, verbose=False) is cfg


def test_cli_override_matches_flag_for_fixup_fields():
    """get_config(file_name=...) must produce the SAME config as the
    equivalent CLI flag — the slicing_size fixup runs after overrides —
    but an EXPLICIT slicing_size override survives the downgrade."""
    assert get_config([], file_name="other_sum").slicing_size == 7000
    assert get_config([], file_name="other_sum",
                      slicing_size=240).slicing_size == 240
    # a --slicing_size actually typed on the command line is just as
    # explicit as a programmatic override — both survive the downgrade
    assert get_config(["--slicing_size", "240", "--file_name",
                       "other_sum"]).slicing_size == 240
    assert get_config(["--slicing_size=240", "--file_name",
                       "other_sum"]).slicing_size == 240


def test_multihost_init_autodetects_cloud_tpu_pod(monkeypatch):
    """On a Cloud TPU pod (worker env vars present, no explicit
    coordinates), jax.distributed.initialize() runs with no args."""
    import jax

    from icra2021_multimodal_ad_tpu.parallel.distributed import (
        initialize_multihost,
    )

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    assert initialize_multihost() is True
    assert calls == [((), {})]
    # single-worker runtimes also export the var (one entry) — still a no-op
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_multihost() is False


def test_get_mesh_rejects_oversubscription():
    import pytest

    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="devices"):
        get_mesh(n + 1)


def test_multihost_init_passes_env_coordinates(monkeypatch):
    import jax

    from icra2021_multimodal_ad_tpu.parallel.distributed import (
        initialize_multihost,
    )

    calls = {}
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address=None, num_processes=None,
        process_id=None: calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        ),
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert initialize_multihost() is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_param_dtype_knob_builds_bf16_params():
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = Config(sensor="force_torque", n_layers=2, btl_size=4, verbose=0,
                 param_dtype="bfloat16")
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    assert params["encoder"][0]["w"].dtype == jnp.bfloat16
    # BN running stats stay fp32 (accuracy-relevant accumulators)
    assert state["encoder"][0]["bn_mean"].dtype == jnp.float32


def test_distribution_none_is_typable_on_cli():
    cfg = get_config(["--distribution", "none"])
    assert cfg.distribution is None
    cfg2 = get_config(["--distribution", "normal"])
    assert cfg2.distribution == "normal"


def test_multihost_init_env_and_arg_parsing(monkeypatch):
    """Explicit coordinates and the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env triplet must reach
    jax.distributed.initialize with the right types; explicit args beat
    env (SURVEY.md §5 DCN mapping)."""
    import jax

    from icra2021_multimodal_ad_tpu.parallel.distributed import (
        initialize_multihost,
    )

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)

    # env-only
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert initialize_multihost() is True
    assert calls[-1] == ((), {"coordinator_address": "10.0.0.1:1234",
                              "num_processes": 4, "process_id": 2})

    # explicit args override env
    assert initialize_multihost("10.0.0.9:9999", 8, 7) is True
    assert calls[-1] == ((), {"coordinator_address": "10.0.0.9:9999",
                              "num_processes": 8, "process_id": 7})

    # partial env (address only) still initializes — jax derives the rest
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.delenv("JAX_PROCESS_ID")
    assert initialize_multihost() is True
    assert calls[-1][1]["coordinator_address"] == "10.0.0.1:1234"
    assert calls[-1][1]["num_processes"] is None


def test_multihost_two_process_smoke(tmp_path):
    """REAL 2-process jax.distributed bring-up on CPU: both workers
    initialize through initialize_multihost (env triplet), see
    process_count()==2, and agree on a psum across hosts — the DCN leg the
    reference never had, executed rather than mocked."""
    import socket
    import subprocess
    import sys

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import os, sys\n"
        "os.environ.pop('PALLAS_AXON_POOL_IPS', None)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from icra2021_multimodal_ad_tpu.parallel.distributed import (\n"
        "    initialize_multihost,\n"
        ")\n"
        "assert initialize_multihost() is True\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "import jax.numpy as jnp\n"
        "from jax.experimental import multihost_utils\n"
        "val = multihost_utils.process_allgather(\n"
        "    jnp.asarray([float(jax.process_index())]))\n"
        "assert sorted(float(v) for v in val.ravel()) == [0.0, 1.0], val\n"
        "print('worker', jax.process_index(), 'OK')\n"
    )
    def attempt():
        # bind-then-close port picking is inherently racy (another process
        # can grab the port in the window before the coordinator binds it),
        # so each attempt gets a fresh port and failures are retried
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env.pop("XLA_FLAGS", None)
            env.update({
                "JAX_PLATFORMS": "cpu",
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
            })
            procs.append(subprocess.Popen(
                [sys.executable, str(worker)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=120)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        ok = all(
            p.returncode == 0 and f"worker {pid} OK" in out
            for pid, (p, out) in enumerate(zip(procs, outs))
        )
        return ok, outs

    for _ in range(2):
        ok, outs = attempt()
        if ok:
            return
    assert ok, "two-process bring-up failed twice:\n" + "\n---\n".join(outs)
