"""Guards for the CLAUDE.md invariants the functional tests cannot see.

The CPU test mesh computes fp32 matmuls exactly regardless of the
precision flag, so dropping `precision=HIGHEST` from the model path would
pass every parity test here while silently degrading to bf16-decomposed
matmuls on the real TPU (where the NAP SVD whitening amplifies the error).
These tests inspect the LOWERED representation instead of the numerics.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model


def _cfg(**kw):
    cfg = Config(sensor="force_torque", n_layers=3, btl_size=8, verbose=0,
                 **kw)
    return cfg.replace(input_size=get_input_size(cfg))


def _dot_precisions(hlo_text: str):
    """precision configs of every dot_general in a StableHLO dump."""
    out = []
    for line in hlo_text.splitlines():
        if "dot_general" in line:
            out.append("HIGHEST" if "HIGHEST" in line else "DEFAULT")
    return out


def test_model_forward_matmuls_are_highest_precision():
    """CLAUDE.md: 'Model-path matmuls use precision=HIGHEST (fp32 exactness
    feeds the NAP SVD)'.  Checked on the lowered HLO, which the CPU mesh
    CAN observe."""
    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_forward

    cfg = _cfg()
    model, params, state = get_model(cfg)
    x = jnp.zeros((4, cfg.input_size), jnp.float32)
    txt = (
        jax.jit(lambda p, s, xx: ae_forward(model, p, s, xx, train=False))
        .lower(params, state, x)
        .as_text()
    )
    precs = _dot_precisions(txt)
    assert precs, "no dot_general found in the lowered forward"
    assert all(p == "HIGHEST" for p in precs), precs


def test_rapp_and_nap_matmuls_are_highest_precision():
    from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit, nap_score_device

    cfg = _cfg()
    model, params, state = get_model(cfg)
    x = jnp.zeros((4, cfg.input_size), jnp.float32)
    txt = (
        jax.jit(lambda p, s, xx: diffs_batch(model, p, s, xx))
        .lower(params, state, x)
        .as_text()
    )
    precs = _dot_precisions(txt)
    assert precs and all(p == "HIGHEST" for p in precs), precs

    stats = nap_fit(jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 16)), jnp.float32))
    txt_n = (
        jax.jit(lambda s_, xx: nap_score_device(s_, xx))
        .lower(stats, jnp.zeros((4, 16), jnp.float32))
        .as_text()
    )
    precs_n = _dot_precisions(txt_n)
    assert precs_n and all(p == "HIGHEST" for p in precs_n), precs_n


def test_fusion_convs_are_highest_precision():
    from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init

    fp = fusion_init(jax.random.PRNGKey(0))
    mods = {
        "r": jnp.zeros((2, 3, 32, 32)), "d": jnp.zeros((2, 1, 32, 32)),
        "t": jnp.zeros((2, 1)), "m": jnp.zeros((2, 1, 13)),
    }
    txt = (
        jax.jit(lambda p, **kw: fuse(p, sensor="All", **kw))
        .lower(fp, **mods)
        .as_text()
    )
    # convs lower to convolution ops; check their precision configs too
    conv_lines = [ln for ln in txt.splitlines()
                  if "convolution" in ln or "dot_general" in ln]
    assert conv_lines
    assert all("HIGHEST" in ln for ln in conv_lines), conv_lines[:3]


def test_no_torch_on_the_compute_path():
    """CLAUDE.md: 'No torch on the compute path'.  The suite itself imports
    torch as a parity oracle, so this must probe a FRESH interpreter: import
    every compute module and assert torch never entered sys.modules."""
    code = (
        "import sys\n"
        "import icra2021_multimodal_ad_tpu.train\n"
        "import icra2021_multimodal_ad_tpu.ops.scoring\n"
        "import icra2021_multimodal_ad_tpu.ops.rapp\n"
        "import icra2021_multimodal_ad_tpu.ops.fusion\n"
        "import icra2021_multimodal_ad_tpu.ops.mfcc\n"
        "import icra2021_multimodal_ad_tpu.ops.serving\n"
        "import icra2021_multimodal_ad_tpu.ops.pallas_kernels\n"
        "import icra2021_multimodal_ad_tpu.models.builder\n"
        "import icra2021_multimodal_ad_tpu.data.dataset\n"
        "import icra2021_multimodal_ad_tpu.data.etl\n"
        "import icra2021_multimodal_ad_tpu.data.streaming\n"
        "assert 'torch' not in sys.modules, 'torch leaked into compute path'\n"
        "print('clean')\n"
    )
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0 and "clean" in res.stdout, (
        res.stdout, res.stderr[-2000:])


def test_training_run_compiles_one_epoch_program_with_ragged_tail():
    """CLAUDE.md: 'two batch shapes max per training run (full batch +
    tail)'.  The tail lives INSIDE the traced epoch program, so one run
    must add at most ONE train_epoch cache entry even when batch does not
    divide n."""
    from icra2021_multimodal_ad_tpu.train import (
        NoveltyDetecter,
        eval_epoch,
        train_epoch,
    )

    cfg = _cfg(n_epochs=3, batch_size=20, lr=3e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(53, cfg.input_size)), jnp.float32)  # ragged
    xv = jnp.asarray(rng.normal(size=(17, cfg.input_size)), jnp.float32)
    model, params, state = get_model(cfg)

    before_t = train_epoch._cache_size()
    before_e = eval_epoch._cache_size()
    NoveltyDetecter(cfg).train(model, params, state, x, xv, fused=False)
    assert train_epoch._cache_size() - before_t <= 1
    assert eval_epoch._cache_size() - before_e <= 1


def test_bench_cost_of_reports_true_gemm_flops_and_survives_none():
    """bench._cost_of must report true 2MKN GEMM FLOPs, and must fall
    through to the COMPILED module's analysis when the lowered analysis
    returns None — which is exactly what the axon TPU backend does
    (verified on-chip: Lowered.cost_analysis() is None there, while the
    compiled analysis reports exact 2MKN).  A regression here silently
    nulls every mfu_* field in BENCH_r{N}.json."""
    import bench

    M, K, N = 32, 64, 48

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    a = jnp.zeros((M, K), jnp.bfloat16)
    b = jnp.zeros((K, N), jnp.bfloat16)
    f, by = bench._cost_of(mm, a, b)
    assert f == 2 * M * K * N, f
    assert by and by > 0

    # simulate the axon behavior: lowered analysis absent -> compiled path
    import unittest.mock as mock

    real_jit = jax.jit

    class _NoneLowered:
        def __init__(self, lowered):
            self._lowered = lowered

        def cost_analysis(self):
            return None

        def compile(self):
            return self._lowered.compile()

    def fake_jit(fn):
        jfn = real_jit(fn)

        class _J:
            def lower(self, *args):
                return _NoneLowered(jfn.lower(*args))

        return _J()

    with mock.patch.object(bench.jax, "jit", fake_jit):
        f2, by2 = bench._cost_of(mm, a, b)
    assert f2 == 2 * M * K * N, f2
    assert by2 and by2 > 0


def test_bench_summary_line_fits_driver_tail_window():
    """The LAST line bench.py prints must be a self-contained JSON
    summary <= SUMMARY_MAX_CHARS (1500): the driver records only the
    final ~2000 chars of stdout, and BENCH_r04 lost its entire headline
    when the accumulated full-board line outgrew that window
    (`parsed: null` in the artifact of record, VERDICT r4 item 1).
    Pins: the cap under a worst-case board, headline fields surviving
    any overflow trimming, and valid single-line JSON either way."""
    import json as _json

    import bench

    # a worst-case board: every summary key present with realistic
    # magnitudes, plus plenty of non-summary fields and long errors
    res = {k: 4625990.8 for k in bench.SUMMARY_KEYS}
    res.update({
        "metric": "fused_inference_windows_per_sec",
        "unit": "windows/s/chip",
        "bf16_windows_per_sec_spread": [4599658.9, 4662422.8],
        "fp32_windows_per_sec_spread": [3290000.1, 3310000.9],
        "headline_path": "sensor_u8_bf16", "partial": True,
        "watchdog": "fired",
        "section_errors": {f"sec{i}": "x" * 300 for i in range(16)},
        "section_wall_s": {f"sec{i}": 123.4 for i in range(16)},
    })
    line = bench.summary_line(res, n_errors=16, board_sha="a" * 64)
    assert len(line) <= bench.SUMMARY_MAX_CHARS, len(line)
    assert "\n" not in line
    parsed = _json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline",
              "bf16_windows_per_sec", "full_board"):
        assert k in parsed, k
    # run-status markers survive ANY trimming: a wedged/partial run must
    # never present to the driver as a healthy completed board
    assert parsed["partial"] is True and parsed["watchdog"] == "fired"
    # the giant non-summary fields never leak into the summary
    assert "section_errors" not in parsed
    assert parsed["n_section_errors"] == 16

    # pathological: even a hostile huge value in a droppable field can't
    # push the line over the cap while the headline four survive
    res["sensor_u8_vs_bf16_same_loop"] = float("1" + "0" * 200)
    line2 = bench.summary_line(res, n_errors=16, board_sha="a" * 64)
    assert len(line2) <= bench.SUMMARY_MAX_CHARS
    p2 = _json.loads(line2)
    assert p2["value"] == 4625990.8 and "vs_baseline" in p2
    assert p2["partial"] is True and p2["watchdog"] == "fired"

    # a realistic healthy final board also parses and keeps the AUROC +
    # latency core fields without trimming
    healthy = {k: v for k, v in res.items()
               if k not in ("partial", "watchdog")}
    healthy["sensor_u8_vs_bf16_same_loop"] = 0.9314
    for k in ("auroc_base", "auroc_sap", "auroc_nap",
              "auroc_nap_bf16_serving"):
        healthy[k] = 0.87654
    healthy["auroc_in_expected_band"] = True
    line3 = bench.summary_line(healthy, n_errors=0, board_sha="b" * 64)
    assert len(line3) <= bench.SUMMARY_MAX_CHARS
    p3 = _json.loads(line3)
    assert p3["auroc_nap_bf16_serving"] == 0.87654
    assert p3["streaming_tick_pipelined_p50_ms"] == 4625990.8


def test_bench_sanitize_json_strips_non_finite():
    """A NaN latency (latency_stats on an aborted run) must never reach
    json.dumps: Python would emit bare `NaN`, which strict JSON parsers
    reject — a third way for the artifact of record to be unparseable."""
    import json as _json

    import bench

    out = bench.sanitize_json(
        {"a": float("nan"), "b": [1.0, float("inf")], "c": {"d": 2.5},
         "e": "NaN-as-string is fine"})
    assert out["a"] is None and out["b"] == [1.0, None]
    assert out["c"] == {"d": 2.5}
    _json.dumps(out, allow_nan=False)  # strict-parseable

    line = bench.summary_line({"metric": "m", "unit": "u",
                               "value": float("nan"), "vs_baseline": 1.0})
    s = _json.loads(line)
    assert "value" not in s  # dropped, not emitted as NaN
    assert s["vs_baseline"] == 1.0


def test_int8_nap_program_runs_an_int8_mxu_dot():
    """The nap_quant='int8' whitening program must contain an i8 x i8 ->
    i32 dot_general (the MXU int8 path the 2x-peak claim rides on) over
    the bulk of the whitened directions, plus exactly one narrow bf16
    dot for the split-precision tail — and no fp32 fallback dot.  CPU
    numerics cannot distinguish a silent upcast, the lowered program can."""
    from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit
    from icra2021_multimodal_ad_tpu.ops.serving import (
        _nap_score_int8_xla,
        nap_int8_pack,
    )

    stats = nap_fit(jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 16)), jnp.float32))
    pk = nap_int8_pack(stats)
    jt = pk.v16.shape[1]
    assert jt == 2, jt  # round(16 * 1/8) on a small (unpadded) fit
    x = jnp.zeros((4, 16), jnp.float32)
    txt = jax.jit(_nap_score_int8_xla).lower(pk, x).as_text()
    dots = [ln for ln in txt.splitlines() if "dot_general" in ln]
    assert len(dots) == 2, dots
    i8 = [ln for ln in dots if "tensor<4x16xi8>" in ln]
    assert len(i8) == 1 and f"tensor<16x{16 - jt}xi8>" in i8[0] \
        and f"-> tensor<4x{16 - jt}xi32>" in i8[0], dots
    b16 = [ln for ln in dots if "bf16" in ln]
    assert len(b16) == 1 and f"tensor<16x{jt}xbf16>" in b16[0], dots
    assert not any("f32>, tensor" in ln and "xf32>) ->" in ln
                   for ln in dots), dots

    # tail_frac=0 recovers the pure-int8 single-dot program
    pk0 = nap_int8_pack(stats, tail_frac=0)
    assert pk0.v16 is None
    txt0 = jax.jit(_nap_score_int8_xla).lower(pk0, x).as_text()
    dots0 = [ln for ln in txt0.splitlines() if "dot_general" in ln]
    assert len(dots0) == 1 and "tensor<16x16xi8>" in dots0[0], dots0
