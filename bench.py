#!/usr/bin/env python
"""Benchmark harness — run on real TPU hardware.

Headline metric (BASELINE.md north star): fused 4-modality inference
windows/sec/chip — raw sensor windows (RGB 3x32x32, depth 1x32x32, force
scalar, mic 13-MFCC) through the fusion convs + the canonical 1728-5-layer
autoencoder + BASE score, in bf16 (fp32 MXU accumulation).  Target >=
100,000 windows/s/chip; `vs_baseline` = achieved / target.

Timing methodology: the tunneled device reports dispatch, not execution, so
naive block_until_ready loops can over-report by orders of magnitude.  Every
number here comes from an ON-DEVICE `lax.fori_loop` whose iterations carry a
data dependency, with the final scalar fetched to host — execution cannot be
elided or pipelined away.  Compile time is excluded by differencing a 1-iter
run.  Headline and NAP sections additionally record SPREAD
(`*_spread: [min, max]` windows/s over >=3 paired samples) so
round-over-round drift is attributable to tunnel variance vs regression.

Budget discipline (VERDICT r3: the r3 artifact died at the driver's
wall-clock limit with half the board missing): sections run CORE BOARD
FIRST — fused fp32/bf16, NAP fp32/bf16/int8, trainers, dataset build,
AUROC — then the r3 additions (sensor-u8, streaming, serve).  A wall-clock
budget manager (env `BENCH_BUDGET_S`, default 3000 s) checks remaining
budget against each section's cost estimate and skips-with-reason instead
of dying mid-section; every completed section re-emits the accumulated
JSON line, and per-section wall times are recorded in `section_wall_s`.
The AUROC probe's trained params are cached on disk keyed by
(config, data digest, training-code fingerprint) so only the first run
pays training while code changes still invalidate the cache.

Output contract (VERDICT r4 item 1: the r4 FULL board was emitted but the
driver's ~2000-char stdout tail window truncated the single accumulated
JSON line mid-key — `parsed: null`, headline lost): every completed
section still prints the full accumulated board line (kill-resilience,
humans), but the LAST line printed — after every section and at exit,
including the watchdog path — is a COMPACT self-contained summary
capped at SUMMARY_MAX_CHARS (1500) carrying the headline
(`value`, `vs_baseline`, fp32/bf16 windows/s + spread,
`dispatch_rtt_floor_ms`), the core MFU/AUROC fields, `bench_wall_s`,
and a pointer+sha256 to the FULL board, which is also written to
`BENCH_BOARD.json` next to this file on every emit:
  {"metric": "fused_inference_windows_per_sec", "value": N,
   "unit": "windows/s/chip", "vs_baseline": N, ...core fields,
   "full_board": "BENCH_BOARD.json", "full_board_sha256": "..."}
"""

import hashlib
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.fusion import fuse, fusion_init
from icra2021_multimodal_ad_tpu.ops.rapp import diffs_batch
from icra2021_multimodal_ad_tpu.ops.scoring import nap_fit
from icra2021_multimodal_ad_tpu.ops.pallas_kernels import nap_precompute

BASELINE_WINDOWS_PER_SEC = 100_000.0
N_ITERS = 20

#: The driver records only the last ~2000 chars of stdout and parses the
#: final line — the summary MUST fit with margin (r4's 2.2k-char board
#: line lost its head, including `value` itself).
SUMMARY_MAX_CHARS = 1500
BOARD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_BOARD.json")

#: Summary fields in priority order: when the line would overflow
#: SUMMARY_MAX_CHARS, keys are dropped from the END of this list first
#: (the first four are never dropped — they ARE the metric contract).
SUMMARY_KEYS = [
    "metric", "value", "unit", "vs_baseline",
    "bf16_windows_per_sec", "bf16_windows_per_sec_spread",
    "fp32_windows_per_sec", "fp32_windows_per_sec_spread",
    "dispatch_rtt_floor_ms", "headline_path", "batch",
    "mfu_fused_bf16", "hbm_util_fused_bf16",
    "mfu_nap_fp32_highest", "mfu_nap_bf16", "mfu_nap_int8",
    "auroc_base", "auroc_sap", "auroc_nap", "auroc_nap_bf16_serving",
    "auroc_in_expected_band",
    "rapp_nap_windows_per_sec", "rapp_nap_bf16_windows_per_sec",
    "rapp_nap_int8_windows_per_sec",
    "train_windows_per_sec", "train_bf16_windows_per_sec",
    "trainer_path_windows_per_sec", "trainer_path_bf16_windows_per_sec",
    "dataset_build_rows_per_sec", "dataset_build_overlap_ratio",
    "streaming_tick_pipelined_p50_ms", "streaming_tick_p50_ms",
    "serve_p50_ms", "sensor_u8_vs_bf16_same_loop",
    "bench_wall_s", "partial", "watchdog",
]
#: Never trimmed: the metric contract AND the run-status markers — an
#: oversized watchdog/partial summary must never present to the driver
#: as a healthy completed board (the trim order would otherwise drop
#: 'partial'/'watchdog' first, being last in SUMMARY_KEYS).
_SUMMARY_NEVER_DROP = frozenset(SUMMARY_KEYS[:4]) | {"partial", "watchdog"}


def sanitize_json(obj):
    """Replace non-finite floats with None, recursively.  A NaN p50 (an
    aborted streaming run returns {"p50_ms": nan}) would otherwise make
    json.dumps emit bare `NaN` — valid for Python's reader, fatal for
    any strict JSON parser, i.e. a new way for the artifact of record to
    be unparseable."""
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: sanitize_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_json(v) for v in obj]
    return obj


def summary_line(res: dict, n_errors: int = 0,
                 board_sha: str | None = None) -> str:
    """The compact final-emit line: SUMMARY_KEYS present in `res` (None
    values skipped — their reason lives in the full board's
    section_errors), error count, and the full-board pointer.  Guaranteed
    <= SUMMARY_MAX_CHARS by dropping trailing-priority keys."""
    res = sanitize_json(res)
    s = {k: res[k] for k in SUMMARY_KEYS if res.get(k) is not None}
    if n_errors:
        s["n_section_errors"] = n_errors
    s["full_board"] = os.path.basename(BOARD_PATH)
    if board_sha:
        s["full_board_sha256"] = board_sha[:16]
    line = json.dumps(s)
    for k in reversed(SUMMARY_KEYS):
        if len(line) <= SUMMARY_MAX_CHARS:
            break
        if k in s and k not in _SUMMARY_NEVER_DROP:
            del s[k]
            line = json.dumps(s)
    return line

#: TPU v5e public peak: 197 TFLOP/s bf16 on the MXU.  fp32 matmuls with
#: precision=HIGHEST run as 6 bf16 passes (bf16x6 emulation), so the
#: effective fp32-HIGHEST peak is peak/6.  MFU below = achieved FLOP/s
#: (XLA's own cost analysis of the compiled program x measured windows/s)
#: over the matching peak.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_FP32_HIGHEST_FLOPS = V5E_PEAK_BF16_FLOPS / 6.0
V5E_PEAK_INT8_FLOPS = 394e12  # the MXU int8 path: 2x bf16 (measured 356
# TOP/s on the canonical NAP whitening shape, 90% of this nominal peak)
#: v5e HBM bandwidth (public spec: 819 GB/s/chip).  The fused serving path
#: is compute/bandwidth CO-limited (measured ~52% MXU + ~66% HBM at
#: B=16384), so bench reports both sides of the roofline.
V5E_HBM_BYTES_PER_SEC = 819e9


def _cost_of(fn, *args):
    """(flops, bytes_accessed) of the program per XLA's cost analysis;
    (None, None) when the backend doesn't expose them.

    Tries the LOWERED module first (no compile — compiling fresh shapes
    over the tunnel costs 20-120 s each), but the axon TPU backend returns
    None from Lowered.cost_analysis() (verified on-chip), so fall through
    to the COMPILED module whenever the lowered analysis is absent or
    empty.  The compiled analysis reports true 2MKN GEMM FLOPs on this
    backend (probe: a 512x1024x2048 GEMM reports exactly 2*M*K*N for both
    bf16 and fp32), and the persistent compile cache makes the fallback
    compile a one-time cost per shape."""
    try:
        jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
        lowered = jfn.lower(*args)
        ca = None
        try:
            ca = lowered.cost_analysis()
        except Exception:  # noqa: BLE001 — fall through to compiled
            ca = None
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not (ca and float(ca.get("flops", 0.0)) > 0):
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
        f = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        return (f if f > 0 else None), (by if by > 0 else None)
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None, None


def _flops_of(fn, *args):
    return _cost_of(fn, *args)[0]


def _mfu(windows_per_sec, flops_per_window, peak):
    if not windows_per_sec or not flops_per_window:
        return None
    return round(windows_per_sec * flops_per_window / peak, 4)


from icra2021_multimodal_ad_tpu.ops.serving import cast_floats as _cast  # noqa: E402
from icra2021_multimodal_ad_tpu.utils.profiling import (  # noqa: E402
    retry as _retry,
    timed_loop as _timed_loop,
    timed_loop_stats as _timed_loop_stats,
)


def timed_loop(make_body, n_iters=N_ITERS):
    """On-device fori_loop timing (see utils/profiling.timed_loop)."""
    return _timed_loop(make_body, n_iters=n_iters)


def tput_stats(make_body, n_windows, n_iters=N_ITERS):
    """(median windows/s, [min, max] windows/s spread) from >=3 paired
    timed-loop samples of the SAME compiled programs (profiling.
    timed_loop_stats) — zero extra compiles over timed_loop."""
    st = _timed_loop_stats(make_body, n_iters=n_iters)
    tput = n_windows / st["median_s"]
    spread = [round(n_windows / st["max_s"], 1),
              round(n_windows / st["min_s"], 1)]
    return tput, spread


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # timing differences compiles out; wall time
    # of the bench itself drops a lot on repeat runs over the tunnel

    t_start = time.monotonic()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3000"))

    # Progressive emission: the tunnel has pathological phases (a trivial
    # jit measured at 225 s) where a wall-clock-budgeted bench gets killed
    # mid-run.  Each completed section re-prints the accumulated JSON line
    # (flushed), so the LAST line a killed run leaves behind still carries
    # every number measured so far, marked "partial": true; the final print
    # drops the marker.
    res = {
        "metric": "fused_inference_windows_per_sec",
        "unit": "windows/s/chip",
        "timing": "on-device fori_loop, compile-excluded, result-fetched",
        "partial": True,
    }
    errors = {}
    wall = {}

    import threading

    _emit_lock = threading.Lock()

    def emit():
        with _emit_lock:
            if errors:
                res["section_errors"] = dict(errors)
            res["section_wall_s"] = {k: round(v, 1)
                                     for k, v in wall.items()}
            board = json.dumps(sanitize_json(res))
            sha = hashlib.sha256(board.encode()).hexdigest()
            try:
                tmp = f"{BOARD_PATH}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    f.write(board + "\n")
                os.replace(tmp, BOARD_PATH)
            except OSError:
                pass  # board file is best-effort; stdout is the contract
            # full board first (kill-resilience, humans), compact summary
            # LAST — whatever truncates the run, the final complete line
            # is <= SUMMARY_MAX_CHARS and self-contained
            print(board, flush=True)
            print(summary_line(res, len(errors), sha), flush=True)

    # Last-resort liveness guard: the tunnel can HANG a single device call
    # indefinitely (observed: a noop compile stuck >19 min with the device
    # healthy again right after the process died) — _retry can't catch a
    # hang, and an external kill (rc=124) loses the board.  A daemon
    # thread emits the accumulated board and exits 0 cleanly if the main
    # thread is still wedged 60 s past the budget (the in-band budget
    # manager normally finishes the run well before this fires).
    # grace is env-tunable ONLY so the watchdog path is end-to-end
    # testable in seconds (tests/test_bench_contract.py fires it with
    # BENCH_BUDGET_S=0); production runs keep the 60 s default
    grace_s = float(os.environ.get("BENCH_WATCHDOG_GRACE_S", "60"))

    def _watchdog():
        deadline = t_start + budget_s + grace_s
        while True:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        # By contract the run ENDS here even if the in-flight section is
        # healthy-but-slow (the driver's external deadline looms; a clean
        # exit with the board beats its rc=124 kill).  The main thread may
        # be mutating res/errors/wall concurrently — never let that race
        # kill the watchdog before os._exit: fall back to snapshotting or,
        # at worst, a minimal line.
        wd_msg = (
            f"budget {budget_s:.0f}s + {grace_s:.0f}s grace exhausted with a device "
            f"call still in flight; emitting the partial board and "
            f"exiting 0")
        # serialize with a healthy main-thread emit (bounded wait — the
        # main thread may be hung INSIDE the tunnel, never inside the
        # lock for long) BEFORE touching errors/res: a lock-holding emit()
        # is iterating dict(errors) right now, and mutating it from here
        # can raise 'dictionary changed size during iteration' in the
        # MAIN thread (ADVICE r4).  Then write a SELF-DELIMITING compact
        # line: the leading newline keeps it parseable as the artifact's
        # last line even if os._exit truncates a concurrent main-thread
        # write mid-line, and the COMPACT form (not the full board) keeps
        # it inside the driver's ~2000-char tail window.
        got_lock = _emit_lock.acquire(timeout=10.0)
        try:
            if not got_lock:
                # the main thread has held the lock >10 s (e.g. print()
                # blocked on a full pipe) — it may be iterating
                # errors/res RIGHT NOW, so touching them here would
                # re-create the race this path exists to avoid; emit a
                # minimal self-contained line instead
                raise RuntimeError("emit lock held; minimal line")
            errors["watchdog"] = wd_msg
            res["watchdog"] = "fired"
            res["section_errors"] = dict(errors)
            board = json.dumps(sanitize_json(res))
            sha = hashlib.sha256(board.encode()).hexdigest()
            try:
                # atomic like emit(): a half-written board whose sha the
                # summary still vouches for is worse than a stale one
                tmp = f"{BOARD_PATH}.tmp.wd.{os.getpid()}"
                with open(tmp, "w") as f:
                    f.write(board + "\n")
                os.replace(tmp, BOARD_PATH)
            except OSError:
                pass
            line = summary_line(res, len(errors), sha)
        except Exception:  # noqa: BLE001 — lock timeout / res mutating
            line = json.dumps({"metric": "fused_inference_windows_per_sec",
                               "partial": True, "watchdog": wd_msg})
        try:
            os.write(1, b"\n" + line.encode() + b"\n")
        finally:
            if got_lock:
                _emit_lock.release()
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    hang_s = float(os.environ.get("BENCH_TEST_HANG_S", "0"))
    if hang_s:
        # test hook: simulate the tunnel's observed hang mode (a device
        # call stuck indefinitely with the process otherwise healthy) so
        # tests/test_bench_contract.py can drive the watchdog's
        # emit-and-exit-0 path end-to-end in seconds
        time.sleep(hang_s)

    # BENCH_SECTIONS="fused,nap_fp32" runs only the named sections (for
    # quick iteration on one number); prerequisite sections are pulled in
    # automatically and "setup" always runs.
    _DEPS = {
        "fused_split": ("fused",),
        "nap_fp32": ("nap_setup",), "nap_lowp_setup": ("nap_setup",),
        "nap_bf16": ("nap_setup", "nap_lowp_setup"),
        "nap_int8": ("nap_setup", "nap_lowp_setup"),
        "train_fp32": ("nap_setup",),
        "train_bf16": ("nap_setup", "train_fp32"),
        "trainer_path": ("nap_setup",),
        "streaming": ("nap_setup",), "serve": ("nap_setup",),
    }
    _SECTIONS = {"rtt", "setup", "fused", "fused_split", "nap_setup",
                 "nap_fp32", "nap_lowp_setup", "nap_bf16", "nap_int8",
                 "train_fp32", "train_bf16", "trainer_path",
                 "dataset_build", "auroc", "streaming", "serve",
                 "sensor_u8"}
    only = {s.strip() for s in
            os.environ.get("BENCH_SECTIONS", "").split(",") if s.strip()}
    unknown = only - _SECTIONS
    if unknown:
        # fail BEFORE any tunnel warm-up: a typo'd filter silently running
        # only rtt+setup would burn a 20-120 s compile cycle for nothing
        raise SystemExit(f"BENCH_SECTIONS: unknown section(s) "
                         f"{sorted(unknown)}; choose from "
                         f"{sorted(_SECTIONS)}")
    if only:
        only |= {"rtt", "setup"}
        for name in list(only):
            stack = list(_DEPS.get(name, ()))
            while stack:
                dep = stack.pop()
                if dep not in only:
                    only.add(dep)
                    stack.extend(_DEPS.get(dep, ()))

    def run_section(name, est_s, fn):
        """Budget-gated section: skip-with-reason when the remaining
        budget can't cover the estimate (never die mid-board), record the
        failure reason otherwise, and re-emit after every section."""
        if only and name not in only:
            errors[name] = "skipped: not in BENCH_SECTIONS"
            return False
        elapsed = time.monotonic() - t_start
        if elapsed + est_s > budget_s:
            errors[name] = (f"skipped: budget ({elapsed:.0f}s elapsed + "
                            f"~{est_s:.0f}s est > {budget_s:.0f}s budget)")
            emit()
            return False
        t0 = time.monotonic()
        try:
            fn()
            return True
        except Exception as e:  # noqa: BLE001 — reason is recorded
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            return False
        finally:
            wall[name] = time.monotonic() - t0
            emit()

    def gate(ok, prereq, *names):
        """Sections whose prerequisite failed/was skipped are never
        invoked, so run_section can't record their reason — do it here
        (the 'every missing field has a reason in section_errors'
        contract; VERDICT r3's half-missing board must stay explained)."""
        if not ok:
            for n in names:
                errors.setdefault(
                    n, f"skipped: prerequisite '{prereq}' failed or was "
                       f"skipped")
            emit()
        return ok

    # shared setup state, filled by the sections in order
    ctx = {}

    # ---- 1. dispatch-RTT floor (BASELINE.md row 2 instrumentation) --------
    # The smallest possible device program, result fetched: everything a
    # latency number below carries ON TOP of this is chip-attributable;
    # the floor itself is the tunnel's dispatch+fetch round trip.  Measured
    # FIRST so even a tunnel-killed run leaves the latency separator.
    def sec_rtt():
        noop = jax.jit(lambda x: x + 1.0)
        x0 = jnp.float32(0.0)
        _retry(lambda: float(noop(x0)))  # compile
        rtts = []
        for _ in range(20):
            t0 = time.perf_counter()
            float(noop(x0))
            rtts.append(time.perf_counter() - t0)
        res["dispatch_rtt_floor_ms"] = round(float(np.median(rtts)) * 1e3, 2)
        res["dispatch_rtt_floor_min_ms"] = round(min(rtts) * 1e3, 2)

    run_section("rtt", 30, sec_rtt)

    # ---- 2. model + data setup (not a measured section, but timed) --------
    def sec_setup():
        cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0,
                     seed=0)
        cfg = cfg.replace(input_size=get_input_size(cfg))
        model, params, state = get_model(cfg)
        fusion_params = fusion_init(jax.random.PRNGKey(cfg.seed))
        B = 16384
        rng = np.random.default_rng(0)
        raw = {
            "r": jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.float32),
            "d": jnp.asarray(rng.uniform(0, 1, (B, 1, 32, 32)), jnp.float32),
            "t": jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.float32),
            "m": jnp.asarray(rng.uniform(-1, 1, (B, 1, 13)), jnp.float32),
        }
        ctx.update(cfg=cfg, model=model, params=params, state=state,
                   fusion_params=fusion_params, B=B, raw=raw, rng=rng,
                   fp16=_cast(fusion_params, jnp.bfloat16),
                   p16=_cast(params, jnp.bfloat16),
                   raw16={k: v.astype(jnp.bfloat16) for k, v in raw.items()})

    if not run_section("setup", 60, sec_setup):
        res.pop("partial", None)
        emit()
        return

    model, params, state = ctx["model"], ctx["params"], ctx["state"]
    fusion_params, B, raw = ctx["fusion_params"], ctx["B"], ctx["raw"]
    fp16, p16, raw16 = ctx["fp16"], ctx["p16"], ctx["raw16"]
    cfg, rng = ctx["cfg"], ctx["rng"]

    def fused_score(fp, p, s, mods):
        # fp32 -> exact HIGHEST path; bf16 -> the serving mixed-precision
        # forward (ops/serving.py), which is the shipped bf16 configuration
        from icra2021_multimodal_ad_tpu.ops.serving import _forward

        x = fuse(fp, sensor="All", **mods)
        x_hat = _forward(model, p, s, x)
        delta = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
        return jnp.mean(delta * delta, axis=-1)

    def make_fused(fp, p, s, mods, dtype):
        def body(i, acc):
            eps = (i.astype(jnp.float32) * 1e-9 + acc * 0).astype(dtype)
            # every modality must depend on the loop counter, or XLA hoists
            # that modality's conv stack out of the loop and the number
            # silently excludes it (caught by a component-split timing study)
            mods_i = {k: v + eps for k, v in mods.items()}
            return acc + jnp.sum(fused_score(fp, p, s, mods_i))
        return body

    # ---- 3. CORE: fused inference throughput (the headline) ---------------
    def sec_fused():
        s32 = _retry(lambda: jax.jit(fused_score)(fusion_params, params,
                                                  state, raw))
        s16 = _retry(lambda: jax.jit(fused_score)(fp16, p16, state, raw16))
        rel = float(jnp.mean(jnp.abs(s16 - s32) / (jnp.abs(s32) + 1e-6)))

        tput16, spread16 = tput_stats(
            lambda: make_fused(fp16, p16, state, raw16, jnp.bfloat16), B)
        # fp32 path: the full-batch conv compile can trip the remote-compile
        # tunnel, so fall back through smaller batches rather than skipping —
        # BASELINE.md's AUROC-parity claim rides on the fp32 path, so the
        # number must be recorded.  batch B//4 first: the full-B fp32 conv
        # compile alone can eat minutes of tunnel time for <5% more measured
        # throughput.
        tput32, spread32, raw32 = None, None, None
        for b32 in (B // 4, B // 16):
            raw32 = {k: v[:b32] for k, v in raw.items()}
            try:
                # span must dwarf tunnel dispatch noise (>=200 ms):
                # ~4.5 ms/iter at B//4
                tput32, spread32 = tput_stats(
                    lambda: make_fused(fusion_params, params, state, raw32,
                                       jnp.float32),
                    b32, n_iters=48)
                errors.pop("fused_fp32", None)
                break
            except Exception as e:  # noqa: BLE001 — reason is recorded
                errors["fused_fp32"] = f"batch {b32}: {type(e).__name__}: {e}"[:300]
        headline = tput16 if rel < 5e-2 else (tput32 or tput16)
        # roofline instrumentation: FLOPs/window from XLA's cost analysis
        # of the exact compiled scoring program
        f16, by16 = _cost_of(fused_score, fp16, p16, state, raw16)
        fpw16 = f16 / B if f16 else None
        bpw16 = by16 / B if by16 else None
        fpw32 = None
        if tput32:
            f = _flops_of(fused_score, fusion_params, params, state, raw32)
            fpw32 = f / len(raw32["t"]) if f else None
        res.update({
            "value": round(headline, 1),
            "vs_baseline": round(headline / BASELINE_WINDOWS_PER_SEC, 3),
            "fp32_windows_per_sec": round(tput32, 1) if tput32 else None,
            "fp32_windows_per_sec_spread": spread32,
            "bf16_windows_per_sec": round(tput16, 1),
            "bf16_windows_per_sec_spread": spread16,
            "bf16_score_rel_err": round(rel, 5),
            "batch": B,
            "device": str(jax.devices()[0]),
            "fused_flops_per_window": round(fpw16, 0) if fpw16 else None,
            "fused_bf16_achieved_tflops":
                round(tput16 * fpw16 / 1e12, 2) if fpw16 else None,
            "mfu_fused_bf16": _mfu(tput16, fpw16, V5E_PEAK_BF16_FLOPS),
            "fused_bf16_bytes_per_window":
                round(bpw16, 0) if bpw16 else None,
            "hbm_util_fused_bf16": _mfu(tput16, bpw16,
                                        V5E_HBM_BYTES_PER_SEC),
            "fused_fp32_achieved_tflops":
                round(tput32 * fpw32 / 1e12, 2) if (tput32 and fpw32)
                else None,
            "mfu_fused_fp32_highest":
                _mfu(tput32, fpw32, V5E_PEAK_FP32_HIGHEST_FLOPS),
        })

    # ---- 3b. fused-path roofline ATTRIBUTION (VERDICT r4 weak #4) --------
    # The bf16 fused path sits at ~0.53 MFU and ~0.67 HBM util
    # simultaneously — neither roofline wall.  Attribute it: split the
    # program at the fuse/forward boundary, record each stage's XLA
    # cost-analysis bytes+FLOPs per window AND its measured rate.  The
    # conv front end's materialized intermediates (im2col copies, NCHW
    # layout transposes, per-modality concats) are the hypothesis for the
    # 116 kB/window of traffic; these fields decide it in-artifact.
    def sec_fused_split():
        from icra2021_multimodal_ad_tpu.ops.serving import _forward

        def fuse_only(fp, mods):
            return fuse(fp, sensor="All", **mods)

        def fwd_only(p, s, x):
            x_hat = _forward(model, p, s, x)
            delta = (x_hat.astype(jnp.float32) - x.astype(jnp.float32))
            return jnp.mean(delta * delta, axis=-1)

        x16 = _retry(lambda: jax.jit(fuse_only)(fp16, raw16))
        f_fu, by_fu = _cost_of(fuse_only, fp16, raw16)
        f_fw, by_fw = _cost_of(fwd_only, p16, state, x16)
        res["fused_stage_fusion_bytes_per_window"] = (
            round(by_fu / B, 0) if by_fu else None)
        res["fused_stage_forward_bytes_per_window"] = (
            round(by_fw / B, 0) if by_fw else None)
        res["fused_stage_fusion_flops_per_window"] = (
            round(f_fu / B, 0) if f_fu else None)
        res["fused_stage_forward_flops_per_window"] = (
            round(f_fw / B, 0) if f_fw else None)

        def make_fuse_only():
            def body(i, acc):
                eps = (i.astype(jnp.float32) * 1e-9
                       + acc * 0).astype(jnp.bfloat16)
                mods_i = {k: v + eps for k, v in raw16.items()}
                return acc + jnp.sum(fuse_only(fp16, mods_i))
            return body

        def make_fwd_only():
            def body(i, acc):
                xb = x16 + (i.astype(jnp.float32) * 1e-9
                            + acc * 0).astype(jnp.bfloat16)
                return acc + jnp.sum(fwd_only(p16, state, xb))
            return body

        t_fu, sp_fu = tput_stats(make_fuse_only, B)
        t_fw, sp_fw = tput_stats(make_fwd_only, B)
        res["fused_stage_fusion_windows_per_sec"] = round(t_fu, 1)
        res["fused_stage_forward_windows_per_sec"] = round(t_fw, 1)
        res["mfu_fused_stage_fusion"] = _mfu(
            t_fu, f_fu / B if f_fu else None, V5E_PEAK_BF16_FLOPS)
        res["mfu_fused_stage_forward"] = _mfu(
            t_fw, f_fw / B if f_fw else None, V5E_PEAK_BF16_FLOPS)
        res["hbm_util_fused_stage_fusion"] = _mfu(
            t_fu, by_fu / B if by_fu else None, V5E_HBM_BYTES_PER_SEC)
        res["hbm_util_fused_stage_forward"] = _mfu(
            t_fw, by_fw / B if by_fw else None, V5E_HBM_BYTES_PER_SEC)

    if gate(run_section("fused", 240, sec_fused), "fused", "fused_split"):
        run_section("fused_split", 180, sec_fused_split)

    # ---- 4. CORE: NAP setup (diffs + whitening fit, shared downstream) ----
    def sec_nap_setup():
        x_all = fuse(fusion_params, sensor="All", **raw)
        Bn = 4096
        small = x_all[:Bn]
        diffs = diffs_batch(model, params, state, small)
        stats = nap_fit(jnp.concatenate(diffs, axis=-1))
        offset, inv_std = nap_precompute(stats)
        ctx.update(x_all=x_all, Bn=Bn, small=small, diffs=diffs,
                   stats=stats, offset=offset, inv_std=inv_std,
                   v=stats.rotater.v)

    have_nap = run_section("nap_setup", 90, sec_nap_setup)

    # ---- 5. CORE: RaPP diffs + NAP scoring, fp32 (offline eval hot path) --
    def sec_nap_fp32():
        Bn, small, v = ctx["Bn"], ctx["small"], ctx["v"]
        offset, inv_std = ctx["offset"], ctx["inv_std"]

        def make_rapp():
            def body(i, acc):
                xb = small + (i.astype(jnp.float32) * 1e-9 + acc * 0)
                dfs = diffs_batch(model, params, state, xb)
                cat = jnp.concatenate(dfs, axis=-1)
                rot = jnp.dot(cat, v, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                tstd = (rot - offset) * inv_std
                return acc + jnp.sum(jnp.mean(tstd * tstd, axis=-1))
            return body

        # ~13 ms/iter at Bn=4096 -> ~260 ms span
        nap_tput, spread = tput_stats(make_rapp, Bn, n_iters=20)
        res["rapp_nap_windows_per_sec"] = round(nap_tput, 1)
        res["rapp_nap_windows_per_sec_spread"] = spread

        def _nap_once(xb):
            dfs = diffs_batch(model, params, state, xb)
            cat = jnp.concatenate(dfs, axis=-1)
            rot = jnp.dot(cat, v, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            tstd = (rot - offset) * inv_std
            return jnp.sum(jnp.mean(tstd * tstd, axis=-1))

        f = _flops_of(_nap_once, small)
        fpw_nap = f / Bn if f else None
        res["nap_flops_per_window"] = round(fpw_nap, 0) if fpw_nap else None
        res["nap_fp32_achieved_tflops"] = (
            round(nap_tput * fpw_nap / 1e12, 2) if fpw_nap else None)
        # the fp32 NAP path is all precision=HIGHEST matmuls (CLAUDE.md
        # invariant) -> measured against the bf16x6 effective peak
        res["mfu_nap_fp32_highest"] = _mfu(nap_tput, fpw_nap,
                                           V5E_PEAK_FP32_HIGHEST_FLOPS)

    if gate(have_nap, "nap_setup", "nap_fp32"):
        run_section("nap_fp32", 120, sec_nap_fp32)

    # ---- 6+7. CORE: low-precision NAP serving (bf16, then int8) -----------
    # shared setup for BOTH low-precision NAP sections: floored stats,
    # folded operands, the bf16 probe batch, and the fp32 reference scores
    # the rel-err fields compare against.
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        nap_effective_stats,
        nap_score_device,
    )
    from icra2021_multimodal_ad_tpu.ops.serving import (
        NAP_VAR_FLOOR_REL_BF16,
        serving_diffs_batch,
    )

    def sec_nap_lowp_setup():
        stats = ctx["stats"]
        stats_f = nap_effective_stats(stats, NAP_VAR_FLOOR_REL_BF16)
        offset_f, inv_std_f = nap_precompute(stats_f)
        cat32 = jnp.concatenate(ctx["diffs"], axis=-1)
        ctx.update(
            stats_f=stats_f, offset_f=offset_f, inv_std_f=inv_std_f,
            v16=ctx["v"].astype(jnp.bfloat16),
            small16=ctx["small"].astype(jnp.bfloat16),
            s32n=_retry(lambda: jax.jit(nap_score_device)(stats_f, cat32)),
        )

    have_lowp = (gate(have_nap, "nap_setup", "nap_lowp_setup")
                 and run_section("nap_lowp_setup", 60,
                                 sec_nap_lowp_setup))

    def sec_nap_bf16():
        Bn, small16 = ctx["Bn"], ctx["small16"]
        v16 = ctx["v16"]
        offset_f, inv_std_f, s32n = (ctx["offset_f"], ctx["inv_std_f"],
                                     ctx["s32n"])

        @jax.jit
        def _score16(xb):
            # the exact computation the timed loop runs per iteration:
            # mixed-precision diffs, bf16 whitening matmul, floored stats
            # (ops/serving.py score_nap_windows semantics — the
            # streaming/serving NAP fast path)
            dfs = serving_diffs_batch(model, p16, state, xb)
            cat = jnp.concatenate(dfs, axis=-1).astype(jnp.bfloat16)
            rot = jnp.dot(cat, v16, preferred_element_type=jnp.float32)
            tstd = (rot - offset_f) * inv_std_f
            return jnp.mean(tstd * tstd, axis=-1)

        def make_rapp16():
            def body(i, acc):
                xb = small16 + (i.astype(jnp.float32) * 1e-9
                                + acc * 0).astype(jnp.bfloat16)
                return acc + jnp.sum(_score16(xb))
            return body

        # ~1-2.5 ms/iter -> >=150 ms span (a 5-iter span once
        # measured above the chip's peak: pure dispatch noise)
        tput, spread = tput_stats(make_rapp16, Bn, n_iters=128)
        f = _flops_of(lambda xb: jnp.sum(_score16(xb)), small16)
        fpw = f / Bn if f else None
        # precision agreement on the SAME floored stats AND the same bf16
        # whitening the timed loop runs (isolates the full dtype effect)
        s16n = _retry(lambda: _score16(small16))
        rel = float(jnp.mean(jnp.abs(s16n - s32n) / (jnp.abs(s32n) + 1e-6)))
        res["mfu_nap_bf16"] = _mfu(tput, fpw, V5E_PEAK_BF16_FLOPS)
        res["rapp_nap_bf16_windows_per_sec"] = round(tput, 1)
        res["rapp_nap_bf16_windows_per_sec_spread"] = spread
        res["nap_bf16_score_rel_err"] = round(rel, 5)

    def sec_nap_int8():
        from icra2021_multimodal_ad_tpu.ops.serving import (
            _nap_score_int8_xla,
            nap_int8_pack,
        )

        Bn, small16 = ctx["Bn"], ctx["small16"]
        s32n = ctx["s32n"]
        pk = nap_int8_pack(ctx["stats_f"],
                           precomputed=(ctx["offset_f"], ctx["inv_std_f"]))

        @jax.jit
        def _score8(xb):
            # nap_quant="int8": bf16 diff extraction + whitening matmul on
            # the MXU int8 path at 2x the bf16 peak; fp32 epilogue
            # (ops/serving._nap_score_int8_xla semantics)
            dfs = serving_diffs_batch(model, p16, state, xb)
            cat = jnp.concatenate(dfs, axis=-1)
            return _nap_score_int8_xla(pk, cat)

        def make_rapp8():
            def body(i, acc):
                xb = small16 + (i.astype(jnp.float32) * 1e-9
                                + acc * 0).astype(jnp.bfloat16)
                return acc + jnp.sum(_score8(xb))
            return body

        tput, spread = tput_stats(make_rapp8, Bn, n_iters=128)
        f = _flops_of(lambda xb: jnp.sum(_score8(xb)), small16)
        fpw = f / Bn if f else None
        s8n = _retry(lambda: _score8(small16))
        rel = float(jnp.mean(jnp.abs(s8n - s32n) / (jnp.abs(s32n) + 1e-6)))
        res["mfu_nap_int8"] = _mfu(tput, fpw, V5E_PEAK_INT8_FLOPS)
        res["rapp_nap_int8_windows_per_sec"] = round(tput, 1)
        res["rapp_nap_int8_windows_per_sec_spread"] = spread
        res["nap_int8_score_rel_err"] = round(rel, 5)
        res["nap_int8_bf16_tail_cols"] = (
            int(pk.v16.shape[1]) if pk.v16 is not None else 0)

        # Amdahl split (VERDICT r4 weak #5): mfu_nap_int8 ~0.49 is
        # reported against the int8 peak, but the program is bf16 diff
        # extraction + int8 whitening — the split shows which stage sets
        # the end-to-end ceiling (scripts/nap_int8_split.py measured the
        # whitening GEMM alone at ~90% of the int8 peak; these fields put
        # that attribution IN the artifact).
        cat0 = _retry(lambda: jax.jit(lambda xb: jnp.concatenate(
            serving_diffs_batch(model, p16, state, xb), axis=-1))(small16))

        def make_extract():
            def body(i, acc):
                xb = small16 + (i.astype(jnp.float32) * 1e-9
                                + acc * 0).astype(jnp.bfloat16)
                dfs = serving_diffs_batch(model, p16, state, xb)
                return acc + sum(jnp.sum(d) for d in dfs)
            return body

        def make_whiten():
            def body(i, acc):
                c = cat0 + (i.astype(jnp.float32) * 1e-9
                            + acc * 0).astype(cat0.dtype)
                return acc + jnp.sum(_nap_score_int8_xla(pk, c))
            return body

        t_ex, _sp_ex = tput_stats(make_extract, Bn, n_iters=128)
        t_wh, _sp_wh = tput_stats(make_whiten, Bn, n_iters=128)
        res["nap_int8_extract_only_windows_per_sec"] = round(t_ex, 1)
        res["nap_int8_whiten_only_windows_per_sec"] = round(t_wh, 1)
        f_wh = _flops_of(
            lambda c: jnp.sum(_nap_score_int8_xla(pk, c)), cat0)
        res["mfu_nap_int8_whiten_only"] = _mfu(
            t_wh, f_wh / Bn if f_wh else None, V5E_PEAK_INT8_FLOPS)

    if gate(have_lowp, "nap_lowp_setup", "nap_bf16", "nap_int8"):
        run_section("nap_bf16", 120, sec_nap_bf16)
        run_section("nap_int8", 120, sec_nap_int8)

    # ---- 8+9. CORE: training step throughput (fp32, then bf16) ------------
    import optax

    from icra2021_multimodal_ad_tpu.models.autoencoder import ae_loss

    optimizer = optax.adam(1e-3)
    Bt = 7000

    def make_train_loop(xtrain):
        # the input dtype selects the trainer numerics at trace time
        # (models/layers.fc_layer_apply): fp32 -> HIGHEST exact path,
        # bf16 -> the opt-in mixed-precision trainer
        # (config.train_dtype="bfloat16": fp32 masters/Adam/BN, bf16
        # matmul operands)
        @partial(jax.jit, static_argnames=("n",))
        def train_loop(p, s, o, n):
            def body(i, carry):
                p, s, o, acc = carry
                def loss_of(pp):
                    loss, new_s = ae_loss(model, pp, s, xtrain, train=True)
                    return loss, new_s
                (loss, new_s), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(p)
                upd, o2 = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, upd), new_s, o2, acc + loss)
            out = jax.lax.fori_loop(0, n, body, (p, s, o, jnp.float32(0)))
            return out[3]
        return train_loop

    TRAIN_SPAN = 51  # differencing span (t_51 - t_1)/50: 50 steps is
    # ~900 ms fp32 / ~200 ms bf16 of real compute — the r5 first cut
    # used (t_6 - t_1)/5, whose ~20 ms bf16 signal sat BELOW the
    # tunnel's dispatch noise and swung the bf16 trainer number 1.7-2.5M
    # between same-day runs with a 5x spread; the wider span puts the
    # signal above the noise floor for both dtypes

    def time_train_loop(train_loop, repeats=3):
        """(median windows/s, [min, max] spread) over `repeats` PAIRED
        (t_1, t_SPAN) differences of the same two compiled programs —
        the trainer twin of tput_stats (VERDICT r4 weak #3: trainer
        numbers were single samples on a ±20% link).  Non-positive pairs
        (a dispatch spike landing on the t_1 endpoint) are discarded and
        re-measured, up to 2*repeats attempts."""
        opt_state = optimizer.init(params)
        float(train_loop(params, state, opt_state, 1))  # compile n=1
        float(train_loop(params, state, opt_state, TRAIN_SPAN))  # compile
        rates = []
        for _ in range(2 * repeats):
            if len(rates) >= repeats:
                break
            t0 = time.perf_counter()
            float(train_loop(params, state, opt_state, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(train_loop(params, state, opt_state, TRAIN_SPAN))
            tn = time.perf_counter() - t0
            if tn > t1:
                rates.append(Bt / ((tn - t1) / (TRAIN_SPAN - 1)))
        if not rates:
            raise RuntimeError(
                "train loop differencing unresolvable over tunnel noise "
                "(every (t_span - t_1) pair came out non-positive)")
        rates.sort()
        return (float(np.median(rates)),
                [round(rates[0], 1), round(rates[-1], 1)])

    def train_flops_per_step(xtrain, o0):
        """FLOPs of ONE FULL train step (fwd + bwd + Adam), from an
        EXPLICIT single-step program that returns (params, state, opt,
        loss) — returning everything means nothing is dead-code-eliminated.
        Analyzing the timed fori_loop itself is wrong twice over (both
        caught by cross-checks): the loop returns only the loss sum, so
        the FINAL iteration's backward+Adam are DCE'd (an n=1 analysis
        reports exactly the forward's 20.5 MFLOP/window), AND XLA's cost
        analysis counts a while-loop body ONCE regardless of trip count
        (n=2 and n=3 analyses are bit-equal), so differencing n=2 - n=1
        yields (full body) - (DCE'd body) = 36.4 — a 1.56x MFU undercount
        vs the true 56.9 MFLOP/window step.  The timing differences
        (t_{n+1} - t_1) are unaffected: every timed iteration feeds the
        next, so each keeps its backward."""
        def step(p, s, o):
            def loss_of(pp):
                loss, new_s = ae_loss(model, pp, s, xtrain, train=True)
                return loss, new_s
            (loss, new_s), grads = jax.value_and_grad(
                loss_of, has_aux=True)(p)
            upd, o2 = optimizer.update(grads, o, p)
            return optax.apply_updates(p, upd), new_s, o2, loss

        return _flops_of(step, params, state, o0)

    def sec_train_fp32():
        xt = ctx["x_all"][:Bt]
        ctx["xt"] = xt
        train_loop = make_train_loop(xt)
        opt_state = optimizer.init(params)
        tput, spread = time_train_loop(train_loop)
        ctx["train_tput"] = tput
        res["train_windows_per_sec"] = round(tput, 1)
        res["train_windows_per_sec_spread"] = spread
        f = train_flops_per_step(xt, opt_state)
        fpw = f / Bt if f else None
        res["train_flops_per_window"] = round(fpw, 0) if fpw else None
        # trainer matmuls run precision=HIGHEST fp32 (model-path invariant)
        res["mfu_train_fp32_highest"] = _mfu(tput, fpw,
                                             V5E_PEAK_FP32_HIGHEST_FLOPS)

    def sec_train_bf16():
        xt16 = ctx["xt"].astype(jnp.bfloat16)
        loop16 = make_train_loop(xt16)
        opt16 = optimizer.init(params)
        tput, spread = time_train_loop(loop16)
        res["train_bf16_windows_per_sec"] = round(tput, 1)
        res["train_bf16_windows_per_sec_spread"] = spread
        f = train_flops_per_step(xt16, opt16)
        fpw = f / Bt if f else None
        res["mfu_train_bf16"] = _mfu(tput, fpw, V5E_PEAK_BF16_FLOPS)
        if ctx.get("train_tput"):
            res["train_bf16_speedup"] = round(tput / ctx["train_tput"], 2)

    if gate(have_nap, "nap_setup", "train_fp32", "train_bf16"):
        if gate(run_section("train_fp32", 150, sec_train_fp32),
                "train_fp32", "train_bf16"):
            run_section("train_bf16", 150, sec_train_bf16)

    # ---- 10. CORE: the REAL trainer (NoveltyDetecter.train, fused mode) ---
    # Times the shipped product path, not an idealized loop: the whole run
    # (shuffle + scan over batches + eval + device-side best-model select)
    # is one device program per call; compile excluded by differencing a
    # 1-epoch run against a (span+1)-epoch run.
    def sec_trainer_path():
        from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

        n_rows = Bt * 2
        xtr = ctx["x_all"][:n_rows]
        xva = ctx["x_all"][:Bt]

        def run_train(n_epochs, dtype="float32"):
            det = NoveltyDetecter(cfg.replace(
                n_epochs=n_epochs, batch_size=Bt, verbose=0,
                train_dtype=dtype))
            # fused mode does not donate (best-model copies alias the
            # inputs), so params/state can be reused across calls
            r = det.train(model, params, state, xtr, xva, fused=True)
            return r.valid_history[-1]

        def measure_train(n_epochs, dtype):
            t0 = time.perf_counter()
            run_train(n_epochs, dtype)
            return time.perf_counter() - t0

        # the tunnel's fixed dispatch+fetch overhead varies by SECONDS run
        # to run, so the span must dwarf it (500 epochs ~ 17 s of compute;
        # a 20-epoch span measured 4x low).  Each rate is a PAIRED
        # (t1, t_{span+1}) difference; 3 pairs give median + spread
        # (VERDICT r4 weak #3), with noise-swallowed pairs discarded.
        span = 500

        def trainer_rates(dtype, min_gap_s):
            _retry(lambda: run_train(1, dtype))  # compile 1-epoch program
            _retry(lambda: run_train(span + 1, dtype))  # compile span prog
            rates, gaps = [], []
            for _ in range(3):
                t1 = _retry(lambda: measure_train(1, dtype))
                tn = _retry(lambda: measure_train(span + 1, dtype))
                gaps.append((t1, tn))
                if tn - t1 >= min_gap_s:
                    rates.append((span * n_rows) / (tn - t1))
            if not rates:
                raise RuntimeError(
                    f"trainer span not resolvable over tunnel noise "
                    f"({dtype}: pairs {[(round(a, 2), round(b, 2)) for a, b in gaps]})")
            rates.sort()
            return (float(np.median(rates)),
                    [round(rates[0], 1), round(rates[-1], 1)])

        tput, spread = trainer_rates("float32", 1.0)
        res["trainer_path_windows_per_sec"] = round(tput, 1)
        res["trainer_path_windows_per_sec_spread"] = spread
        # the shipped fast configuration (--train_dtype bfloat16): same
        # honest per-epoch-eval path, mixed-precision numerics (VERDICT
        # r4 item 8).  ~4.6x faster -> the 500-epoch span is ~4 s of
        # compute, so accept a smaller (still noise-dominating) gap.
        tput16, spread16 = trainer_rates("bfloat16", 0.5)
        res["trainer_path_bf16_windows_per_sec"] = round(tput16, 1)
        res["trainer_path_bf16_windows_per_sec_spread"] = spread16

    if gate(have_nap, "nap_setup", "trainer_path"):
        run_section("trainer_path", 360, sec_trainer_path)

    # ---- 11. CORE: dataset build (CSV shards + decode + fuse -> device) ---
    # The reference's #1 hot loop was its serial per-row PIL decode at
    # dataset build (SURVEY.md §3.1); ours dedups repeated frames and
    # thread-pools distinct ones (serial on this 1-core TPU frontend).
    def sec_dataset_build():
        import tempfile

        from icra2021_multimodal_ad_tpu.data.dataset import TabularDataset
        from icra2021_multimodal_ad_tpu.data.synthetic import (
            generate_data_sum_shards,
        )

        root = tempfile.mkdtemp(prefix="benchds_")
        n_rows = 2000
        generate_data_sum_shards(root, n_episodes=n_rows // 40,
                                 steps_per_episode=40, n_shards=2,
                                 n_lidar=963, seed=0)
        # cold build MUST bypass the feature cache or the timed run would
        # measure an npz load and report it as the build rate
        bcfg = cfg.replace(data_folder_name=root, slicing_size=n_rows,
                           feature_cache=0)
        ccfg = bcfg.replace(feature_cache=1)
        # warm run compiles the fusion program AND (feature_cache=1)
        # writes the cache entry the hit-timing below will load — one
        # build does double duty instead of a redundant third full build
        ds = TabularDataset(ccfg)
        jax.block_until_ready(ds.data)

        # Overlap A/B, reconciled IN-ARTIFACT (VERDICT r4 weak #1: docs
        # claimed 3.2x from _load_images_overlapped while the r4 driver
        # artifact recorded a rate BELOW the r2 pre-overlap figure, with
        # no spread to attribute the gap).  Same session, interleaved
        # on/off builds, >=3 repeats each: `dataset_build_rows_per_sec`
        # is the shipped default (overlap ON) median; the `_overlap_off`
        # fields and the ratio are what the docs must quote.
        def timed_build(overlap):
            prev = os.environ.get("ICRA_TPU_BUILD_OVERLAP")
            os.environ["ICRA_TPU_BUILD_OVERLAP"] = "1" if overlap else "0"
            try:
                t0 = time.perf_counter()
                d = TabularDataset(bcfg)  # CSV + decode + fuse execute
                jax.block_until_ready(d.data)
                return len(d) / (time.perf_counter() - t0), d
            finally:
                # restore, don't pop: an operator-exported =0 must
                # survive the A/B (it governs every later build in this
                # process)
                if prev is None:
                    os.environ.pop("ICRA_TPU_BUILD_OVERLAP", None)
                else:
                    os.environ["ICRA_TPU_BUILD_OVERLAP"] = prev

        on_rates, off_rates = [], []
        for _ in range(3):
            r_on, ds = timed_build(True)
            on_rates.append(r_on)
            r_off, _ = timed_build(False)
            off_rates.append(r_off)
        on_rates.sort()
        off_rates.sort()
        res["dataset_build_rows_per_sec"] = round(
            float(np.median(on_rates)), 1)
        res["dataset_build_rows_per_sec_spread"] = [
            round(on_rates[0], 1), round(on_rates[-1], 1)]
        res["dataset_build_overlap_off_rows_per_sec"] = round(
            float(np.median(off_rates)), 1)
        res["dataset_build_overlap_off_rows_per_sec_spread"] = [
            round(off_rates[0], 1), round(off_rates[-1], 1)]
        res["dataset_build_overlap_ratio"] = round(
            float(np.median(on_rates)) / float(np.median(off_rates)), 3)
        # cache-hit path (what repeat CLI runs / sweep grid points pay)
        t0 = time.perf_counter()
        ds = TabularDataset(ccfg)
        jax.block_until_ready(ds.data)
        cached_s = time.perf_counter() - t0
        res["dataset_build_cached_rows_per_sec"] = round(
            len(ds) / cached_s, 1)
        # Both paths end with the same host->device put of the fused
        # features, and over the tunnel that fixed transfer dominates the
        # cache-hit time (measured: ~17x host-side speedup on CPU collapses
        # to ~1.2x end-to-end here) — the same way naive block_until_ready
        # loops lie (module docstring).  Measure the put alone (min of 3)
        # and report the host-side rate a PCIe-local deployment would see;
        # the transfer figure itself is emitted for transparency.
        h_data, h_tgt = np.asarray(ds.data), np.asarray(ds.targets)

        def _put():
            t = time.perf_counter()
            jax.block_until_ready((jnp.asarray(h_data), jnp.asarray(h_tgt)))
            return time.perf_counter() - t

        _put()  # warm (allocator / tunnel session)
        xfer_s = min(_put() for _ in range(3))
        res["dataset_build_cached_transfer_s"] = round(xfer_s, 4)
        host_s = cached_s - xfer_s
        res["dataset_build_cached_host_rows_per_sec"] = (
            round(len(ds) / host_s, 1) if host_s > 1e-3 else None)

    run_section("dataset_build", 180, sec_dataset_build)

    # ---- 12. CORE: accuracy tied to the perf artifact (BASELINE.md row 3) -
    # AUROC triple of the canonical synthetic run, fp32 train/eval path +
    # the bf16-serving NAP path, in the SAME artifact as the throughput
    # numbers.  Same library calls as the novelty_detection.py CLI
    # (get_loaders -> NoveltyDetecter.train/test), same seed — a CLI run on
    # these shards reproduces these numbers exactly.  The trained params
    # are cached on disk keyed by (config, train-data digest) so repeat
    # bench runs skip the training cost (first run pays it once).
    #
    # HARDENED task (VERDICT r4 weak #2: the default generator is so
    # separable that every scorer — right or subtly wrong — measured
    # AUROC 1.0, making the probe toothless): the probe data is generated
    # with anomaly_scale=AUROC_PROBE_SCALE and per-row severity ~ U(0.25,1)
    # (data/synthetic.py), chosen via scripts/auroc_probe_tune.py so the
    # expected AUROCs sit strictly inside (0.5, 1.0).  The pinned band
    # below is the regression tripwire: `auroc_in_expected_band` goes
    # false (and `auroc_band_warn` says which field) when any AUROC
    # leaves it.
    AUROC_PROBE_SCALE = 0.7
    AUROC_EXPECTED_BAND = {
        # pinned from measurement on BOTH backends at scale 0.7 —
        # on-chip (TPU v5e, r5): BASE 0.799 / SAP 0.804 / NAP 0.854 /
        # NAP-bf16-serving 0.981; CPU (scripts/auroc_probe_tune.py):
        # 0.668 / 0.726 / 0.831 (the RaPP paper's NAP >= SAP >= BASE
        # ordering; training numerics differ per backend, eval is
        # deterministic given the cached params).  The bf16-serving NAP
        # sits HIGHER than exact fp32 NAP here because its variance
        # floor zeroes near-null whitened directions that amplify noise
        # (ops/scoring.nap_effective_stats) — a scorer property, not a
        # bug.  Bands are generous for backend numerics but strictly
        # inside (0.5, 1.0): saturation back to 1.0 or a broken scorer
        # both trip `auroc_in_expected_band`.
        "auroc_base": (0.60, 0.92),
        "auroc_sap": (0.62, 0.93),
        "auroc_nap": (0.72, 0.95),
        "auroc_nap_bf16_serving": (0.80, 0.995),
    }

    def sec_auroc():
        from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
        from icra2021_multimodal_ad_tpu.data.synthetic import (
            generate_data_sum_shards,
        )
        from icra2021_multimodal_ad_tpu.ops.metrics import get_auc_roc
        from icra2021_multimodal_ad_tpu.ops.scoring import load_nap_stats
        from icra2021_multimodal_ad_tpu.ops.serving import make_serving
        from icra2021_multimodal_ad_tpu.train import (
            NoveltyDetecter,
            binarize_labels,
        )
        from icra2021_multimodal_ad_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
            to_device,
        )

        # the hardened probe data, generated once into a content-keyed
        # cache dir (the key covers the generator ARGS and the generator
        # CODE, so editing data/synthetic.py regenerates instead of
        # silently reusing stale shards); atomic rename so a killed
        # first run can't leave a half-written tree that later runs trust
        import icra2021_multimodal_ad_tpu.data.synthetic as _syn

        with open(_syn.__file__, "rb") as fh:
            gen_sha = hashlib.sha256(fh.read()).hexdigest()[:12]
        n_rows = 2000
        # EVERY generator argument feeds the cache key (plus the
        # generator code sha above): an arg edit that left the key
        # unchanged would silently reuse stale shards and measure the
        # pinned band against the wrong task
        gen_args = dict(n_episodes=n_rows // 40, steps_per_episode=40,
                        n_shards=2, n_lidar=963, seed=0,
                        anomaly_scale=AUROC_PROBE_SCALE,
                        vary_severity=True)
        args_sha = hashlib.sha256(
            json.dumps(gen_args, sort_keys=True).encode()).hexdigest()[:12]
        droot = os.path.join(
            os.path.expanduser("~/.cache/icra2021_multimodal_ad_tpu"),
            "bench_auroc_data", f"a{args_sha}_{gen_sha}")
        if not os.path.exists(os.path.join(droot, "data_sum1.csv")):
            tmp = f"{droot}.tmp.{os.getpid()}"
            generate_data_sum_shards(tmp, **gen_args)
            os.makedirs(os.path.dirname(droot), exist_ok=True)
            try:
                os.rename(tmp, droot)
            except OSError:
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)  # raced: lost

        # enough optimizer steps to actually converge on the 1200-row train
        # split: 40 epochs x ~5 steps at lr 3e-3 (a 20-epoch/batch-1024 run
        # measured BASE AUROC 0.24 — undertrained, not a scoring bug; cf.
        # the verify recipe's 25x7-step CLI run at AUROC 1.0)
        acfg = cfg.replace(data_folder_name=droot, slicing_size=n_rows,
                           feature_cache=1, n_epochs=40, batch_size=256,
                           lr=3e-3, target_class=1)
        dm, trl, val, tel = get_loaders(acfg)
        train_x, _ = dm.get_transformed_data(trl)
        valid_x, _ = dm.get_transformed_data(val)
        test_x, test_y = dm.get_transformed_data(tel)
        det = NoveltyDetecter(acfg)

        # params cache key: the model/trainer config fields + a digest of
        # the exact train/valid arrays (covers the synthetic generator,
        # slicing, fusion weights — anything that changes what training
        # would produce)
        h = hashlib.sha256()
        h.update(json.dumps([acfg.n_epochs, acfg.batch_size, acfg.lr,
                             acfg.seed, acfg.n_layers, acfg.btl_size,
                             acfg.sensor, acfg.target_class,
                             AUROC_PROBE_SCALE]).encode())
        h.update(np.asarray(train_x).tobytes())
        h.update(np.asarray(valid_x).tobytes())
        # ... AND a fingerprint of the code that produces the trained
        # params: without it a training-path regression would be masked
        # forever by pre-regression cached params (the section exists to
        # be BASELINE.md row 3's regression signal)
        import icra2021_multimodal_ad_tpu as _pkg

        pkg_root = os.path.dirname(_pkg.__file__)
        for rel in ("train.py", "config.py", "models", "ops",
                    "parallel"):
            path = os.path.join(pkg_root, rel)
            files = ([path] if os.path.isfile(path) else
                     sorted(os.path.join(path, f)
                            for f in os.listdir(path)
                            if f.endswith(".py")))
            for f in files:
                with open(f, "rb") as fh:
                    h.update(fh.read())
        cache_dir = os.path.join(
            os.path.expanduser("~/.cache/icra2021_multimodal_ad_tpu"),
            "bench_auroc")
        os.makedirs(cache_dir, exist_ok=True)
        ckpt_key = os.path.join(cache_dir, h.hexdigest()[:24])
        try:
            p_tr, s_tr, _ = load_checkpoint(ckpt_key)
            p_tr, s_tr = to_device(p_tr), to_device(s_tr)
            res["auroc_probe_train_cached"] = True
        except Exception:  # noqa: BLE001 — first run trains and caches
            r = det.train(model, jax.tree.map(jnp.copy, params),
                          jax.tree.map(jnp.copy, state),
                          train_x, valid_x, fused=True)
            p_tr, s_tr = r.params, r.state
            save_checkpoint(ckpt_key, p_tr, s_tr, config=acfg)
            res["auroc_probe_train_cached"] = False
        stats_path = os.path.join(droot, "bench_nap_stats.npz")
        rb, rs, rn = det.test(model, p_tr, s_tr, train_x, valid_x,
                              test_x, test_y, save_stats_path=stats_path)
        res["auroc_base"] = round(float(rb.auroc), 5)
        res["auroc_sap"] = round(float(rs.auroc), 5)
        res["auroc_nap"] = round(float(rn.auroc), 5)
        # the same test windows through the bf16 serving NAP path (the
        # deploy-guarded low-precision configuration)
        srv = make_serving(acfg.replace(compute_dtype="bfloat16"), model,
                           p_tr, s_tr, nap_stats=load_nap_stats(stats_path))
        s16 = np.asarray(srv.score_nap_windows(jnp.asarray(test_x)))
        res["auroc_nap_bf16_serving"] = round(
            float(get_auc_roc(s16, binarize_labels(acfg, test_y))), 5)
        # the regression tripwire: every AUROC inside its pinned band,
        # strictly inside (0.5, 1.0) — saturation back to 1.0 or a
        # scoring break both move a number someone can see
        res["auroc_expected_band"] = {
            k: list(v) for k, v in AUROC_EXPECTED_BAND.items()}
        warns = [
            f"{k}={res[k]} outside [{lo}, {hi}]"
            for k, (lo, hi) in AUROC_EXPECTED_BAND.items()
            if not (lo <= (res.get(k) if res.get(k) is not None else -1)
                    <= hi)
        ]
        res["auroc_in_expected_band"] = not warns
        if warns:
            res["auroc_band_warn"] = "; ".join(warns)

    run_section("auroc", 300, sec_auroc)

    # ---- 13. ingestion-native uint8 sensor path, RECONCILED ---------------
    # VERDICT r3 weak #2: the documented "+9%" u8 win was contradicted by
    # the r3 artifact (u8 6% slower there).  This section measures BOTH
    # paths under ONE methodology: the same XOR loop-carried perturbation
    # (uint8 frames XOR a low bit; bf16 tensors XOR the mantissa LSB via a
    # u16 bitcast — bit-level twins, no dtype-dependent add), same batch,
    # same n_iters, back to back.  `sensor_u8_vs_bf16_same_loop` is the
    # honest ratio; the headline takes the u8 path only when it wins AND
    # passes the same 5e-2 accuracy bar.
    def sec_sensor_u8():
        from icra2021_multimodal_ad_tpu.ops.serving import _score_sensor

        r_u8 = jnp.asarray(rng.integers(0, 256, (B, 3, 32, 32)), jnp.uint8)
        d_u8 = jnp.asarray(rng.integers(0, 256, (B, 1, 32, 32)), jnp.uint8)
        t_n = jnp.asarray(rng.uniform(0, 400, (B, 1)), jnp.float32)
        m_n = jnp.asarray(rng.uniform(-30, 30, (B, 1, 13)), jnp.float32)

        def make_sensor():
            def body(i, acc):
                # integer payloads carry the loop dependency via a low-bit
                # XOR (adding eps would change their dtype)
                bit = (i % 2).astype(jnp.uint8) + jnp.uint8(acc * 0)
                eps = i.astype(jnp.float32) * 1e-9 + acc * 0
                return acc + jnp.sum(_score_sensor(
                    model, p16, state, fp16,
                    jnp.bitwise_xor(r_u8, bit), jnp.bitwise_xor(d_u8, bit),
                    t_n + eps, m_n + eps, dtype=jnp.bfloat16))
            return body

        def xor_bf16(v, bit):
            # flip the bf16 mantissa LSB — the bit-level twin of the u8
            # XOR (finite inputs only; uniform[0,1] test data has no infs)
            u = jax.lax.bitcast_convert_type(v, jnp.uint16)
            return jax.lax.bitcast_convert_type(
                jnp.bitwise_xor(u, bit), jnp.bfloat16)

        def make_bf16_xor():
            def body(i, acc):
                bit = (i % 2).astype(jnp.uint16) + jnp.uint16(acc * 0)
                mods_i = {k: xor_bf16(v, bit) for k, v in raw16.items()}
                return acc + jnp.sum(fused_score(fp16, p16, state, mods_i))
            return body

        tput_u8, spread_u8 = tput_stats(make_sensor, B)
        tput_16x, spread_16x = tput_stats(make_bf16_xor, B)
        nb = 4096
        s32s = _retry(lambda: _score_sensor(
            model, params, state, fusion_params, r_u8[:nb], d_u8[:nb],
            t_n[:nb], m_n[:nb], dtype=jnp.float32))
        s16s = _retry(lambda: _score_sensor(
            model, p16, state, fp16, r_u8[:nb], d_u8[:nb],
            t_n[:nb], m_n[:nb], dtype=jnp.bfloat16))
        rel_u8 = float(jnp.mean(jnp.abs(s16s - s32s)
                                / (jnp.abs(s32s) + 1e-6)))
        res["sensor_u8_windows_per_sec"] = round(tput_u8, 1)
        res["sensor_u8_windows_per_sec_spread"] = spread_u8
        res["sensor_u8_score_rel_err"] = round(rel_u8, 5)
        # the bf16-tensor twin under the IDENTICAL loop methodology, and
        # the ratio the docs must quote (>1 = u8 ingestion is faster)
        res["bf16_xor_windows_per_sec"] = round(tput_16x, 1)
        res["bf16_xor_windows_per_sec_spread"] = spread_16x
        res["sensor_u8_vs_bf16_same_loop"] = round(tput_u8 / tput_16x, 4)
        if rel_u8 < 5e-2 and tput_u8 > (res.get("value") or 0):
            res["value"] = round(tput_u8, 1)
            res["vs_baseline"] = round(
                tput_u8 / BASELINE_WINDOWS_PER_SEC, 3)
            res["headline_path"] = "sensor_u8_bf16"

    # invoked AFTER streaming+serve (below): those cost ~25 s warm while
    # this section's two timed loops have hit 300-640 s in slow tunnel
    # phases — if the budget cuts anything, cut the expensive one

    # ---- 14. latency north-star: streaming ticks (sequential + PIPELINED) -
    # BASELINE.md row 2 ("p50 per-window latency measured & minimized,
    # streaming path").  END-TO-END on the tunneled chip: subtract
    # dispatch_rtt_floor_ms for the chip-attributable part.  The sequential
    # tick pays ~2 tunnel round trips (dispatch + result fetch); the
    # pipelined mode (data/streaming.py run(pipelined=True)) fetches tick
    # i-1 while tick i executes, targeting ~1 RTT + host work.  Reference
    # contract: test_file/realtime_tester.py:292,309 (~1 s/tick target).
    def sec_streaming():
        if not have_nap:
            raise RuntimeError("needs nap_setup (stats)")
        from icra2021_multimodal_ad_tpu.data.streaming import (
            SimulatedSensors,
            StreamingDetector,
        )

        scfg = cfg.replace(batch_size=10, compute_dtype="bfloat16")
        n_ticks = 41  # first tick (compile) dropped by latency_stats

        def run_ticks(nap, pipelined=False):
            sim = SimulatedSensors(batch_size=10, seed=0)
            sim.fill(12)  # mic ring needs (batch+1) MFCC windows
            det = StreamingDetector(scfg, model, params, state,
                                    fusion_params, nap_stats=ctx["stats"])
            det.run(sim, n_ticks=n_ticks, nap=nap, pipelined=pipelined,
                    tick_hook=lambda i: sim.tick())
            return det.latency_stats()

        def ticks_stats(tag, nap, pipelined=False, repeats=3):
            """Median p50/p95 over `repeats` full runs of the SAME
            compiled tick programs, plus the p50 spread (VERDICT r4 weak
            #3: single-run tick latencies on a ±20% link).  Run 1 pays
            any residual compile; latency_stats drops its warm-up ticks,
            so every run's percentiles are comparable."""
            stats = [_retry(lambda: run_ticks(nap, pipelined=pipelined))
                     for _ in range(repeats)]
            p50s = sorted(s["p50_ms"] for s in stats)
            p95s = sorted(s["p95_ms"] for s in stats)
            res[f"{tag}_p50_ms"] = round(float(np.median(p50s)), 2)
            res[f"{tag}_p50_ms_spread"] = [round(p50s[0], 2),
                                           round(p50s[-1], 2)]
            res[f"{tag}_p95_ms"] = round(float(np.median(p95s)), 2)

        ticks_stats("streaming_tick", False)  # bf16 BASE one-program tick
        ticks_stats("streaming_tick_nap", True)  # bf16 NAP one-program tick
        # pipelined: overlap each tick's device round trip with the next
        # tick's dispatch (scores surface one 0.1 s grid step late)
        ticks_stats("streaming_tick_pipelined", False, pipelined=True)
        ticks_stats("streaming_tick_pipelined_nap", True, pipelined=True)

    run_section("streaming", 120, sec_streaming)

    # ---- 15. scoring-service round trip -----------------------------------
    def sec_serve():
        if not have_nap:
            raise RuntimeError("needs nap_setup (stats)")
        from icra2021_multimodal_ad_tpu.ops.score_server import (
            ScoreClient,
            ScoreServer,
        )

        server = ScoreServer(cfg.replace(compute_dtype="bfloat16"),
                             model, params, state, nap_stats=ctx["stats"],
                             max_batch=1024)
        port = server.start()
        try:
            xq = np.asarray(ctx["x_all"][:10], np.float32)
            with ScoreClient(("127.0.0.1", port)) as client:
                for op in ("score_base", "score_nap"):
                    _retry(lambda: client.score(xq, op=op))  # compile bucket
                    lats = []
                    for _ in range(30):
                        t0 = time.perf_counter()
                        client.score(xq, op=op)
                        lats.append(time.perf_counter() - t0)
                    tag = "serve" if op == "score_base" else "serve_nap"
                    res[f"{tag}_p50_ms"] = round(
                        float(np.percentile(lats, 50)) * 1e3, 2)
                    res[f"{tag}_p95_ms"] = round(
                        float(np.percentile(lats, 95)) * 1e3, 2)
                    # spread of per-block (10-sample) p50s — the same 30
                    # round trips, so the tunnel-variance bound costs
                    # nothing extra (VERDICT r4 weak #3)
                    blocks = sorted(
                        float(np.percentile(lats[i:i + 10], 50)) * 1e3
                        for i in (0, 10, 20))
                    res[f"{tag}_p50_ms_spread"] = [round(blocks[0], 2),
                                                   round(blocks[-1], 2)]
        finally:
            server.stop()

    run_section("serve", 90, sec_serve)

    run_section("sensor_u8", 300, sec_sensor_u8)

    # final line: the "partial" marker dropped; every failed/skipped
    # section's reason is in section_errors, wall times in section_wall_s
    res.pop("partial", None)
    res["bench_wall_s"] = round(time.monotonic() - t_start, 1)
    emit()


if __name__ == "__main__":
    main()
