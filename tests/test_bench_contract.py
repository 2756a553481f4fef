"""End-to-end pin of bench.py's OUTPUT CONTRACT — the thing the driver
actually consumes (VERDICT r4 item 1: two rounds running, the board was
measured but the artifact of record couldn't be parsed).

Runs the real bench as a CPU subprocess (BENCH_SECTIONS=rtt keeps it to
the rtt+setup sections) from a tmp copy of bench.py, so BOARD_PATH
resolves into the tmp dir and the repo's committed BENCH_BOARD.json is
never clobbered by a test run."""

import hashlib
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emission_contract_end_to_end(tmp_path):
    bench_copy = tmp_path / "bench.py"
    shutil.copy(os.path.join(REPO, "bench.py"), bench_copy)
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU (conftest pattern)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_SECTIONS"] = "rtt"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    run = subprocess.run([sys.executable, str(bench_copy)], env=env,
                         capture_output=True, timeout=420, text=True)
    assert run.returncode == 0, run.stderr[-2000:]
    lines = [ln for ln in run.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2  # board line(s) + summary line(s)

    # the LAST line is the compact summary: <= 1500 chars, valid JSON,
    # self-contained (metric contract + board pointer), final (the
    # 'partial' marker dropped)
    last = lines[-1]
    assert len(last) <= 1500, len(last)
    s = json.loads(last)
    assert s["metric"] == "fused_inference_windows_per_sec"
    assert s["unit"] == "windows/s/chip"
    assert "dispatch_rtt_floor_ms" in s
    assert "partial" not in s
    assert s["full_board"] == "BENCH_BOARD.json"

    # the driver's actual capture: the last ~2000 chars of stdout must
    # contain the summary as their last complete line
    tail = run.stdout[-2000:]
    parsed_tail = json.loads(tail.splitlines()[-1])
    assert parsed_tail == s

    # the full board file sits next to the EXECUTED bench.py, its sha16
    # matches the summary's pointer, and it carries what the summary
    # omits (section_errors explaining every skipped section)
    board_raw = (tmp_path / "BENCH_BOARD.json").read_text().rstrip("\n")
    assert (hashlib.sha256(board_raw.encode()).hexdigest()[:16]
            == s["full_board_sha256"])
    board = json.loads(board_raw)
    assert board["dispatch_rtt_floor_ms"] == s["dispatch_rtt_floor_ms"]
    assert "fused" in board["section_errors"]  # skipped-with-reason
    assert "rtt" in board["section_wall_s"]

    # every board line printed along the way is itself valid JSON
    # (kill-resilience: a truncated run's second-to-last line is a board)
    for ln in lines:
        json.loads(ln)


def test_bench_watchdog_line_is_compact_and_parseable(tmp_path):
    """The watchdog path — the clean-exit alternative to the driver's
    rc=124 kill when a tunnel call hangs — must ALSO leave a parseable
    final line inside the tail window (r4's watchdog wrote the full
    board, which had the same overflow risk as the healthy path).
    BENCH_TEST_HANG_S simulates the observed hang mode; a tiny budget +
    grace fires the watchdog ~5 s in."""
    bench_copy = tmp_path / "bench.py"
    shutil.copy(os.path.join(REPO, "bench.py"), bench_copy)
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_SECTIONS"] = "rtt"
    env["BENCH_BUDGET_S"] = "3"
    env["BENCH_WATCHDOG_GRACE_S"] = "2"
    env["BENCH_TEST_HANG_S"] = "60"  # >> budget+grace: watchdog must end it
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    run = subprocess.run([sys.executable, str(bench_copy)], env=env,
                         capture_output=True, timeout=120, text=True)
    # exits 0 BY the watchdog (os._exit(0)), well before the 60 s hang
    assert run.returncode == 0, run.stderr[-2000:]
    lines = [ln for ln in run.stdout.splitlines() if ln.strip()]
    last = lines[-1]
    assert len(last) <= 1500, len(last)
    s = json.loads(last)
    assert s["watchdog"] == "fired"
    assert s["partial"] is True  # the run never reached the final emit
    assert s["metric"] == "fused_inference_windows_per_sec"
    # and the same line is what a 2000-char tail capture would parse
    assert json.loads(run.stdout[-2000:].splitlines()[-1]) == s
