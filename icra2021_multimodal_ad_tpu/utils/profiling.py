"""Tracing / profiling — the TPU-native replacement for the reference's
ad-hoc `time.time()` prints (SURVEY.md §5: novelty_detection.py:216-221,
utils/metric.py:208-224, FullTest.py:126-128, realtime_tester.py:292-309).

Two layers:
  * `timed` / `Timer`: wall-clock spans with `block_until_ready` so device
    work is actually counted (a bare time.time() around dispatched JAX ops
    measures dispatch, not compute — the reference's numbers had this flaw
    on GPU).
  * `trace`: a jax.profiler trace context producing xprof/tensorboard dumps
    for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Timer:
    """Named wall-clock accumulator with device sync."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync: bool = True):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                _sync()
            dt = time.perf_counter() - start
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, dict]:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }


def timed(fn, *args, warmup: int = 1, iters: int = 10, **kw):
    """Mean wall time of fn(*args) with compile excluded and results synced."""
    for _ in range(max(warmup, 0)):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace",
          host_tracer_level: Optional[int] = None):
    """jax.profiler trace context -> xprof dump under log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync():
    (jax.device_put(0) + 0).block_until_ready()
