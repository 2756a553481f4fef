"""Grid-search sweep runner — capability parity with utils/repeater.py:25-92.

The reference expands the cartesian product of list-valued config fields and
maps them over a multiprocessing.Pool with one process per GPU id.  Here the
same harness targets independent single-program runs (the sweep axis is
embarrassingly parallel — SURVEY.md §5 maps it to multi-slice/DCN scale-out):
each worker process runs one config; `max_workers` bounds concurrency.  A
`sequential=True` mode runs in-process (useful on a single TPU chip, where
concurrent processes would contend for the device).
"""

from __future__ import annotations

import itertools
import multiprocessing
import random
from concurrent.futures import ProcessPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence


def expand_grid(grid: Dict[str, Sequence[Any]],
                shuffle: bool = True, seed: int = 0) -> List[Dict[str, Any]]:
    """Cartesian-product expansion of {field: [values...]}
    (repeater.py:37-58), seeded shuffle."""
    keys = list(grid.keys())
    values = [v if isinstance(v, (list, tuple)) else [v] for v in grid.values()]
    configs = [dict(zip(keys, combo)) for combo in itertools.product(*values)]
    if shuffle:
        random.Random(seed).shuffle(configs)
    for i, c in enumerate(configs):
        c["progress"] = i + 1
    return configs


def convert(x, to=int, delimiter=","):
    """'1,2,3' -> [1, 2, 3] CLI list parsing (repeater.py:64-71)."""
    if isinstance(x, str):
        if delimiter in x:
            return list(map(to, x.split(delimiter)))
        return [to(x)]
    return [x]


#: marker key of a failed grid point's result row (see _invoke)
ERROR_KEY = "__error__"


def _invoke(f_and_config):
    """Module-level worker shim so ProcessPoolExecutor can pickle the call
    (closures cannot cross the process boundary — the round-1 sweep bug).

    Per-point failures return an {ERROR_KEY: reason} row instead of
    raising: one bad grid point must not abort the pool and discard hours
    of completed runs (pool.map re-raises the first worker exception)."""
    f, config = f_and_config
    try:
        return config, f(config)
    except Exception as e:  # noqa: BLE001 — reason lands in the result row
        return config, {ERROR_KEY: f"{type(e).__name__}: {e}"[:300]}


def _worker_init(device_ids, counter, env_var):
    """Pool initializer: pin each worker to one accelerator BEFORE jax
    initializes — the analog of the reference's one-process-per-GPU-id
    assignment (utils/repeater.py:25-62 passes gpu_id through the grid)."""
    import os

    if not device_ids:
        return
    with counter.get_lock():
        idx = counter.value
        counter.value += 1
    os.environ[env_var] = str(device_ids[idx % len(device_ids)])


class Repeater:
    """Run `f(overrides_dict)` over every grid point (repeater.py:25-62).

    `f` must be a module-level (picklable) callable for the parallel mode;
    results are collected and returned to the PARENT process as
    (config, result) pairs — any aggregation (e.g. Reporter rows) must
    happen there, since worker-side mutation is invisible to the parent.
    """

    def __init__(self, grid: Dict[str, Sequence[Any]], f: Callable,
                 max_workers: int = 1, seed: int = 0,
                 device_ids: Optional[Sequence] = None,
                 device_env_var: str = "TPU_VISIBLE_DEVICES"):
        self.grid = grid
        self.f = f
        self.max_workers = max_workers
        self.seed = seed
        self.device_ids = list(device_ids) if device_ids else None
        self.device_env_var = device_env_var

    def run(self, sequential: bool | None = None) -> list:
        """Returns [(config_dict, f(config_dict)), ...] in execution order."""
        configs = expand_grid(self.grid, seed=self.seed)
        print("Sweeping %d grid points." % len(configs))
        if sequential is None:
            sequential = self.max_workers <= 1
        if sequential:
            return [_invoke((self.f, c)) for c in configs]
        # spawn (not fork): workers re-import cleanly, which matters when
        # the parent already initialized a JAX backend; each worker is
        # pinned to one accelerator round-robin (reference: one process
        # per gpu_id) before jax initializes in it
        ctx = multiprocessing.get_context("spawn")
        counter = ctx.Value("i", 0)
        with ProcessPoolExecutor(
            max_workers=self.max_workers, mp_context=ctx,
            initializer=_worker_init,
            initargs=(self.device_ids, counter, self.device_env_var),
        ) as pool:
            return list(pool.map(_invoke, [(self.f, c) for c in configs]))
