"""Persistent XLA compilation cache for the CLIs.

First compiles over the tunneled TPU cost 20-120+ s per program; without a
persistent cache EVERY CLI invocation pays them again.  JAX's compilation
cache serializes compiled executables to disk keyed by program hash —
measured on the axon tunnel: a cold single-program run at 384 s wall
dropped to 162 s on the next invocation (the residual is backend init).

Enabled by every entry point before the first trace.  Opt out with
ICRA_TPU_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR
(standard JAX env var, honored by jax itself).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "icra2021_multimodal_ad_tpu", "jax"
)


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point jax at a persistent compilation cache directory.  Returns the
    directory in use, or None when disabled/unavailable.  Safe to call more
    than once; a JAX_COMPILATION_CACHE_DIR env var wins over the default."""
    if os.environ.get("ICRA_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >= 1 s to compile (the tunnel's floor is
        # far above this; tiny host programs aren't worth the disk churn)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return None
