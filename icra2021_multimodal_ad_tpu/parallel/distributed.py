"""Multi-host initialization — the jax.distributed leg of SURVEY.md §5's
distributed mapping (Mesh over ICI within a slice; DCN across slices).

The reference has no distributed backend at all (no torch.distributed /
NCCL / MPI anywhere, SURVEY.md §2 parallelism note).  Here multi-host runs
initialize once at process start; a single-host run is a silent no-op, so
every CLI can call this unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host coordinates are available
    (explicit args or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars; on Cloud TPU pods jax auto-detects with no
    args).  Returns True when initialization ran, False for the single-host
    no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        return False  # single host: nothing to coordinate

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
