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
    JAX_PROCESS_ID env vars).  On Cloud TPU pod slices — detected via the
    runtime's worker env vars — jax's own auto-detection runs with no args.
    Returns True when initialization ran, False for the single-host no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod runtimes export worker topology; in that case
        # jax.distributed.initialize() auto-detects everything.  Plain
        # single hosts stay a no-op — calling initialize() there would
        # raise.  (Detection requires MULTIPLE workers: single-host TPU
        # runtimes also export TPU_WORKER_HOSTNAMES with one entry.)
        if _cloud_tpu_pod_detected():
            import jax

            jax.distributed.initialize()
            return True
        return False  # single host: nothing to coordinate

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _cloud_tpu_pod_detected() -> bool:
    """True when the Cloud TPU runtime env describes a MULTI-worker slice
    (jax.distributed.initialize() can then auto-detect the cluster)."""
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
             if h.strip()]
    if len(hosts) > 1:
        return True
    return "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
