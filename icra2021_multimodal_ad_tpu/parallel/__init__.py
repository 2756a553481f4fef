"""Device-mesh parallelism helpers (new capability — the reference is
single-GPU; novelty_detection.py:140).  Data parallelism shards the window
axis over ICI; XLA inserts the gradient psum from sharding propagation."""

from icra2021_multimodal_ad_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    shard_batch,
    replicate,
)
