"""Two-process jax.distributed bring-up — the one leg of SURVEY.md §5's
distributed mapping that env-parsing unit tests cannot cover (VERDICT r2
missing #2): actually initialize a 2-process cluster on loopback CPU,
check the global device view, and psum a constant ACROSS processes.

Real multi-chip cannot run here (one tunneled v5e); this is the process
bring-up smoke test: coordinator + worker on 127.0.0.1, gloo CPU
collectives (jax's default `jax_cpu_collectives_implementation`).  The pod
runbook this validates is in ARCHITECTURE.md (multi-host section).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from icra2021_multimodal_ad_tpu.parallel.distributed import (
    initialize_multihost,
)
ran = initialize_multihost(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert ran, "initialize_multihost returned False with explicit coords"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
# one local CPU device per process -> two global devices
assert jax.local_device_count() == 1, jax.local_devices()
assert len(jax.devices()) == 2, jax.devices()

import numpy as np
from jax import lax

# multi-host pmap: each process maps over its local device, the named axis
# spans the GLOBAL device set, so the psum crosses the process boundary
out = jax.pmap(lambda x: lax.psum(x, "i"), axis_name="i")(
    np.full((1, 1), pid + 1, np.float32))
total = float(np.asarray(out)[0, 0])
assert total == 3.0, total  # (0+1) + (1+1) summed across both processes
print("DISTOK process=%d world=%d psum=%.1f" % (pid, jax.process_count(),
                                                total), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
    except OSError as e:  # pragma: no cover - env guard
        pytest.skip(f"cannot bind a loopback port: {e}")
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed_psum():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunnel backend in children
    # each child gets exactly ONE local CPU device (the parent's forced-8
    # flag would make the world 16 and the assertions device-count-relative)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\S+", "",
        env.get("XLA_FLAGS", "")).strip()

    code = _WORKER.format(repo=_REPO)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(pid), str(port)],
                         env=env, cwd=_REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:  # pragma: no cover - env guard
        for p in procs:
            p.kill()
        pytest.fail("distributed bring-up timed out (coordinator deadlock?)")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "DISTRIBUTED_INIT_UNAVAILABLE" in out:
            pytest.skip(f"jax.distributed unavailable here: {out[-400:]}")
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"DISTOK process={pid} world=2 psum=3.0" in out, out
