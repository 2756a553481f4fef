"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

The environment may pre-register an experimental TPU backend from
sitecustomize (triggered by PALLAS_AXON_POOL_IPS) and programmatically set
jax_platforms — env vars alone don't win against that, so we also update
jax.config directly before any backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep subprocesses CPU-only too
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.local_device_count() == 8 and jax.devices()[0].platform == "cpu", (
    "tests require an 8-device CPU mesh; got " + repr(jax.devices())
)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True)
def _seed_torch_rng():
    """The parity oracles draw torch weights (nn.Linear/BatchNorm inits,
    randn_like); unseeded draws would make any tolerance failure
    irreproducible — against the repo's no-unseeded-randomness discipline.
    Collection imports torch before fixtures run, so seeding via
    sys.modules covers every test without force-importing torch here."""
    if "torch" in sys.modules:
        sys.modules["torch"].manual_seed(0)
