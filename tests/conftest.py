"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
logic (mesh, NamedSharding, collectives) is exercised without TPU pods —
the SURVEY.md §4 strategy.

Note: this container's sitecustomize imports jax and points it at a remote
TPU tunnel (JAX_PLATFORMS=axon) before any test code runs, so plain env-var
exports are too late — we must override through jax.config before the
backend is initialized. Unit tests over the tunnel are pathologically slow
(every host sync is a network round trip), so forcing CPU here is
mandatory, not cosmetic.
"""

import os
import sys

# XLA reads this at (lazy) backend init, which has not happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already in sys.modules via sitecustomize)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
