"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU-native analogue of multi-node testing without a cluster
(SURVEY.md §4): sharding/collective tests exercise a real 8-way
`jax.sharding.Mesh` backed by host CPU devices.

Some environments pin JAX to a hardware backend via a sitecustomize hook that
initializes the backend at interpreter startup — before any conftest can set
JAX_PLATFORMS. In that case the already-initialized backends are cleared and
re-resolved to CPU so the suite is fast, deterministic, float64-capable, and
8-way shardable regardless of the host's accelerator situation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

# jax may have been imported (and even initialized) at interpreter startup by
# a sitecustomize hook with a hardware JAX_PLATFORMS; reset and re-pin to CPU
# BEFORE the first jax.devices() call of the test session.
if _xb.backends_are_initialized():
    _xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # for float64 torch-parity oracles

assert jax.default_backend() == "cpu", "could not force the CPU platform"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(seed=0)
