"""Driver entry points (__graft_entry__.py).

The driver compile-checks `entry()` and runs `dryrun_multichip(n)` with N
virtual CPU devices; these tests pin the two cheap invariants that have
actually broken: the entry's jittability and `_ensure_devices`'
re-provisioning when JAX was ALREADY initialized on a single-device CPU
backend (the XLA_FLAGS env mutation is not re-read after a backend init;
jax_num_cpu_devices is — __graft_entry__._ensure_devices).

Subprocess-isolated: _ensure_devices tears down and rebuilds the global
backend, which must not leak into the suite's 8-device mesh.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PROBE_ENSURE = r"""
import jax
assert len(jax.devices()) == 1, jax.devices()  # pinned single-device start
import __graft_entry__ as g
g._ensure_devices(8)
assert len(jax.devices()) >= 8, jax.devices()
assert jax.default_backend() == "cpu"
# and the re-provisioned backend actually executes
import jax.numpy as jnp
mesh = jax.sharding.Mesh(jax.devices()[:8], ("data",))
s = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
x = jax.device_put(jnp.arange(16.0), s)
assert float(jax.jit(lambda v: v.sum())(x)) == 120.0
print("ENSURE_OK")
"""

PROBE_ENTRY = r"""
import jax
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
assert out.shape == (4, 256, 256, 10), out.shape
print("ENTRY_OK")
"""


def _run(probe: str) -> str:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    # No xla_force_host_platform_device_count: the probe must provision
    # its own devices from a 1-device start.
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c", probe],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_ensure_devices_reprovisions_initialized_backend():
    assert "ENSURE_OK" in _run(PROBE_ENSURE)


def test_entry_jits_on_cpu():
    assert "ENTRY_OK" in _run(PROBE_ENTRY)
