"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

Runs in subprocesses: enable_compilation_cache mutates global jax.config,
which must not leak into the rest of the suite. Verifies the env contract
(default dir under data storage, explicit path, "off") and that a second
process actually hits the on-disk cache.
"""

import os
import subprocess
import sys
from pathlib import Path

PROBE = r"""
import sys
from ctseg_tpu.utils.compile_cache import enable_compilation_cache
out = enable_compilation_cache()
print("DIR=" + ("" if out is None else str(out)))
if out is not None:
    import jax, jax.numpy as jnp
    assert jax.config.jax_compilation_cache_dir == str(out)
    float(jax.jit(lambda x: (x * x).sum())(jnp.arange(8.0)))
"""


def _run(tmp_path, **env_overrides):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update(
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        CTSEG_DATA_STORAGE=str(tmp_path / "storage"),
    )
    env.update(env_overrides)
    res = subprocess.run(
        [sys.executable, "-c", PROBE],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    line = [l for l in res.stdout.splitlines() if l.startswith("DIR=")][0]
    return line[len("DIR="):]


def test_default_dir_under_data_storage(tmp_path):
    d = _run(tmp_path)
    assert d == str(tmp_path / "storage" / "xla_cache")
    # the jitted probe program must have left entries on disk
    assert any(Path(d).iterdir())


def test_env_off_disables(tmp_path):
    assert _run(tmp_path, CTSEG_COMPILATION_CACHE="off") == ""


def test_env_path_overrides(tmp_path):
    d = _run(tmp_path, CTSEG_COMPILATION_CACHE=str(tmp_path / "elsewhere"))
    assert d == str(tmp_path / "elsewhere")
    assert any(Path(d).iterdir())
