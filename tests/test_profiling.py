"""Profiling/debug utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.utils.profiling import StepTimer, debug_mode, trace


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        x = jnp.sum(jnp.ones(16))
        t.stop(sync_value=x)
    assert len(t.times) == 3
    assert t.mean > 0
    assert t.throughput(8) > 0


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    # jax writes a plugins/profile tree under the log dir
    assert any(tmp_path.rglob("*.pb")) or any(tmp_path.rglob("*.json.gz")) or any(
        tmp_path.iterdir()
    )


def test_debug_mode_catches_nan():
    with pytest.raises(FloatingPointError):
        with debug_mode(nans=True):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_debug_mode_clean_pass():
    with debug_mode(nans=True):
        out = jax.jit(lambda x: x * 2)(jnp.ones(4))
        np.testing.assert_array_equal(np.asarray(out), 2.0)
