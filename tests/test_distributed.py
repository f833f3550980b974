"""Multi-host helpers: single-process mode, mesh utilities, and a REAL
two-process run (subprocess CPU workers + gloo collectives)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from ctseg_tpu.parallel import batch_sharding, make_mesh, replicated
from ctseg_tpu.parallel.distributed import (
    global_mesh,
    host_local_batch_to_global,
    initialize,
)


def test_initialize_single_process_noop():
    initialize(num_processes=1)  # must not raise


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_host_local_batch_to_global(rng):
    mesh = global_mesh()
    batch = (
        rng.random((16, 8, 8)).astype(np.float32),
        rng.integers(0, 10, size=(16, 8, 8)).astype(np.int32),
    )
    global_batch = host_local_batch_to_global(batch, mesh)
    assert global_batch[0].shape == (16, 8, 8)
    # single process: values pass through unchanged
    np.testing.assert_array_equal(np.asarray(global_batch[0]), batch[0])
    # sharded over the data axis
    assert len(global_batch[0].sharding.device_set) == mesh.size


def test_make_mesh_subsets_and_shardings():
    mesh = make_mesh(4)
    assert mesh.size == 4
    bs = batch_sharding(mesh)
    rs = replicated(mesh)
    x = jax.device_put(np.zeros((8, 4), np.float32), bs)
    assert len(x.sharding.device_set) == 4
    y = jax.device_put(np.zeros((8, 4), np.float32), rs)
    assert y.sharding.is_fully_replicated


def test_make_mesh_2d():
    mesh = make_mesh(8, axis_names=("data", "space"), shape=(4, 2))
    assert mesh.shape == {"data": 4, "space": 2}


def test_two_process_collectives():
    """initialize + global_mesh + host_local_batch_to_global across two real
    OS processes (2 virtual CPU devices each; all-reduce over gloo)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = Path(__file__).resolve().parents[1]
    env = {
        k: v for k, v in os.environ.items() if k not in ("PYTHONPATH", "XLA_FLAGS")
    }
    env.update(
        PYTHONPATH=str(repo),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    worker = str(repo / "tests" / "_distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers timed out; partial output: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK 96.0" in out, out
