"""Multi-host helpers exercised in single-process mode, and mesh utilities."""

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
