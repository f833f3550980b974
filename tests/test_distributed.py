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


def _launch_workers(extra_args, timeout=180):
    """Run tests/_distributed_worker.py twice (2 CPU devices each), return
    per-process outputs."""
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
            [sys.executable, worker, str(port), str(i), "2", *extra_args(i)],
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
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers timed out; partial output: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    return outs


def test_two_process_collectives():
    """initialize + global_mesh + host_local_batch_to_global across two real
    OS processes (2 virtual CPU devices each; all-reduce over gloo)."""
    outs = _launch_workers(lambda i: [])
    for out in outs:
        assert "OK 96.0" in out, out


def test_two_process_train_step_matches_single_process(tmp_path):
    """REAL multi-host training correctness: two OS processes each feed only
    their local batch rows into the jitted Trainer._train_step over the
    global 4-device mesh (gradient all-reduce over gloo); the resulting
    param trajectory must equal a single-process 4-device mesh run on the
    same global batches (f64). The reference's DDP-equivalent claim
    (SURVEY §5.8) made concrete."""
    from _dist_common import global_batches, train_config_kwargs

    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    # ---- single-process oracle (all 4 devices in this process)
    mesh = make_mesh(4)
    trainer = Trainer(TrainConfig(**train_config_kwargs()), mesh=mesh)
    state = trainer.init_state()
    key = jax.random.key(7)
    oracle_losses = []
    for s, batch in enumerate(global_batches()):
        batch = jax.device_put(batch, batch_sharding(mesh))
        state, metrics = trainer._train_step(
            state, batch, jax.random.fold_in(key, s)
        )
        oracle_losses.append(float(metrics["loss/total"]))
    oracle_flat = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(state.params)]
    )

    # ---- two real processes, local shards only
    out_paths = [tmp_path / f"params_{i}.npy" for i in range(2)]
    outs = _launch_workers(
        lambda i: ["train", str(out_paths[i])], timeout=300
    )

    worker_losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert lines, out
        worker_losses.append([float(v) for v in lines[0].split()[1:]])
    # both processes observed the same per-step global losses...
    assert worker_losses[0] == worker_losses[1]
    # ...equal to the single-process run (f64; gloo vs XLA reduction order
    # may differ in the last bits)
    np.testing.assert_allclose(
        worker_losses[0], oracle_losses, rtol=1e-9, atol=1e-12
    )
    # and the final parameter trees match across processes AND topologies.
    flats = [np.load(p) for p in out_paths]
    np.testing.assert_array_equal(flats[0], flats[1])
    assert flats[0].shape == oracle_flat.shape
    np.testing.assert_allclose(flats[0], oracle_flat, rtol=1e-9, atol=1e-12)
