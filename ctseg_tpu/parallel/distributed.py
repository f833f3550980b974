"""Multi-host (multi-process) distributed setup.

The TPU-native replacement for the reference's latent Lightning-DDP path
(SURVEY.md §5.8): `jax.distributed.initialize` + a global mesh spanning all
processes, with per-host input shards combined into global arrays via
`jax.make_array_from_process_local_data`. Gradient all-reduce is inserted by
XLA from the Trainer's shardings; nothing else changes between single-host
and multi-host runs.

Single-host usage needs none of this; the Trainer takes any mesh.
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax distributed runtime (no-op if single process).

    On TPU pods the arguments are auto-detected from the environment;
    elsewhere pass coordinator_address="host:port", num_processes, and
    process_id explicitly. A no-arg call on a plain single host (no cluster
    environment detected) is a documented no-op — jax's auto-detection
    would raise there, breaking scripts that call this unconditionally.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        import os

        cluster_envs = (
            "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
        )
        if not any(e in os.environ for e in cluster_envs):
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """Mesh over ALL devices across ALL processes."""
    devices = np.asarray(jax.devices())
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def host_local_batch_to_global(
    batch, mesh: Mesh, axis: str = "data"
):
    """Combine each process's local batch shard into one global array.

    Every process passes its own slice of the global batch (equal sizes);
    the result is a sharded global array usable by the jitted train step.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
