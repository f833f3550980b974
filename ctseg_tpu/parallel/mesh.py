"""Device mesh construction and sharding policies.

The reference has no in-repo distribution (its ceiling was unexercised
Lightning-DDP flags, SURVEY.md §2); here multi-chip is first-class:

  - 1-D 'data' mesh: pjit data parallelism — batches sharded over ICI,
    params replicated, XLA inserts the gradient all-reduce.
  - 2-D ('data', 'space') mesh: spatially-partitioned 3D training (volume
    depth sharded over 'space', per-level constraints in models/unet.py)
    and spatially-sharded sliding-window inference (ctseg_tpu/inference).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh spans all processes' devices and per-host batches combine with
`jax.make_array_from_process_local_data`.
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (
            f"requested {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == len(devices)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def make_spatial_mesh(n_data: int, n_space: int) -> Mesh:
    """2-D ('data', 'space') mesh for spatially-partitioned 3D training.

    Batches shard over 'data'; the volume depth axis shards over 'space'
    (the model pins per-level shardings — models/unet.py::_constrain_depth —
    and XLA inserts the conv halo exchanges). Lay 'space' innermost so its
    halo ppermutes ride adjacent-chip ICI links.
    """
    return make_mesh(
        n_data * n_space, axis_names=("data", "space"), shape=(n_data, n_space)
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
