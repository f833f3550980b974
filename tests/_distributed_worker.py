"""Worker for the real multi-process distributed test (not a pytest module).

Launched twice by tests/test_distributed.py::test_two_process_collectives
with JAX_PLATFORMS=cpu and 2 virtual CPU devices per process. Exercises the
full multi-host path of ctseg_tpu.parallel.distributed — initialize,
global_mesh over both processes, host_local_batch_to_global, and a jitted
cross-process reduction (XLA inserts the all-reduce over gloo).
"""

import sys

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ctseg_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    host_local_batch_to_global,
    initialize,
)


def main() -> None:
    port, process_id, num_processes = sys.argv[1:4]
    process_id, num_processes = int(process_id), int(num_processes)
    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 2 * num_processes, jax.device_count()

    mesh = global_mesh()
    assert mesh.size == 2 * num_processes

    # Each process contributes a distinct local shard; the global batch is
    # their concatenation in process order.
    local = np.full((4, 8), float(process_id + 1), np.float32)
    (batch,) = host_local_batch_to_global((local,), mesh)
    assert batch.shape == (4 * num_processes, 8)

    # Cross-process reduction: the sum needs every shard.
    total = jax.jit(jnp.sum)(batch)
    expected = 4 * 8 * sum(range(1, num_processes + 1))
    np.testing.assert_allclose(float(total), expected)

    # A sharded matmul whose result every process reads back.
    w = jnp.ones((8, 3), jnp.float32)
    out = jax.jit(lambda b, w: jnp.sum(b @ w))(batch, w)
    np.testing.assert_allclose(float(out), expected * 3)

    print(f"OK {float(total)}", flush=True)


if __name__ == "__main__":
    main()
