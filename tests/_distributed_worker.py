"""Worker for the real multi-process distributed tests (not a pytest module).

Launched twice by tests/test_distributed.py with JAX_PLATFORMS=cpu and 2
virtual CPU devices per process. Two modes:
  - collectives (default): initialize, global_mesh over both processes,
    host_local_batch_to_global, and a jitted cross-process reduction (XLA
    inserts the all-reduce over gloo).
  - train <out.npy>: build a real Trainer on the global mesh, run the
    jitted _train_step for N_STEPS with per-process LOCAL batch shards,
    print per-step losses, and dump the final flattened param vector —
    the pytest parent compares it against a single-process oracle run
    (multi-host gradient all-reduce correctness, SURVEY §5.8).
"""

import sys

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ctseg_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    host_local_batch_to_global,
    initialize,
)


def train_mode(out_path: str) -> None:
    """Real multi-host training: every process feeds only ITS batch rows."""
    import _dist_common as common  # noqa: E402 (tests/ is on sys.path)

    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    mesh = global_mesh()
    trainer = Trainer(TrainConfig(**common.train_config_kwargs()), mesh=mesh)
    state = trainer.init_state()
    key = jax.random.key(7)

    pid = jax.process_index()
    local = common.GLOBAL_BATCH // jax.process_count()
    lo = pid * local
    losses = []
    for s, (images, labels, inds) in enumerate(common.global_batches()):
        batch = host_local_batch_to_global(
            (
                images[lo : lo + local],
                labels[lo : lo + local],
                inds[lo : lo + local],
            ),
            mesh,
        )
        state, metrics = trainer._train_step(
            state, batch, jax.random.fold_in(key, s)
        )
        # loss/total is fully replicated -> fetchable on every process; it
        # already includes the cross-process gradient story (the loss is
        # computed from the globally-sharded batch).
        losses.append(float(metrics["loss/total"]))

    flat = np.concatenate(
        [np.asarray(jax.device_get(x)).ravel()
         for x in jax.tree.leaves(state.params)]
    )
    np.save(out_path, flat)
    print("LOSSES " + " ".join(f"{v:.17e}" for v in losses), flush=True)


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

    if len(sys.argv) > 4 and sys.argv[4] == "train":
        train_mode(sys.argv[5])
        return

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
