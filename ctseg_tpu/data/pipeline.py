"""Device-resident input pipeline.

The whole split is pushed to HBM once (optionally sharded over a mesh's data
axis); every epoch is just a permutation + on-device gathers. There are no
dataloader worker processes and no per-step host->device transfers — the
TPU-native answer to the reference's `num_workers=cpu_count()` DataLoaders
(capstone/data/data_module.py:46-71).
"""

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.data.datasets import PackedDataset2D


def padded_permutation(
    size: int, batch_size: int, key: Optional[jax.Array] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Index permutation padded up to a whole number of batches.

    Returns (perm, row_valid, num_batches): `perm` has
    `num_batches * batch_size` entries covering every index in [0, size)
    exactly once, padded with index 0; `row_valid[i]` is False for the
    padded tail. Fixed batch shapes keep jit happy while every sample is
    still evaluated exactly once (the reference's DataLoaders never drop
    samples, capstone/data/data_module.py:46-71).
    """
    num_batches = -(-size // batch_size)
    perm = (
        jax.random.permutation(key, size) if key is not None else jnp.arange(size)
    )
    pad = num_batches * batch_size - size
    if pad:
        perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    row_valid = jnp.arange(num_batches * batch_size) < size
    return perm, row_valid, num_batches


class DevicePipeline2D:
    """HBM-resident 2D slice pipeline yielding raw-HU batches.

    Windowing/augmentation happen later inside the jitted step; this only
    gathers (image, label, indicator) batches. `epoch` drops incomplete
    trailing batches for shape stability under jit (with shuffling this does
    not bias training); evaluation must use `padded_epoch`, which covers
    every sample exactly once via a padded-and-masked final batch.
    """

    def __init__(
        self,
        dataset: PackedDataset2D,
        batch_size: int,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.batch_size = batch_size
        self.size = len(dataset)
        assert self.size >= batch_size, "dataset smaller than one batch"
        device_put = (
            (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
        )
        self.images = device_put(jnp.asarray(dataset.images, dtype=jnp.float32))
        self.labels = device_put(jnp.asarray(dataset.labels, dtype=jnp.int32))
        self.indicators = device_put(jnp.asarray(dataset.indicators, jnp.float32))

    def num_batches(self, drop_remainder: bool = True) -> int:
        if drop_remainder:
            return self.size // self.batch_size
        return -(-self.size // self.batch_size)

    def epoch(
        self, key: Optional[jax.Array] = None
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Yield one epoch of batches; shuffled when a key is given."""
        if key is not None:
            perm = jax.random.permutation(key, self.size)
        else:
            perm = jnp.arange(self.size)
        for b in range(self.num_batches()):
            idx = jax.lax.dynamic_slice_in_dim(perm, b * self.batch_size, self.batch_size)
            yield (
                jnp.take(self.images, idx, axis=0),
                jnp.take(self.labels, idx, axis=0),
                jnp.take(self.indicators, idx, axis=0),
            )

    def padded_epoch(
        self, key: Optional[jax.Array] = None
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Yield (image, label, indicator, row_valid) batches covering EVERY
        sample exactly once; the trailing batch is padded (row_valid=False
        rows) instead of dropped. For evaluation — never biases the split."""
        perm, row_valid, num_batches = padded_permutation(
            self.size, self.batch_size, key
        )
        for b in range(num_batches):
            lo = b * self.batch_size
            idx = jax.lax.dynamic_slice_in_dim(perm, lo, self.batch_size)
            yield (
                jnp.take(self.images, idx, axis=0),
                jnp.take(self.labels, idx, axis=0),
                jnp.take(self.indicators, idx, axis=0),
                jax.lax.dynamic_slice_in_dim(row_valid, lo, self.batch_size),
            )
