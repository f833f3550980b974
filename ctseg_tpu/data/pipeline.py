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


def epoch_batches(images, labels, indicators, size, batch_size, key):
    """Shared epoch generator: shuffled gathers, trailing partial dropped."""
    perm = (
        jax.random.permutation(key, size) if key is not None else jnp.arange(size)
    )
    for b in range(size // batch_size):
        idx = jax.lax.dynamic_slice_in_dim(perm, b * batch_size, batch_size)
        yield (
            jnp.take(images, idx, axis=0),
            jnp.take(labels, idx, axis=0),
            jnp.take(indicators, idx, axis=0),
        )


def padded_epoch_batches(images, labels, indicators, size, batch_size, key):
    """Shared full-coverage generator: every sample exactly once, trailing
    batch padded with row_valid=False rows (index-0 padding)."""
    perm, row_valid, num_batches = padded_permutation(size, batch_size, key)
    for b in range(num_batches):
        lo = b * batch_size
        idx = jax.lax.dynamic_slice_in_dim(perm, lo, batch_size)
        yield (
            jnp.take(images, idx, axis=0),
            jnp.take(labels, idx, axis=0),
            jnp.take(indicators, idx, axis=0),
            jax.lax.dynamic_slice_in_dim(row_valid, lo, batch_size),
        )


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
        return epoch_batches(
            self.images, self.labels, self.indicators,
            self.size, self.batch_size, key,
        )

    def padded_epoch(
        self, key: Optional[jax.Array] = None
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Yield (image, label, indicator, row_valid) batches covering EVERY
        sample exactly once; the trailing batch is padded (row_valid=False
        rows) instead of dropped. For evaluation — never biases the split."""
        return padded_epoch_batches(
            self.images, self.labels, self.indicators,
            self.size, self.batch_size, key,
        )
