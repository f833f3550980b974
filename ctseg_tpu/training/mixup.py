"""Weighted mixup, fully on device with jax PRNG.

Contract from reference capstone/training/utils.py:23-56: partner sampling
via a multinomial over inverse per-sample mean annotation counts (rare
structures get picked more), one lambda ~ Beta(alpha, alpha) per batch,
mix = lambda * x + (1 - lambda) * x[index]. The reference draws lambda from
a host-side global numpy RNG inside the step; here everything derives from
the step's PRNG key (distributional parity, SURVEY.md §7).

Structure presence is derived from the label map (class s+1 present
anywhere); the reference derives it from the raw binary masks — identical
unless a structure is entirely occluded by a higher-id overlap.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import ANNOTATION_COUNT, NUM_CLASSES


def structure_presence(labels: jnp.ndarray) -> jnp.ndarray:
    """(N, *spatial) label map -> (N, 9) float presence indicator."""
    spatial = tuple(range(1, labels.ndim))
    class_ids = jnp.arange(1, NUM_CLASSES)
    eq = labels[..., None] == class_ids  # (N, *spatial, 9)
    return jnp.any(eq, axis=spatial).astype(jnp.float32)


def weighted_mixup(
    key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray, alpha: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mixed_images, partner_index, lambda)."""
    batch = images.shape[0]
    count = jnp.asarray(ANNOTATION_COUNT, jnp.float32)

    indicator = structure_presence(labels) * count  # (N, 9)
    # Samples with no structures get the full count row so probabilities
    # stay finite without distorting the rest (reference utils.py:31-36).
    empty = jnp.sum(indicator, axis=1, keepdims=True) == 0
    indicator = indicator + empty * jnp.sum(count)

    nonzero = jnp.sum(indicator > 0, axis=1)
    probability = 1.0 / (jnp.sum(indicator, axis=1) / nonzero)
    probability = probability / jnp.sum(probability)

    k_lambda, k_index = jax.random.split(key)
    lam = jax.random.beta(k_lambda, alpha, alpha)
    index = jax.random.categorical(
        k_index, jnp.log(probability), shape=(batch,)
    )
    mixed = mixup_tensors(images, jnp.take(images, index, axis=0), lam)
    return mixed, index, lam


def plain_mixup(
    key: jax.Array, images: jnp.ndarray, alpha: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform-permutation mixup (reference mixup_data, utils.py:45-52)."""
    k_lambda, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lambda, alpha, alpha)
    index = jax.random.permutation(k_perm, images.shape[0])
    mixed = mixup_tensors(images, jnp.take(images, index, axis=0), lam)
    return mixed, index, lam


def mixup_tensors(a: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    return lam * a + (1.0 - lam) * b
