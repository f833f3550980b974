"""Label-map <-> mask-stack conversions (channel-last layout).

Numerical contracts from the reference:
  squash_masks: 9 binary masks x class ids 1..9, max over the structure axis
    -> one integer label map; overlapping structures resolve to the highest
    class id (reference capstone/training/utils.py:13-16).
  squash_predictions: softmax + argmax over the class axis
    (reference capstone/training/utils.py:19-20) — softmax is monotonic so we
    argmax the logits directly (identical result, one fewer pass over HBM).
"""

import jax
import jax.numpy as jnp


def squash_masks(masks: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(..., S) stack of S binary structure masks -> (...) integer label map.

    Structure s (0-based channel) gets class id s+1; background is 0. Where
    structures overlap the highest class id wins.
    """
    n_structures = n_classes - 1
    assert masks.shape[-1] == n_structures, (
        f"expected {n_structures} structure masks, got {masks.shape[-1]}"
    )
    class_ids = jnp.arange(1, n_classes, dtype=jnp.int32)
    return jnp.max(masks.astype(jnp.int32) * class_ids, axis=-1)


def squash_predictions(logits: jnp.ndarray) -> jnp.ndarray:
    """(..., C) logits -> (...) predicted label map (argmax; softmax-free)."""
    return jnp.argmax(logits, axis=-1)


def one_hot(labels: jnp.ndarray, n_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    """(...) integer label map -> (..., C) one-hot."""
    return jax.nn.one_hot(labels, n_classes, dtype=dtype)
