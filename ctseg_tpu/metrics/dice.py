"""Dice metric with the reference's NaN semantics, NaN-free.

The reference computes per-(sample, class) Dice with NaN wherever the ground
truth class is empty, then does NaN-aware reductions
(capstone/models/temp.py:173-214, 233-292; capstone/models/metrics.py:8-31).
NaN bookkeeping is hostile to XLA and to `jax.debug_nans`; we carry an
explicit (value, valid) pair instead and prove equality in tests.

Layout: predictions and targets are integer label maps (N, *spatial);
one-hot/binarization happens internally over a trailing class axis.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import NUM_CLASSES


def dice_per_sample_class(
    pred_labels: jnp.ndarray,
    target_labels: jnp.ndarray,
    n_classes: int = NUM_CLASSES,
    include_background: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, class) Dice of two integer label maps.

    Returns (dice, valid): both (N, C') with C' = n_classes - 1 when
    background is excluded. `valid[i, c]` is False where the ground-truth
    class is empty (the reference's NaN); `dice` is 0 there.
    """
    pred = jax.nn.one_hot(pred_labels, n_classes, dtype=jnp.float32)
    target = jax.nn.one_hot(target_labels, n_classes, dtype=jnp.float32)
    if not include_background:
        pred = pred[..., 1:]
        target = target[..., 1:]

    axes = tuple(range(1, pred.ndim - 1))
    intersection = jnp.sum(target * pred, axis=axes)
    target_o = jnp.sum(target, axis=axes)
    pred_o = jnp.sum(pred, axis=axes)
    denominator = target_o + pred_o

    valid = target_o > 0
    dice = jnp.where(valid, (2.0 * intersection) / jnp.maximum(denominator, 1.0), 0.0)
    return dice, valid


def masked_mean_batch(
    values: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class mean over the batch, counting only valid entries.

    Equivalent to the reference's `do_metric_reduction(..., "mean_batch")`
    (capstone/models/temp.py:271-273): classes with zero valid samples get 0.
    Returns (per_class_mean (C,), not_nans (C,)).
    """
    not_nans = jnp.sum(valid.astype(values.dtype), axis=0)
    total = jnp.sum(jnp.where(valid, values, 0.0), axis=0)
    mean = jnp.where(not_nans > 0, total / jnp.maximum(not_nans, 1.0), 0.0)
    return mean, not_nans


class DiceMetric:
    """Mean + per-structure Dice over a batch of label maps.

    Matches reference DiceMetricWrapper (capstone/models/metrics.py:8-31):
    per-class batch mean ignores empty-GT samples; the final mean over
    classes includes zeros for classes absent from the entire batch.
    """

    def __init__(self, n_classes: int = NUM_CLASSES, include_background: bool = False):
        self.n_classes = n_classes
        self.include_background = include_background

    def __call__(
        self, pred_labels: jnp.ndarray, target_labels: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dice, valid = dice_per_sample_class(
            pred_labels,
            target_labels,
            n_classes=self.n_classes,
            include_background=self.include_background,
        )
        per_class, _ = masked_mean_batch(dice, valid)
        return jnp.mean(per_class), per_class
