"""Dice metric vs a NaN-based numpy oracle of the reference semantics
(capstone/models/temp.py:173-214 compute_meandice + :271-273 mean_batch,
composed as in capstone/models/metrics.py:8-31)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.constants import NUM_CLASSES
from ctseg_tpu.metrics import DiceMetric, masked_mean_batch

C = NUM_CLASSES


def np_reference_dice(pred_labels, target_labels):
    """NaN-semantics oracle: per-(sample,class) dice, NaN if GT empty;
    mean_batch ignoring NaNs (0 if all NaN); plain mean over classes."""
    n = pred_labels.shape[0]
    eye = np.eye(C)
    pred = eye[pred_labels][..., 1:]
    target = eye[target_labels][..., 1:]
    axes = tuple(range(1, pred.ndim - 1))
    inter = (pred * target).sum(axes)
    y_o = target.sum(axes)
    y_pred_o = pred.sum(axes)
    with np.errstate(invalid="ignore", divide="ignore"):
        f = np.where(y_o > 0, 2.0 * inter / (y_o + y_pred_o), np.nan)
    per_class = np.zeros(C - 1)
    for c in range(C - 1):
        col = f[:, c]
        valid = ~np.isnan(col)
        per_class[c] = col[valid].mean() if valid.any() else 0.0
    return per_class.mean(), per_class


def test_dice_metric_matches_nan_oracle(rng):
    pred = rng.integers(0, C, size=(6, 16, 16))
    target = rng.integers(0, C, size=(6, 16, 16))
    mean, per_class = DiceMetric()(jnp.asarray(pred), jnp.asarray(target))
    ref_mean, ref_per_class = np_reference_dice(pred, target)
    np.testing.assert_allclose(np.asarray(per_class), ref_per_class, rtol=1e-5)
    assert float(mean) == pytest.approx(ref_mean, rel=1e-5)


def test_dice_metric_empty_gt_class(rng):
    """A class absent from the whole batch contributes 0 to the class mean."""
    pred = rng.integers(0, C, size=(4, 8, 8))
    target = rng.integers(0, C, size=(4, 8, 8))
    target[target == 5] = 0  # class 5 never in GT
    mean, per_class = DiceMetric()(jnp.asarray(pred), jnp.asarray(target))
    assert float(per_class[4]) == 0.0  # class id 5 -> index 4
    ref_mean, ref_per_class = np_reference_dice(pred, target)
    np.testing.assert_allclose(np.asarray(per_class), ref_per_class, rtol=1e-5)


def test_perfect_prediction_gives_dice_one(rng):
    target = rng.integers(0, C, size=(2, 8, 16))
    # ensure every class present somewhere
    target[0, 0, :C] = np.arange(C)
    mean, per_class = DiceMetric()(jnp.asarray(target), jnp.asarray(target))
    assert float(mean) == pytest.approx(1.0)


def test_masked_mean_batch_counts(rng):
    values = rng.random((5, 3)).astype(np.float32)
    valid = np.array(
        [[1, 0, 0], [1, 0, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0]], dtype=bool
    )
    mean, not_nans = masked_mean_batch(jnp.asarray(values), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(not_nans), np.array([4.0, 0.0, 0.0]), rtol=1e-6
    )
    expected0 = values[valid[:, 0], 0].mean()
    assert float(mean[0]) == pytest.approx(expected0, rel=1e-5)
    assert float(mean[1]) == 0.0


def test_dice_metric_3d(rng):
    pred = rng.integers(0, C, size=(2, 4, 8, 8))
    target = rng.integers(0, C, size=(2, 4, 8, 8))
    mean, per_class = DiceMetric()(jnp.asarray(pred), jnp.asarray(target))
    ref_mean, ref_per_class = np_reference_dice(pred, target)
    np.testing.assert_allclose(np.asarray(per_class), ref_per_class, rtol=1e-5)
