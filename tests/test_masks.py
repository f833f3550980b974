"""squash/one-hot round trips vs numpy oracles
(reference capstone/training/utils.py:13-20)."""

import jax.numpy as jnp
import numpy as np

from ctseg_tpu.constants import NUM_CLASSES
from ctseg_tpu.ops import one_hot, squash_masks, squash_predictions


def test_squash_masks_highest_class_wins(rng):
    masks = rng.integers(0, 2, size=(4, 16, 16, 9)).astype(np.float32)
    labels = np.asarray(squash_masks(jnp.asarray(masks), NUM_CLASSES))
    # Oracle: mask channel s (0-based) carries class id s+1; max wins.
    ref = (masks * np.arange(1, 10)[None, None, None, :]).max(axis=-1)
    np.testing.assert_array_equal(labels, ref.astype(np.int32))
    assert labels.min() >= 0 and labels.max() <= 9


def test_squash_predictions_is_softmax_argmax(rng):
    logits = rng.normal(size=(3, 8, 8, 10)).astype(np.float32)
    pred = np.asarray(squash_predictions(jnp.asarray(logits)))
    # softmax is monotonic: argmax of logits == argmax of softmax.
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_array_equal(pred, probs.argmax(-1))


def test_one_hot_round_trip(rng):
    labels = rng.integers(0, NUM_CLASSES, size=(2, 8, 8))
    oh = np.asarray(one_hot(jnp.asarray(labels), NUM_CLASSES))
    assert oh.shape == (2, 8, 8, NUM_CLASSES)
    np.testing.assert_array_equal(oh.argmax(-1), labels)
    np.testing.assert_array_equal(oh.sum(-1), np.ones_like(labels, dtype=np.float32))
