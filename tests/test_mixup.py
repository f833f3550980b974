"""Weighted mixup distributional contract
(reference capstone/training/utils.py:23-56)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.training.mixup import (
    mixup_tensors,
    plain_mixup,
    structure_presence,
    weighted_mixup,
)


def test_structure_presence(rng):
    labels = np.zeros((2, 8, 8), np.int32)
    labels[0, 0, 0] = 3
    labels[0, 1, 1] = 7
    labels[1, 2, 2] = 1
    pres = np.asarray(structure_presence(jnp.asarray(labels)))
    expected = np.zeros((2, 9), np.float32)
    expected[0, 2] = 1  # class 3 -> structure index 2
    expected[0, 6] = 1
    expected[1, 0] = 1
    np.testing.assert_array_equal(pres, expected)


def test_mixup_tensors_convex_combination(rng):
    a = jnp.asarray(rng.random((4, 8)))
    b = jnp.asarray(rng.random((4, 8)))
    out = np.asarray(mixup_tensors(a, b, 0.3))
    np.testing.assert_allclose(out, 0.3 * np.asarray(a) + 0.7 * np.asarray(b))


def test_weighted_mixup_shapes_and_mixture(rng):
    images = jnp.asarray(rng.random((6, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=(6, 16, 16)))
    mixed, index, lam = weighted_mixup(jax.random.key(0), images, labels)
    assert mixed.shape == images.shape
    assert index.shape == (6,)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    ref = lam * np.asarray(images) + (1 - lam) * np.asarray(images)[np.asarray(index)]
    np.testing.assert_allclose(np.asarray(mixed), ref, rtol=1e-6)


def test_weighted_mixup_prefers_rare_structures():
    """Samples containing only the rarest structure (Chiasm, count 44) must be
    picked far more often than ones with only the most common (count 601)."""
    n = 8
    labels = np.zeros((n, 8, 8), np.int32)
    labels[0, 0, 0] = 2  # Chiasm (count 44)
    for i in range(1, n):
        labels[i, 0, 0] = 1  # BrainStem (count 601)
    images = jnp.zeros((n, 8, 8, 1))
    counts = np.zeros(n)
    for s in range(200):
        _, index, _ = weighted_mixup(
            jax.random.key(s), images, jnp.asarray(labels)
        )
        idx, cnt = np.unique(np.asarray(index), return_counts=True)
        counts[idx] += cnt
    # expected ratio ~ (1/44) / (1/601) ~ 13.7; allow slack
    assert counts[0] > 4 * counts[1:].mean()


def test_weighted_mixup_empty_sample_no_nan(rng):
    """A sample with no structures must not produce NaN probabilities."""
    labels = np.zeros((4, 8, 8), np.int32)
    labels[1:, 0, 0] = 5
    images = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    mixed, index, lam = weighted_mixup(
        jax.random.key(0), images, jnp.asarray(labels)
    )
    assert np.isfinite(np.asarray(mixed)).all()


def test_plain_mixup_permutation(rng):
    images = jnp.asarray(rng.random((8, 4, 4, 1)).astype(np.float32))
    mixed, index, lam = plain_mixup(jax.random.key(1), images)
    assert sorted(np.asarray(index).tolist()) == list(range(8))


def test_lambda_beta_distribution():
    """lambda ~ Beta(0.2, 0.2) is strongly bimodal: most mass near 0/1."""
    lams = []
    images = jnp.zeros((2, 4, 4, 1))
    labels = jnp.zeros((2, 4, 4), jnp.int32)
    for s in range(300):
        _, _, lam = weighted_mixup(jax.random.key(s), images, labels)
        lams.append(float(lam))
    lams = np.array(lams)
    extreme = ((lams < 0.1) | (lams > 0.9)).mean()
    assert extreme > 0.6, f"Beta(0.2,0.2) should be bimodal, extreme={extreme}"
