"""Differential tests of every loss against independent numpy/torch oracles.

Oracles are written here from the published formulas the reference relies on
(MONAI DiceLoss/GeneralizedDiceLoss/FocalLoss docs + Sudre 2017 + LIVIAETS
boundary loss + torch F.cross_entropy semantics); torch is only used where it
provides the ground-truth semantics directly (cross entropy).

Covers the edge cases SURVEY.md §7 calls out: empty classes, all-missing
batches, the GeneralizedDice inf->max weight fixup, and the AnatomyNet
missing-annotation masking.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ctseg_tpu.constants import CLASS_WEIGHT, NUM_CLASSES
from ctseg_tpu.losses import (
    MultiLoss,
    apply_missing_mask,
    boundary_loss,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
    weighted_cross_entropy_loss,
)

C = NUM_CLASSES


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _one_hot_np(labels, n):
    return np.eye(n, dtype=np.float64)[labels]


def _rand_case(rng, n=4, h=16, w=16, empty_classes=()):
    logits = rng.normal(size=(n, h, w, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(n, h, w))
    for c in empty_classes:
        labels[labels == c] = 0
    return logits, labels


# ---------------------------------------------------------------- cross entropy
def test_cross_entropy_matches_torch(rng):
    logits, labels = _rand_case(rng)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.from_numpy(np.moveaxis(logits, -1, 1)).double(),
        torch.from_numpy(labels).long(),
    ).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_weighted_cross_entropy_matches_torch(rng):
    logits, labels = _rand_case(rng)
    ours = float(
        weighted_cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    )
    weight = torch.tensor(list(CLASS_WEIGHT.values()), dtype=torch.double)
    ref = F.cross_entropy(
        torch.from_numpy(np.moveaxis(logits, -1, 1)).double(),
        torch.from_numpy(labels).long(),
        weight=weight,
    ).item()
    assert ours == pytest.approx(ref, rel=1e-4)


# ------------------------------------------------------------------------ dice
def np_dice_loss(logits, labels, include_background=False, smooth=1e-5):
    probs = _softmax(logits.astype(np.float64), -1)
    target = _one_hot_np(labels, C)
    if not include_background:
        probs, target = probs[..., 1:], target[..., 1:]
    axes = (1, 2)
    inter = (probs * target).sum(axes)
    denom = probs.sum(axes) + target.sum(axes)
    return 1.0 - (2.0 * inter + smooth) / (denom + smooth)  # (N, C')


@pytest.mark.parametrize("empty", [(), (3, 7)])
def test_dice_loss(rng, empty):
    logits, labels = _rand_case(rng, empty_classes=empty)
    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = np_dice_loss(logits, labels).mean()
    assert ours == pytest.approx(ref, rel=1e-4)

    ours_none = np.asarray(
        dice_loss(jnp.asarray(logits), jnp.asarray(labels), reduction="none")
    )
    np.testing.assert_allclose(ours_none, np_dice_loss(logits, labels), rtol=1e-4)


# ------------------------------------------------------------- generalized dice
def np_generalized_dice_loss(logits, labels, smooth=1e-5):
    probs = _softmax(logits.astype(np.float64), -1)[..., 1:]
    target = _one_hot_np(labels, C)[..., 1:]
    axes = (1, 2)
    inter = (probs * target).sum(axes)
    ground_o = target.sum(axes)
    denom = ground_o + probs.sum(axes)
    with np.errstate(divide="ignore"):
        w = 1.0 / (ground_o * ground_o)
    for b in w:  # inf -> per-sample max of the finite weights
        infs = np.isinf(b)
        b[infs] = 0.0
        b[infs] = b.max()
    return 1.0 - (2.0 * (inter * w) + smooth) / ((denom * w) + smooth)


@pytest.mark.parametrize("empty", [(), (1, 2, 5)])
def test_generalized_dice_loss(rng, empty):
    logits, labels = _rand_case(rng, empty_classes=empty)
    ours = float(generalized_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = np_generalized_dice_loss(logits, labels).mean()
    assert ours == pytest.approx(ref, rel=1e-4)


# ----------------------------------------------------------------------- focal
def np_focal_loss(logits, labels, gamma=2.0):
    logits = logits.astype(np.float64)
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    p = np.exp(logp)
    t = _one_hot_np(labels, C)
    per_voxel = -((1.0 - p) ** gamma) * t * logp
    return per_voxel.mean(axis=(1, 2))  # (N, C): mean over voxels per class


def test_focal_loss(rng):
    logits, labels = _rand_case(rng)
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = np_focal_loss(logits, labels).mean()
    assert ours == pytest.approx(ref, rel=1e-4)

    ours_none = np.asarray(
        focal_loss(jnp.asarray(logits), jnp.asarray(labels), reduction="none")
    )
    np.testing.assert_allclose(ours_none, np_focal_loss(logits, labels), rtol=1e-4)


# -------------------------------------------------------------------- boundary
def test_boundary_loss(rng):
    logits, _ = _rand_case(rng)
    dist = rng.normal(size=(4, 16, 16, C - 1)).astype(np.float32)
    ours = float(boundary_loss(jnp.asarray(logits), jnp.asarray(dist)))
    probs = _softmax(logits.astype(np.float64), -1)[..., 1:]
    ref = (probs * dist).mean()
    assert ours == pytest.approx(ref, rel=1e-4)

    ours_none = np.asarray(
        boundary_loss(jnp.asarray(logits), jnp.asarray(dist), reduction="none")
    )
    np.testing.assert_allclose(
        ours_none, (probs * dist).mean(axis=(1, 2)), rtol=1e-4, atol=1e-7
    )


# -------------------------------------------------- missing-annotation masking
def np_apply_missing_mask(name, loss, indicator):
    indicator = indicator.astype(np.float64)
    if name == "Focal":
        background = (indicator.sum(1, keepdims=True) == C - 1).astype(np.float64)
        indicator = np.concatenate([background, indicator], axis=1)
    with np.errstate(divide="ignore"):
        weights = 1.0 / indicator.sum(axis=0)
    if np.any(np.isinf(weights)):
        weights = np.ones_like(weights)
    weights = weights / weights.sum()
    masked = loss * weights[None, :] * indicator
    return masked.sum(axis=1).mean()


@pytest.mark.parametrize("name", ["Dice", "Focal"])
def test_apply_missing_mask(rng, name):
    n = 6
    cols = C if name == "Focal" else C - 1
    loss = rng.random((n, cols)).astype(np.float32)
    indicator = rng.integers(0, 2, size=(n, C - 1)).astype(np.float32)
    ours = float(
        apply_missing_mask(name, jnp.asarray(loss), jnp.asarray(indicator))
    )
    ref = np_apply_missing_mask(name, loss.astype(np.float64), indicator)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_apply_missing_mask_all_missing_class(rng):
    """A class absent from the whole batch trips the inf->ones fixup."""
    loss = rng.random((4, C - 1)).astype(np.float32)
    indicator = np.ones((4, C - 1), dtype=np.float32)
    indicator[:, 2] = 0.0
    ours = float(
        apply_missing_mask("Dice", jnp.asarray(loss), jnp.asarray(indicator))
    )
    ref = np_apply_missing_mask("Dice", loss.astype(np.float64), indicator)
    assert ours == pytest.approx(ref, rel=1e-4)


# ------------------------------------------------------------------- MultiLoss
def test_multi_loss_total_is_sum(rng):
    logits, labels = _rand_case(rng)
    ml = MultiLoss(["Focal", "Dice"])
    values = ml(jnp.asarray(logits), jnp.asarray(labels))
    assert set(values) == {"Dice", "Focal"}
    assert float(ml.total(values)) == pytest.approx(
        float(values["Dice"]) + float(values["Focal"]), rel=1e-6
    )


def test_multi_loss_exclude_missing(rng):
    logits, labels = _rand_case(rng)
    indicator = rng.integers(0, 2, size=(4, C - 1)).astype(np.float32)
    ml = MultiLoss(["Focal", "Dice", "CrossEntropy"], exclude_missing=True)
    values = ml(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(indicator))
    # CE is exempt from masking: equals the plain mean CE.
    plain_ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert float(values["CrossEntropy"]) == pytest.approx(plain_ce, rel=1e-5)
    # Masked Dice equals oracle composition.
    ref = np_apply_missing_mask(
        "Dice", np_dice_loss(logits, labels), indicator.astype(np.float64)
    )
    assert float(values["Dice"]) == pytest.approx(ref, rel=1e-4)


def test_multi_loss_boundary_requires_dist_maps(rng):
    logits, labels = _rand_case(rng)
    ml = MultiLoss(["Boundary"])
    with pytest.raises(AssertionError):
        ml(jnp.asarray(logits), jnp.asarray(labels))


def test_losses_work_in_3d(rng):
    """The same loss code must serve the volumetric path (N, D, H, W, C)."""
    logits = rng.normal(size=(2, 4, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(2, 4, 8, 8))
    for fx in (dice_loss, generalized_dice_loss, focal_loss, cross_entropy_loss):
        val = float(fx(jnp.asarray(logits), jnp.asarray(labels)))
        assert np.isfinite(val)


# ------------------------------------------------------- sample_mask (padding)
def test_sample_mask_equals_slicing(rng):
    """Masked full-batch reductions == unmasked reductions on the valid rows.

    This is the contract the padded evaluation batches rely on
    (data/pipeline.py padded_epoch -> trainer eval step)."""
    n, n_valid = 6, 4
    logits = rng.normal(size=(n, 16, 16, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(n, 16, 16))
    dist = rng.normal(size=(n, 16, 16, C - 1)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:n_valid] = True

    jl, jt, jm = jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
    cases = [
        (cross_entropy_loss, (jl, jt)),
        (weighted_cross_entropy_loss, (jl, jt)),
        (dice_loss, (jl, jt)),
        (generalized_dice_loss, (jl, jt)),
        (focal_loss, (jl, jt)),
        (boundary_loss, (jl, jnp.asarray(dist))),
    ]
    for fx, args in cases:
        masked = float(fx(*args, sample_mask=jm))
        sliced = float(fx(*(a[:n_valid] for a in args)))
        assert masked == pytest.approx(sliced, rel=1e-5), fx.__name__
        # every reduction honors the mask, not just "mean" (padded rows
        # must not leak into sums either)
        masked_sum = float(fx(*args, reduction="sum", sample_mask=jm))
        sliced_sum = float(fx(*(a[:n_valid] for a in args), reduction="sum"))
        assert masked_sum == pytest.approx(sliced_sum, rel=1e-5), fx.__name__


def test_unknown_reduction_raises(rng):
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, size=(2, 8, 8)))
    for fx in (cross_entropy_loss, dice_loss, focal_loss):
        with pytest.raises(ValueError, match="reduction"):
            fx(logits, labels, reduction="batchmean")


def test_multi_loss_sample_mask_exclude_missing(rng):
    """Masked MultiLoss (incl. AnatomyNet masking) == slicing the valid rows."""
    n, n_valid = 6, 4
    logits = rng.normal(size=(n, 16, 16, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(n, 16, 16))
    indicator = rng.integers(0, 2, size=(n, C - 1)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:n_valid] = True

    ml = MultiLoss(["Focal", "Dice", "CrossEntropy"], exclude_missing=True)
    masked = ml(
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(indicator),
        sample_mask=jnp.asarray(mask),
    )
    sliced = ml(
        jnp.asarray(logits[:n_valid]),
        jnp.asarray(labels[:n_valid]),
        jnp.asarray(indicator[:n_valid]),
    )
    for name in masked:
        assert float(masked[name]) == pytest.approx(
            float(sliced[name]), rel=1e-5
        ), name
