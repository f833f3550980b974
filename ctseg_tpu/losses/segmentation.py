"""Segmentation losses as pure jnp functions (channel-last layout).

Numerical contracts (cited into /root/reference/):
  - Dice: MONAI v0.3 DiceLoss(include_background=False, to_onehot_y=True,
    softmax=True) as configured at capstone/models/losses.py:71-85 —
    per-(sample,class) 1 - (2*I + s)/(U + s) with s = 1e-5, spatial reduce.
  - GeneralizedDice: vendored MONAI master (capstone/models/temp.py:17-170) —
    square weighting w = 1/ground_o^2 with per-sample inf -> max(w) fixup,
    smooth_nr = smooth_dr = 1e-5.
  - Focal: MONAI FocalLoss(gamma=2) with a one-hot target
    (capstone/models/losses.py:105-124) — per-(sample,class) mean over voxels
    of -(1-p)^gamma * t * log p.
  - Boundary: LIVIAETS boundary loss over precomputed distance maps
    (capstone/models/losses.py:127-157) — softmax probs (background dropped)
    x dist maps, spatial mean.
  - CrossEntropy / WeightedCrossEntropy: torch F.cross_entropy semantics
    (weighted mean divides by the summed weight of the targets)
    (capstone/models/losses.py:45-68).
  - Missing-annotation masking (AnatomyNet): capstone/models/losses.py:206-221.

All spatial dims are handled generically, so every loss works for both 2D
(N, H, W, C) and 3D (N, D, H, W, C) inputs — the reference needed a separate
volumetric twin (capstone/volumetric/losses.py) for this.

Unlike the reference we avoid NaN-based bookkeeping entirely: every reduction
is an explicit masked sum, which XLA fuses cleanly and which is safe under
`jax.debug_nans`.
"""

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import CLASS_WEIGHT, NUM_CLASSES


def _spatial_axes(x: jnp.ndarray):
    """All axes except batch (0) and channel (-1)."""
    return tuple(range(1, x.ndim - 1))


def _reduce_matrix(
    f: jnp.ndarray, reduction: str, sample_mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Reduce a per-(sample, class) matrix; every reduction honors
    sample_mask (padded eval rows — data/pipeline.py padded_epoch —
    contribute nothing, like the Dice metric's valid mask; the masked mean
    equals `f[sample_mask].mean()` with static shapes,
    differential-tested against slicing in tests/test_losses.py). "sum"
    sums the entries "mean" averages — for losses whose "none" output is a
    matrix of per-class voxel MEANS (Focal), that is NOT MONAI's
    voxel-level sum; no reference code path uses "sum" (the wrappers only
    use mean/none, capstone/models/losses.py:182-203)."""
    if reduction == "none":
        return f
    if sample_mask is not None:
        m = sample_mask.astype(f.dtype)[:, None]
        s = jnp.sum(f * m)
        if reduction == "sum":
            return s
        if reduction == "mean":
            return s / jnp.maximum(jnp.sum(m) * f.shape[-1], 1.0)
    elif reduction == "mean":
        return jnp.mean(f)
    elif reduction == "sum":
        return jnp.sum(f)
    raise ValueError(f"unknown reduction {reduction!r}")


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax cross entropy over the trailing class axis.

    logits: (N, *spatial, C); labels: (N, *spatial) int.
    With `weight` (C,), matches torch's weighted mean: sum(w_y * ce) / sum(w_y).
    `sample_mask` (N,) restricts EVERY reduction to valid rows (padded eval
    batches contribute nothing to mean or sum).
    """
    # One-hot contraction, not take_along_axis: a voxel gather differentiates
    # to a scatter-add over every voxel, which measured ~14x slower than the
    # dense select on TPU (perf/probe_loss_grad.py).
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    ce = -jnp.sum(onehot * logp, axis=-1)  # (N, *spatial)
    w = None
    if weight is not None:
        w = jnp.asarray(weight, dtype=ce.dtype)[labels]
    if reduction == "none":
        return ce * w if w is not None else ce
    if reduction not in ("mean", "sum"):
        raise ValueError(f"unknown reduction {reduction!r}")
    m = None
    if sample_mask is not None:
        m = jnp.broadcast_to(
            sample_mask.astype(ce.dtype).reshape((-1,) + (1,) * (ce.ndim - 1)),
            ce.shape,
        )
    wm = w if m is None else (w * m if w is not None else m)
    num = jnp.sum(ce * wm) if wm is not None else jnp.sum(ce)
    if reduction == "sum":
        return num
    # torch weighted mean: / sum(w_y) (over valid rows); unweighted: / count
    if wm is not None and w is not None:
        denom = jnp.sum(wm)
    elif m is not None:
        denom = jnp.sum(m)
    else:
        denom = jnp.asarray(ce.size, ce.dtype)
    return num / jnp.maximum(denom, 1e-30)


def weighted_cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross entropy with the reference's inverse-pixel-frequency weights."""
    weight = jnp.asarray(list(CLASS_WEIGHT.values()))
    return cross_entropy_loss(
        logits, labels, weight=weight, reduction=reduction, sample_mask=sample_mask
    )


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    include_background: bool = False,
    smooth: float = 1e-5,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Soft Dice loss on softmax probabilities vs one-hot targets.

    reduction "none" returns the per-(sample, class) matrix (N, C') where C'
    excludes background when include_background=False.

    Implementation note (TPU): everything stays a dense one-hot contraction.
    A take_along_axis gather of the target-class probability reads nicer but
    differentiates to a scatter-add over every voxel — measured ~10x slower
    in fwd+bwd at the training shape (perf/probe_loss_grad.py).
    """
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    target = jax.nn.one_hot(labels, n_classes, dtype=probs.dtype)

    axes = _spatial_axes(target)
    intersection = jnp.sum(target * probs, axis=axes)  # (N, C)
    target_o = jnp.sum(target, axis=axes)
    pred_o = jnp.sum(probs, axis=axes)
    if not include_background:
        intersection = intersection[..., 1:]
        target_o = target_o[..., 1:]
        pred_o = pred_o[..., 1:]
    f = 1.0 - (2.0 * intersection + smooth) / (target_o + pred_o + smooth)
    return _reduce_matrix(f, reduction, sample_mask)


def generalized_dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    include_background: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Generalized Dice (Sudre 2017) with square class weighting.

    Per-sample classes whose ground-truth volume is zero get weight
    max(finite weights of that sample) — the inf fixup of the vendored MONAI
    code (reference capstone/models/temp.py:149-153).
    """
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    target = jax.nn.one_hot(labels, n_classes, dtype=probs.dtype)

    axes = _spatial_axes(target)
    intersection = jnp.sum(target * probs, axis=axes)  # (N, C)
    ground_o = jnp.sum(target, axis=axes)
    pred_o = jnp.sum(probs, axis=axes)
    if not include_background:
        intersection = intersection[..., 1:]
        ground_o = ground_o[..., 1:]
        pred_o = pred_o[..., 1:]
    denominator = ground_o + pred_o

    w = 1.0 / (ground_o * ground_o)  # inf where the class is absent
    finite = jnp.isfinite(w)
    w_max = jnp.max(jnp.where(finite, w, 0.0), axis=1, keepdims=True)
    w = jnp.where(finite, w, w_max)

    f = 1.0 - (2.0 * (intersection * w) + smooth_nr) / ((denominator * w) + smooth_dr)
    return _reduce_matrix(f, reduction, sample_mask)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss against a one-hot target (background included).

    reduction "none" returns (N, C) — the per-class voxel mean of
    -(1 - p)^gamma * t * log p.

    Implementation note (TPU): the one-hot target zeroes every class but the
    voxel's own, so -(1-p)^g * t * log p summed over classes equals the same
    expression evaluated at the TARGET class only — computed here as a dense
    one-hot contraction (select + reduce). A take_along_axis gather of
    log p_y differentiates to a scatter-add over every voxel and measured
    ~14x slower in fwd+bwd (perf/probe_loss_grad.py).
    """
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    target = jax.nn.one_hot(labels, n_classes, dtype=logp.dtype)
    logp_y = jnp.sum(target * logp, axis=-1)  # (N, *spatial)
    per_voxel = -jnp.power(1.0 - jnp.exp(logp_y), gamma) * logp_y

    if reduction == "mean" and sample_mask is None:
        # mean over (N, C) of the per-class voxel means == sum of per-voxel
        # terms / (N * V * C): each voxel contributes to exactly one class.
        return jnp.sum(per_voxel) / (per_voxel.size * n_classes)

    # Per-class voxel means of the scalar field (the one-hot select fuses
    # into the reduction — no standalone (N, V, C) tensor survives fusion).
    f = jnp.mean(
        target * per_voxel[..., None], axis=_spatial_axes(target)
    )  # (N, C)
    return _reduce_matrix(f, reduction, sample_mask)


def boundary_loss(
    logits: jnp.ndarray,
    dist_maps: jnp.ndarray,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boundary loss: softmax probs (background dropped) x distance maps.

    dist_maps: (N, *spatial, C-1) precomputed signed EDT maps.
    reduction "none" returns the spatial mean per (sample, class): (N, C-1).
    """
    probs = jax.nn.softmax(logits, axis=-1)[..., 1:]
    prod = probs * dist_maps.astype(probs.dtype)
    f = jnp.mean(prod, axis=_spatial_axes(prod))  # (N, C-1)
    return _reduce_matrix(f, reduction, sample_mask)


def apply_missing_mask(
    name: str,
    loss: jnp.ndarray,
    mask_indicator: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """AnatomyNet-style missing-annotation masking of a (N, C) loss matrix.

    mask_indicator: (N, S) 1/0 per structure. For Focal a synthesized
    background column is prepended (present iff all structures are present).
    Classes are weighted by 1/annotation-count-in-batch (all-ones when any
    class is absent from the whole batch), normalized to sum to 1; the masked
    weighted loss is summed over classes and averaged over the batch.
    (reference capstone/models/losses.py:206-221)
    """
    mask_indicator = mask_indicator.astype(loss.dtype)
    if sample_mask is not None:
        # Padded eval rows: drop them from the annotation counts and the
        # batch mean. Equivalent to slicing the valid rows first.
        mask_indicator = mask_indicator * sample_mask.astype(loss.dtype)[:, None]
    if name == "Focal":
        background = (
            jnp.sum(mask_indicator, axis=1, keepdims=True) == (NUM_CLASSES - 1)
        ).astype(loss.dtype)
        mask_indicator = jnp.concatenate([background, mask_indicator], axis=1)

    counts = jnp.sum(mask_indicator, axis=0)  # (C,)
    weights = 1.0 / counts  # inf where a class is absent from the batch
    any_inf = jnp.any(jnp.isinf(weights))
    weights = jnp.where(any_inf, jnp.ones_like(weights), weights)
    weights = weights / jnp.sum(weights)

    masked = loss * weights[None, :] * mask_indicator
    if sample_mask is not None:
        n_valid = jnp.maximum(jnp.sum(sample_mask.astype(loss.dtype)), 1.0)
        return jnp.sum(masked) / n_valid
    return jnp.mean(jnp.sum(masked, axis=1))


# Registry: name -> callable(logits, labels_or_distmaps, reduction=...).
LOSSES = {
    "CrossEntropy": cross_entropy_loss,
    "WeightedCrossEntropy": weighted_cross_entropy_loss,
    "Focal": focal_loss,
    "Dice": dice_loss,
    "GeneralizedDice": generalized_dice_loss,
    "Boundary": boundary_loss,
}

# Losses that never get the missing-annotation mask (they operate on the
# label map directly and already see only present classes).
_CE_LOSSES = frozenset({"CrossEntropy", "WeightedCrossEntropy"})


class MultiLoss:
    """Composable multi-loss with optional missing-annotation masking.

    TPU-native equivalent of the reference MultipleLossWrapper
    (capstone/models/losses.py:170-203): a stateless callable returning a
    dict of named scalar losses; the total training loss is their sum.
    """

    def __init__(self, losses: Sequence[str], exclude_missing: bool = False):
        for name in losses:
            assert name in LOSSES, f"unknown loss: {name}"
        # Sorted for a consistent ordering, like the reference
        # (capstone/training/base_trainer.py:41).
        self.names = sorted(losses)
        self.exclude_missing = exclude_missing

    def __call__(
        self,
        logits: jnp.ndarray,
        labels: jnp.ndarray,
        mask_indicator: Optional[jnp.ndarray] = None,
        dist_maps: Optional[jnp.ndarray] = None,
        sample_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """`sample_mask` (N,) bool excludes padded evaluation rows from every
        reduction — exactly equivalent to slicing the valid rows out first
        (differential-tested), but with jit-stable shapes."""
        values: Dict[str, jnp.ndarray] = {}
        for name in self.names:
            fx = LOSSES[name]
            # CE losses always reduce to their (weighted) mean, even under
            # exclude_missing (reference capstone/models/losses.py:196-199).
            masked = self.exclude_missing and name not in _CE_LOSSES
            reduction = "none" if masked else "mean"
            kw = {} if masked else {"sample_mask": sample_mask}
            if name == "Boundary":
                assert dist_maps is not None, (
                    "Distance maps are required for using boundary loss"
                )
                loss = fx(logits, dist_maps, reduction=reduction, **kw)
            else:
                loss = fx(logits, labels, reduction=reduction, **kw)

            if masked:
                assert mask_indicator is not None
                loss = apply_missing_mask(
                    name, loss, mask_indicator, sample_mask=sample_mask
                )
            values[name] = loss
        return values

    def total(self, values: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return functools.reduce(jnp.add, values.values())
