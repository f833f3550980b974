"""95th-percentile Hausdorff distance (host-side, numpy/scipy).

New capability relative to the reference (which publishes Dice only); part
of the benchmark north star's metric set (BASELINE.json: "Dice/HD95").
HD95 = max over directions of the 95th percentile of surface-to-surface
distances, computed from EDT of each mask's boundary. Supports anisotropic
voxel spacing (z-first, matching the Volume layout).
"""

from typing import Optional, Sequence

import numpy as np
from scipy.ndimage import binary_erosion, distance_transform_edt


def _surface(mask: np.ndarray) -> np.ndarray:
    """Boundary voxels: mask minus its erosion."""
    if not mask.any():
        return mask
    eroded = binary_erosion(mask, border_value=0)
    return mask & ~eroded


def hd95(
    pred: np.ndarray,
    target: np.ndarray,
    spacing: Optional[Sequence[float]] = None,
    percentile: float = 95.0,
) -> float:
    """HD95 between two binary masks. Returns nan if either mask is empty."""
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    if not pred.any() or not target.any():
        return float("nan")

    pred_surface = _surface(pred)
    target_surface = _surface(target)

    # Distance from every voxel to the nearest surface voxel of the other set.
    dist_to_target = distance_transform_edt(~target_surface, sampling=spacing)
    dist_to_pred = distance_transform_edt(~pred_surface, sampling=spacing)

    d_pred_to_target = dist_to_target[pred_surface]
    d_target_to_pred = dist_to_pred[target_surface]
    return float(
        max(
            np.percentile(d_pred_to_target, percentile),
            np.percentile(d_target_to_pred, percentile),
        )
    )


def hd95_per_structure(
    pred_labels: np.ndarray,
    target_labels: np.ndarray,
    n_classes: int = 10,
    spacing: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Per-class HD95 of integer label maps (background class 0 excluded).

    Returns (n_classes - 1,) with nan where either mask is empty — callers
    aggregate with nan-aware reductions like the Dice metric does.
    """
    out = np.full(n_classes - 1, np.nan)
    for c in range(1, n_classes):
        out[c - 1] = hd95(pred_labels == c, target_labels == c, spacing=spacing)
    return out
