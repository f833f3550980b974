"""CT Hounsfield-unit windowing as pure jnp functions.

Numerical contract matches reference capstone/transforms/transforms_2d.py:
  apply_window clips to [level - width//2, level + width//2] and (optionally)
  shifts to [0, 1] dividing by (max - min + 1e-8)  (transforms_2d.py:97-107);
  WindowedChannels stacks the brain/soft-tissue/bone windows as 3 channels
  (transforms_2d.py:9-39).

All functions are shape-polymorphic over leading dims and jit/vmap-safe; the
channel axis is last (TPU-friendly NHWC layout). The fused Pallas version
lives in ctseg_tpu/ops/pallas/preprocess.py.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp

from ctseg_tpu.constants import (
    STACKED_WINDOW_MEAN,
    STACKED_WINDOW_STD,
    WINDOW_ORDER,
    WINDOWING_CONFIG,
)


def apply_window(
    image: jnp.ndarray, window_width: int, window_level: int, shift: bool = True
) -> jnp.ndarray:
    """Clip to a HU window; optionally rescale to [0, 1]."""
    min_ = window_level - (window_width // 2)
    max_ = window_level + (window_width // 2)
    clipped = jnp.clip(image, min_, max_)
    if shift:
        clipped = (clipped - min_) / (max_ - min_ + 1e-8)
    return clipped


def windowed_channels(
    image: jnp.ndarray,
    windows: Sequence[str] = WINDOW_ORDER,
    shift: bool = True,
) -> jnp.ndarray:
    """Stack several HU windows as a trailing channel axis.

    image: (..., H, W) raw HU values -> (..., H, W, len(windows))
    """
    chans = [
        apply_window(image, *WINDOWING_CONFIG[w], shift=shift) for w in windows
    ]
    return jnp.stack(chans, axis=-1)


def soft_tissue_window(image: jnp.ndarray, shift: bool = True) -> jnp.ndarray:
    """Single soft-tissue window with a trailing channel axis of 1."""
    out = apply_window(image, *WINDOWING_CONFIG["soft_tissue"], shift=shift)
    return out[..., None]


def normalize(
    image: jnp.ndarray,
    mean: Tuple[float, ...] = STACKED_WINDOW_MEAN,
    std: Tuple[float, ...] = STACKED_WINDOW_STD,
) -> jnp.ndarray:
    """Per-channel standardization over the trailing channel axis.

    Equivalent to Albumentations Normalize(max_pixel_value=1.0) as configured
    in reference capstone/transforms/predefined.py:6-17.
    """
    mean = jnp.asarray(mean, dtype=image.dtype)
    std = jnp.asarray(std, dtype=image.dtype)
    if mean.ndim == 0:
        mean = mean[None]
    if std.ndim == 0:
        std = std[None]
    assert mean.shape[0] == image.shape[-1], "mean/std must match channel count"
    return (image - mean) / std
