"""Fused CT preprocessing kernel: HU windowing x3 + per-channel normalize.

One pass over HBM replaces the reference's Albumentations chain
(WindowedChannels -> Normalize, capstone/transforms/predefined.py:6-17) that
runs in CPU dataloader workers: each raw-HU slice is read once from HBM into
VMEM, the three window/clip/shift/standardize chains run on the VPU, and the
(H, W, 3) result is written once. Purely memory-bound, so fusing the 7
elementwise stages into one kernel puts it at the HBM-bandwidth roofline.

`fused_window_normalize` is numerically identical to the unfused jnp path
(windowed_channels -> normalize); tests/test_pallas.py proves it in
interpret mode and the jnp fallback covers non-TPU platforms.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ctseg_tpu.constants import (
    STACKED_WINDOW_MEAN,
    STACKED_WINDOW_STD,
    WINDOW_ORDER,
    WINDOWING_CONFIG,
)
from ctseg_tpu.transforms.windowing import normalize, windowed_channels

# Static per-channel constants: (lo, hi, mean, std) per window.
_PARAMS = []
for _i, _name in enumerate(WINDOW_ORDER):
    _w, _l = WINDOWING_CONFIG[_name]
    _lo = _l - _w // 2
    _hi = _l + _w // 2
    _PARAMS.append(
        (
            float(_lo),
            float(_hi),
            float(STACKED_WINDOW_MEAN[_i]),
            float(STACKED_WINDOW_STD[_i]),
        )
    )


def _kernel(x_ref, out_ref):
    x = x_ref[:]  # (H, W)
    for c, (lo, hi, mean, std) in enumerate(_PARAMS):
        clipped = jnp.clip(x, lo, hi)
        shifted = (clipped - lo) / (hi - lo + 1e-8)
        out_ref[:, :, c] = (shifted - mean) / std


def _jnp_reference(images: jnp.ndarray) -> jnp.ndarray:
    return normalize(windowed_channels(images))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_normalize(
    images: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, H, W) raw HU -> (N, H, W, 3) windowed + standardized."""
    n, h, w = images.shape
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((None, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((None, h, w, 3), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32),
        interpret=interpret,
    )(images.astype(jnp.float32))


def window_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, fused-by-XLA jnp elsewhere."""
    if images.devices() and next(iter(images.devices())).platform == "tpu":
        return fused_window_normalize(images)
    return _jnp_reference(images)
