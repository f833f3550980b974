"""Fused CT preprocessing kernel: HU windowing x3 + per-channel normalize.

One pass over HBM replaces the reference's Albumentations chain
(WindowedChannels -> Normalize, capstone/transforms/predefined.py:6-17) that
runs in CPU dataloader workers: each raw-HU slice is read once from HBM into
VMEM, the window/clip/shift/standardize chain runs on the VPU, and the
result is written once. Purely memory-bound, so fusing the elementwise
stages into one kernel puts it at the HBM-bandwidth roofline.

Layout note: the kernel computes in channel-FIRST blocks (grid over
(sample, window)) because a channel-LAST block with C=3 would pad the lane
dimension 3 -> 128 in VMEM (a 42x memory blowup that OOMs); the final
transpose to the framework's channel-last layout happens outside in XLA.

`fused_window_normalize` is numerically identical to the unfused jnp path
(windowed_channels -> normalize); tests/test_pallas.py proves it in
interpret mode (and round 1 validated it bitwise-exact on real TPU).

Status: TEST-ONLY EXEMPLAR, deliberately not dispatched from production.
The production pipelines apply windowing FIRST and normalization LAST with
crop/resize/warp in between (the reference's op order,
capstone/transforms/predefined.py:31-105), so the two stages are never
adjacent on the hot path; the whole on-device augmentation already costs
~6% of a train step. This file documents the fused-elementwise pattern for
future front-loaded preprocessing (e.g. an offline packing pass).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ctseg_tpu.constants import (
    STACKED_WINDOW_MEAN,
    STACKED_WINDOW_STD,
    WINDOW_ORDER,
    WINDOWING_CONFIG,
)
from ctseg_tpu.transforms.windowing import normalize, windowed_channels

# Static per-channel constants: (lo, hi, mean, std) per window.
_PARAMS = np.array(
    [
        (
            float(WINDOWING_CONFIG[name][1] - WINDOWING_CONFIG[name][0] // 2),
            float(WINDOWING_CONFIG[name][1] + WINDOWING_CONFIG[name][0] // 2),
            float(STACKED_WINDOW_MEAN[i]),
            float(STACKED_WINDOW_STD[i]),
        )
        for i, name in enumerate(WINDOW_ORDER)
    ],
    dtype=np.float32,
)


def _kernel(x_ref, out_ref):
    # Per-window constants selected branchlessly by the channel grid index
    # (scalar block inputs hit Pallas tiling restrictions).
    c = pl.program_id(1)

    def pick(k):
        v = jnp.float32(_PARAMS[0, k])
        for i in range(1, len(WINDOW_ORDER)):
            v = jnp.where(c == i, jnp.float32(_PARAMS[i, k]), v)
        return v

    lo, hi, mean, std = pick(0), pick(1), pick(2), pick(3)
    x = x_ref[:]  # (H, W)
    clipped = jnp.clip(x, lo, hi)
    shifted = (clipped - lo) / (hi - lo + 1e-8)
    out_ref[:] = (shifted - mean) / std


def _jnp_reference(images: jnp.ndarray) -> jnp.ndarray:
    return normalize(windowed_channels(images))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_normalize(
    images: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, H, W) raw HU -> (N, H, W, 3) windowed + standardized."""
    n, h, w = images.shape
    out_cf = pl.pallas_call(
        _kernel,
        grid=(n, len(WINDOW_ORDER)),
        in_specs=[pl.BlockSpec((None, h, w), lambda i, c: (i, 0, 0))],
        out_specs=pl.BlockSpec((None, None, h, w), lambda i, c: (i, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n, len(WINDOW_ORDER), h, w), jnp.float32
        ),
        interpret=interpret,
    )(images.astype(jnp.float32))
    return jnp.moveaxis(out_cf, 1, -1)
