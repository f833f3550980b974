"""Exact Euclidean distance transform on device.

The reference computes boundary-loss distance maps with scipy's EDT inside
CPU dataloader workers, per item, every epoch (capstone/data/utils.py:10-26,
capstone/data/datasets.py:58-69). Here the EDT runs on the TPU from the
already-augmented label map, so the maps are exact for the transformed masks
(the reference's semantics) with zero host round trips.

Algorithm: the squared EDT is separable. Pass 1 computes exact 1D distances
along rows with two linear scans (O(HW), VPU-friendly). Pass 2 solves
D2[i,j] = min_k (G[k,j] + (i-k)^2) by brute-force minimum over k — an
O(H^2 W) dense broadcast that XLA tiles well; for H=W=256 this is ~17M
fused multiply-min ops per map, far cheaper on TPU than a host round trip.
Exactness is tested against scipy (tests/test_edt.py).
"""

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import NUM_CLASSES

# Plain Python float: a module-scope jnp scalar would initialize the JAX
# backend (and touch the accelerator) as a side effect of importing the
# package. Cast happens where used.
_BIG = 1e12


def _scan_distance_1d(sites: jnp.ndarray) -> jnp.ndarray:
    """Per-row distance (in steps) to the nearest True along the last axis.

    sites: (..., W) bool. Returns float distance, _BIG where a row has none.
    """
    w = sites.shape[-1]
    init = jnp.full(sites.shape[:-1], _BIG, jnp.float32)

    def step(carry, s):
        # Direction comes from the scan's reverse flag, not the body.
        carry = jnp.where(s, 0.0, carry + 1.0)
        return carry, carry

    xs = jnp.moveaxis(sites, -1, 0)  # scan over W
    _, f = jax.lax.scan(step, init, xs)
    _, b = jax.lax.scan(step, init, xs, reverse=True)
    dist = jnp.minimum(f, b)
    return jnp.moveaxis(dist, 0, -1)


def _use_pallas_min_plus(requested: bool) -> bool:
    """Whether a min-plus pass runs as the Pallas kernel.

    The XLA lowering of the all-pairs reduce re-reads the d2 slab per
    output row (HBM-bound: 74 of the device HD95's 131 ms/volume at the
    eval shape, perf/hd95_cost_v5e.json); the kernel keeps the slab in
    VMEM (ops/pallas/min_plus.py), bit-exact by construction and by test
    (2.5x on the eval EDTs). It is OPT-IN per call site because inside
    the boundary-loss TRAIN step the custom call breaks XLA's global
    fusion plan and the full step measured 129.3 -> 222.3 ms (the same
    end-to-end phenomenon as the round-3 fused-norm kernels, PARITY.md) —
    the metric path requests it (metrics/hd95.py), the loss path does not.
    CTSEG_EDT_PALLAS=0 force-disables everywhere, =1 force-enables
    (measurement/debug); default honors the caller's request on TPU.
    """
    import os

    flag = os.environ.get("CTSEG_EDT_PALLAS", "auto")
    if flag in ("0", "false"):
        return False
    if flag in ("1", "true"):
        return jax.default_backend() == "tpu"
    return requested and jax.default_backend() == "tpu"


def _min_plus(d2: jnp.ndarray, axis: int, scale=None,
              pallas: bool = False) -> jnp.ndarray:
    """One separable squared-EDT pass: D2[i] = min_k (d2[k] + (s*(i - k))^2).

    Exact (the squared EDT is separable per axis, with any per-axis scale
    — the anisotropic squared distance decomposes as a sum over axes of
    s_ax^2 * delta_ax^2); brute-force O(n^2) over the axis. On TPU the
    pass runs as a Pallas VPU kernel (see _use_pallas_min_plus); elsewhere
    XLA fuses the (n, n, rest) broadcast into the reduction. `scale` may
    be a traced scalar (voxel spacing along this axis), so one compiled
    program serves every patient's anisotropic spacing. Both paths compute
    the identical float expression and are f32-bit-equal (tests/test_pallas.py).
    """
    n = d2.shape[axis]
    d2m = jnp.moveaxis(d2, axis, 0)  # (n, ...)
    if _use_pallas_min_plus(pallas) and d2.dtype == jnp.float32:
        from ctseg_tpu.ops.pallas.min_plus import min_plus_2d

        s = jnp.float32(1.0) if scale is None else scale
        rest = d2m.shape[1:]
        out = min_plus_2d(d2m.reshape(n, -1), s).reshape((n,) + rest)
        return jnp.moveaxis(out, 0, axis)
    i = jnp.arange(n, dtype=d2.dtype)
    delta = i[:, None] - i[None, :]  # (n, n)
    if scale is not None:
        delta = delta * scale
    cost = delta**2
    cost = cost.reshape((n, n) + (1,) * (d2m.ndim - 1))
    out = jnp.min(cost + d2m[None], axis=1)
    return jnp.moveaxis(out, 0, axis)


def edt_squared(mask: jnp.ndarray, spacing=None,
                pallas: bool = False) -> jnp.ndarray:
    """Exact SQUARED Euclidean distance to the nearest zero of `mask`, N-D.

    scipy.ndimage.distance_transform_edt(mask, sampling=spacing)**2
    semantics: distance is 0 on zeros of the input; an all-ones input gives
    _BIG. `spacing` is an optional per-axis voxel size, in `mask`'s axis
    order — a Python sequence or a traced (ndim,) array (runtime spacing
    shares one compilation across patients). At unit spacing (None) values
    are integer-valued floats (sums of squared integer offsets), which
    downstream percentile code exploits (metrics/hd95.py).
    """
    sites = jnp.logical_not(mask.astype(bool))
    g = _scan_distance_1d(sites)  # exact 1D step count along the last axis
    if spacing is not None:
        spacing = jnp.asarray(spacing, jnp.float32)
        g = g * spacing[-1]
    d2 = jnp.minimum(g * g, _BIG)
    for ax in range(mask.ndim - 1):
        scale = None if spacing is None else spacing[ax]
        d2 = _min_plus(d2, ax, scale, pallas=pallas)
    return d2


def edt(mask: jnp.ndarray, spacing=None) -> jnp.ndarray:
    """Euclidean distance from each pixel to the nearest zero of `mask`.

    mask: N-D bool/int — scipy.ndimage.distance_transform_edt semantics:
    distance is 0 on zeros of the input, all-ones input gives large values.
    `spacing`: optional per-axis voxel size (scipy's `sampling=`).
    """
    return jnp.sqrt(edt_squared(mask, spacing))


def signed_distance_map(mask: jnp.ndarray) -> jnp.ndarray:
    """Signed EDT of one binary mask with the reference's convention:
    dist(~mask)*~mask - (dist(mask)-1)*mask, all divided by 255
    (capstone/data/utils.py:10-26); an empty mask yields zeros."""
    mask = mask.astype(bool)
    pos = mask
    neg = jnp.logical_not(mask)
    d_out = edt(neg)  # distance to nearest structure pixel, on background
    d_in = edt(pos)  # distance to nearest background pixel, on structure
    result = d_out * neg - (d_in - 1.0) * pos
    nonempty = jnp.any(pos)
    return jnp.where(nonempty, result, 0.0) / 255.0


def signed_distance_maps_from_labels(
    labels: jnp.ndarray, n_classes: int = NUM_CLASSES
) -> jnp.ndarray:
    """(N, H, W) label map -> (N, H, W, n_classes-1) signed distance maps
    (background excluded), matching the boundary-loss input layout."""
    def per_sample(lab):
        def per_class(c):
            return signed_distance_map(lab == c)

        maps = jax.vmap(per_class)(jnp.arange(1, n_classes))  # (C-1, H, W)
        return jnp.moveaxis(maps, 0, -1)

    return jax.vmap(per_sample)(labels)
