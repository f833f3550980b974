"""Fused InstanceNorm + PReLU Pallas kernel with a custom VJP.

The UNet's ConvUnit tail (InstanceNorm -> PReLU) is memory-bound: two
reductions over (H, W) plus three elementwise passes. This kernel does one
VMEM-resident pass per (sample, channel-tile) for the forward and one for
the backward, with the standard instance-norm gradient

    dx = rsqrt(var+eps) * (gh - mean(gh) - xhat * mean(gh * xhat)),
    gh = g * (xhat >= 0 ? 1 : alpha),
    dalpha = sum(g * min(xhat, 0))

computed in-kernel (stats recomputed rather than saved — cheaper than
spilling xhat to HBM). Numerics match the unfused jnp path to float32
round-off (tests/test_pallas.py), so it is a drop-in for
models/layers.instance_norm + PReLU via `fused_instance_norm_prelu`.

Layout: (N, H, W, C) float32; grid (N, C/CT) with channel tiles on the lane
dimension. Channel counts are padded to the tile size outside the kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _fwd_kernel(x_ref, alpha_ref, y_ref):
    x = x_ref[:]  # (H, W, CT)
    alpha = alpha_ref[0]
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(0, 1), keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + EPS)
    y_ref[:] = jnp.where(xhat >= 0, xhat, alpha * xhat)


def _bwd_kernel(x_ref, g_ref, alpha_ref, dx_ref, dalpha_ref):
    x = x_ref[:]
    g = g_ref[:]
    alpha = alpha_ref[0]
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(0, 1), keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (x - mean) * inv

    gh = g * jnp.where(xhat >= 0, 1.0, alpha)
    gh_mean = jnp.mean(gh, axis=(0, 1), keepdims=True)
    ghx_mean = jnp.mean(gh * xhat, axis=(0, 1), keepdims=True)
    dx_ref[:] = inv * (gh - gh_mean - xhat * ghx_mean)
    # Per-(sample, channel-tile) partial of dalpha; summed by the caller.
    # The (N, C/CT) output keeps a constant index map (tiny full-array
    # block resident across the sequential grid) and each step writes its
    # own element — per-step (1, 1) blocks violate Mosaic tiling rules.
    dalpha_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(
        g * jnp.minimum(xhat, 0.0)
    )


def _pick_tile(c: int, hw: int, budget_bytes: int = 1024 * 1024):
    """Channel tile satisfying BOTH the Pallas lowering rule (the last block
    dim must be a multiple of 128 or the full channel count) and the VMEM
    budget (~1MB per block: Mosaic double-buffers each in/out block and the
    backward holds x, g, dx simultaneously). Returns None when infeasible —
    callers fall back to the unfused path."""
    if hw * c * 4 <= budget_bytes:
        return c
    for t in (512, 384, 256, 128):
        if c % t == 0 and hw * t * 4 <= budget_bytes:
            return t
    return None


def fusion_supported(shape) -> bool:
    """Whether the fused kernel can run for (N, *spatial, C) inputs."""
    import numpy as np

    c = shape[-1]
    hw = int(np.prod(shape[1:-1]))
    return _pick_tile(c, hw) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_instance_norm_prelu(x, alpha, interpret=False):
    """InstanceNorm(affine=False, eps=1e-5) + PReLU(single alpha).

    x: (N, *spatial, C) float32; alpha: (1,) float32.
    """
    return _forward(x, alpha, interpret)


def _reshape_4d(x):
    """Collapse any spatial rank to (N, S1, S2, C) for the kernel."""
    n, c = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    import numpy as np

    s1 = int(np.prod(spatial[:-1])) if len(spatial) > 1 else 1
    s2 = spatial[-1]
    return x.reshape(n, s1, s2, c)


def _forward(x, alpha, interpret):
    orig_shape = x.shape
    x4 = _reshape_4d(x)
    n, h, w, c = x4.shape
    ct = _pick_tile(c, h * w)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(n, c // ct),
        in_specs=[
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x4.dtype),
        interpret=interpret,
    )(x4, alpha)
    return y.reshape(orig_shape)


def _fwd_rule(x, alpha, interpret):
    return _forward(x, alpha, interpret), (x, alpha)


def _bwd_rule(interpret, res, g):
    x, alpha = res
    orig_shape = x.shape
    x4 = _reshape_4d(x)
    g4 = _reshape_4d(g)
    n, h, w, c = x4.shape
    ct = _pick_tile(c, h * w)
    dx, dalpha_parts = pl.pallas_call(
        _bwd_kernel,
        grid=(n, c // ct),
        in_specs=[
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec(
                (n, c // ct), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), x4.dtype),
            jax.ShapeDtypeStruct((n, c // ct), x4.dtype),
        ],
        interpret=interpret,
    )(x4, g4, alpha)
    return dx.reshape(orig_shape), jnp.sum(dalpha_parts)[None]


fused_instance_norm_prelu.defvjp(_fwd_rule, _bwd_rule)


def reference_instance_norm_prelu(x, alpha):
    """Unfused jnp reference (identical math)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + EPS)
    return jnp.where(xhat >= 0, xhat, alpha * xhat)
