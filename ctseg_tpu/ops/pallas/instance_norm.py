"""Fused InstanceNorm + PReLU Pallas kernels with a custom VJP (bf16-native).

Why this kernel exists (measured, v5e, round 3): a train-step trace of the
flagship Model L configuration shows the convs already run at ~96% of the
chip's pure-MXU minimum (49.5 ms of a 97.7 ms step vs a 47.6 ms analytic
floor); the remaining ~50 ms is HBM-bound elementwise/reduction work, a
large share of it the InstanceNorm chains (f32 stat reductions + normalize
passes + their backward). This kernel family replaces each IN+PReLU chain
with single-fetch passes.

LAYOUT RULE (measured): blocks keep the array's native (N, H, W, C) shape.
A first version collapsed spatial dims to (N, S, C) before the kernel —
the reshape is NOT a bitcast once XLA lane-pads C in the tiled layout, and
the step gained 46.7 ms/step of relayout `copy` ops (perf/profile_step.py
with fused_norm=1). Never reshape a padded-lane array at a kernel boundary.

Two fused forms, selected per shape:

RESIDENT (whole (H, W, CT) slab fits the in-step scoped-VMEM budget): one
pass per (sample, channel-tile):
  forward:  read x once (compute dtype, e.g. bf16) -> f32 one-pass stats
            (E[x], E[x^2], matching models/layers.py::instance_norm) ->
            normalize + PReLU in-register -> write y once. (1R + 1W)
  backward: read x and g once, reuse the saved per-(sample, channel)
            mean/var residuals (tiny f32 arrays), write dx once. (2R + 1W)

STREAMING (larger slabs): the H axis is tiled and each sweep streams
(1, HT, W, CT) blocks through VMEM with f32 accumulator scratch:
  forward:  stats sweep (read x) -> normalize sweep (read x, write y).
            (2R + 1W, no f32 HBM round trip)
  backward: gh-stats sweep (read x, g) -> dx sweep (read x, g, write dx).
            (4R + 1W)

The analytic gradient in both forms:
  gh = g * (xhat >= 0 ? 1 : alpha)
  dx = rsqrt(var+eps) * (gh - mean(gh) - xhat * mean(gh * xhat))
  dalpha = sum(g * min(xhat, 0))

Numerics match the unfused jnp path to float32 round-off
(tests/test_pallas.py); parameter-free, so `fused_instance_norm_prelu` is a
drop-in for models/layers.instance_norm + PReLU.

Adoption status: OFF by default (TrainConfig.fused_norm) — measured full
step 99.6 -> 350.4 ms on v5e (perf/measure_fused_norm.py): the custom calls
break XLA's global fusion/layout plan (un-fused bias adds, activation-sized
copies/reverses, conv fusions 49.5 -> 114 ms) for far more than the norm
chain's ~23 ms theoretical ceiling. Full analysis: PARITY.md "Round-3
roofline close". The op stays tested and checkpoint-compatible.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5

# Per-block working-set budget for the RESIDENT form, in f32 bytes of one
# effective (H, W, CT) block. Empirical (v5e): a standalone (16384, 64) bf16
# resident block compiles, but INSIDE the full train step the same block's
# scoped-VMEM stack (x + f32 temps + y) overflows the 16 MB limit by 2.5 KB
# — so the in-step budget is 2 MB; larger slabs take the streaming form.
RESIDENT_BUDGET = 2 * 1024 * 1024
# Streaming sweeps: target elements of one (HT, W, CT) block.
STREAM_BLOCK_ELEMS = 128 * 1024


def _eff(ct: int) -> int:
    return max(ct, 32)  # lane padding floor


def _pick_tile(c: int, h: int, w: int):
    """(ct, h_t, resident): channel tile, H tile, and whether the whole
    (H, W, CT) slab fits the in-step VMEM budget (resident form)."""
    if h * w * _eff(c) * 4 <= RESIDENT_BUDGET:
        return c, h, True
    for t in (512, 256, 128):  # resident with a 128-multiple channel tile
        if c % t == 0 and h * w * t * 4 <= RESIDENT_BUDGET:
            return t, h, True
    # Streaming: full C on lanes, h_t the largest divisor of h within the
    # target block size.
    target = max(STREAM_BLOCK_ELEMS // (w * _eff(c)), 1)
    h_t = 1
    for cand in range(min(target, h), 0, -1):
        if h % cand == 0:
            h_t = cand
            break
    return c, h_t, False


def fusion_supported(shape) -> bool:
    """The two forms together cover every (N, *spatial, C) input with at
    least one spatial dim (rank >= 3; _as_4d needs a spatial axis to merge).
    Callers fall back to the unfused XLA chain when this is False."""
    return len(shape) >= 3


def _as_4d(x):
    """(N, *spatial, C) -> (N, H', W, C) keeping the minor dims intact
    (merging leading spatial dims is layout-free; touching W or C is not)."""
    import numpy as np

    if x.ndim == 4:
        return x
    if x.ndim == 3:  # (N, S, C): give it a unit row axis
        return x.reshape(x.shape[0], 1, x.shape[1], x.shape[2])
    n, c = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    lead = int(np.prod(spatial[:-1]))
    return x.reshape(n, lead, spatial[-1], c)


# ------------------------------------------------------------ resident form


def _fwd_resident(x_ref, alpha_ref, y_ref, mean_ref, var_ref):
    x = x_ref[:].astype(jnp.float32)  # (H, W, CT)
    alpha = alpha_ref[0]
    m = jnp.mean(x, axis=(0, 1), keepdims=True)  # (1, 1, CT)
    m2 = jnp.mean(x * x, axis=(0, 1), keepdims=True)
    # Clamp like models/layers.py::instance_norm: one-pass E[x^2]-E[x]^2 can
    # round negative for near-constant channels with large mean, and
    # rsqrt(var+EPS) would then be NaN.
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (x - m) * inv
    y_ref[:] = jnp.where(xhat >= 0, xhat, alpha * xhat).astype(y_ref.dtype)
    mean_ref[:] = m[0]
    var_ref[:] = var[0]


def _bwd_resident(x_ref, g_ref, mean_ref, var_ref, alpha_ref, dx_ref,
                  dalpha_ref):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    alpha = alpha_ref[0]
    m = mean_ref[:][None]  # (1, 1, CT)
    inv = jax.lax.rsqrt(var_ref[:][None] + EPS)
    xhat = (x - m) * inv

    gh = g * jnp.where(xhat >= 0, 1.0, alpha)
    gh_mean = jnp.mean(gh, axis=(0, 1), keepdims=True)
    ghx_mean = jnp.mean(gh * xhat, axis=(0, 1), keepdims=True)
    dx_ref[:] = (inv * (gh - gh_mean - xhat * ghx_mean)).astype(dx_ref.dtype)
    # Per-(sample, channel-tile) partial of dalpha; summed by the caller.
    # The (N, C/CT) output keeps a constant index map (tiny full-array
    # block resident across the sequential grid) and each step writes its
    # own element — per-step (1, 1) blocks violate Mosaic tiling rules.
    dalpha_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(
        g * jnp.minimum(xhat, 0.0)
    )


# ----------------------------------------------------------- streaming form


def _stats_stream(x_ref, mean_ref, var_ref, acc_ref):
    """Grid (N, C/CT, H/HT): accumulate sums, finalize at the last tile.

    (Pallas ref order: inputs, then outputs, then scratch.)"""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)  # (HT, W, CT)
    acc_ref[0:1, :] += jnp.sum(x, axis=(0, 1), keepdims=True)[0]
    acc_ref[1:2, :] += jnp.sum(x * x, axis=(0, 1), keepdims=True)[0]

    @pl.when(k == n_k - 1)
    def _():
        s_total = jnp.float32(x_ref.shape[0] * x_ref.shape[1] * n_k)
        m = acc_ref[0:1, :] / s_total
        # Clamped like the resident form / models/layers.py (see above).
        var = jnp.maximum(acc_ref[1:2, :] / s_total - m * m, 0.0)
        mean_ref[:] = m
        var_ref[:] = var


def _normalize_stream(x_ref, mean_ref, var_ref, alpha_ref, y_ref):
    x = x_ref[:].astype(jnp.float32)  # (HT, W, CT)
    m = mean_ref[:][None]  # (1, 1, CT)
    inv = jax.lax.rsqrt(var_ref[:][None] + EPS)
    xhat = (x - m) * inv
    alpha = alpha_ref[0]
    y_ref[:] = jnp.where(xhat >= 0, xhat, alpha * xhat).astype(y_ref.dtype)


def _ghstats_stream(x_ref, g_ref, mean_ref, var_ref, alpha_ref,
                    ghm_ref, ghxm_ref, dalpha_ref, acc_ref):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    alpha = alpha_ref[0]
    m = mean_ref[:][None]
    inv = jax.lax.rsqrt(var_ref[:][None] + EPS)
    xhat = (x - m) * inv
    gh = g * jnp.where(xhat >= 0, 1.0, alpha)
    acc_ref[0:1, :] += jnp.sum(gh, axis=(0, 1), keepdims=True)[0]
    acc_ref[1:2, :] += jnp.sum(gh * xhat, axis=(0, 1), keepdims=True)[0]
    acc_ref[2:3, :] += jnp.sum(
        g * jnp.minimum(xhat, 0.0), axis=(0, 1), keepdims=True
    )[0]

    # program_id must be called OUTSIDE the pl.when body (interpret mode
    # lowers the body as a plain cond branch where the primitive is gone).
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(k == n_k - 1)
    def _():
        s_total = jnp.float32(x_ref.shape[0] * x_ref.shape[1] * n_k)
        ghm_ref[:] = acc_ref[0:1, :] / s_total
        ghxm_ref[:] = acc_ref[1:2, :] / s_total
        dalpha_ref[i, j] = jnp.sum(acc_ref[2:3, :])


def _dx_stream(x_ref, g_ref, mean_ref, var_ref, ghm_ref, ghxm_ref, alpha_ref,
               dx_ref):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    alpha = alpha_ref[0]
    m = mean_ref[:][None]
    inv = jax.lax.rsqrt(var_ref[:][None] + EPS)
    xhat = (x - m) * inv
    gh = g * jnp.where(xhat >= 0, 1.0, alpha)
    dx = inv * (gh - ghm_ref[:][None] - xhat * ghxm_ref[:][None])
    dx_ref[:] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------- entry points


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_instance_norm_prelu(x, alpha, interpret=False):
    """InstanceNorm(affine=False, eps=1e-5) + PReLU(single alpha).

    x: (N, *spatial, C) float (bf16/f32 — stats are f32 either way);
    alpha: (1,) float. Output in x's dtype.
    """
    y, _, _ = _forward(x, alpha, interpret)
    return y


def _forward(x, alpha, interpret):
    orig_shape = x.shape
    x4 = _as_4d(x)
    n, h, w, c = x4.shape
    ct, h_t, resident = _pick_tile(c, h, w)
    alpha = alpha.astype(jnp.float32)
    # Stats live as (N, 1, C): the trailing two block dims (1, ct) then
    # EQUAL the array dims (Mosaic's tiling rule rejects a (1, ct) block on
    # an (N, C) array because the sublane dim 1 neither divides 8 nor
    # equals N).
    stats_shape = [
        jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
    ]
    stats_spec = pl.BlockSpec((None, 1, ct), lambda i, j, *k: (i, 0, j))
    if resident:
        y, mean, var = pl.pallas_call(
            _fwd_resident,
            grid=(n, c // ct),
            in_specs=[
                pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((1,), lambda i, j: (0,)),
            ],
            out_specs=[
                pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
                stats_spec,
                stats_spec,
            ],
            out_shape=[jax.ShapeDtypeStruct((n, h, w, c), x4.dtype)]
            + stats_shape,
            interpret=interpret,
        )(x4, alpha)
        return y.reshape(orig_shape), mean, var

    x_spec = pl.BlockSpec((None, h_t, w, ct), lambda i, j, k: (i, k, 0, j))
    mean, var = pl.pallas_call(
        _stats_stream,
        grid=(n, c // ct, h // h_t),
        in_specs=[x_spec],
        out_specs=[stats_spec, stats_spec],
        out_shape=stats_shape,
        scratch_shapes=[pltpu.VMEM((2, ct), jnp.float32)],
        interpret=interpret,
    )(x4)
    y = pl.pallas_call(
        _normalize_stream,
        grid=(n, c // ct, h // h_t),
        in_specs=[
            x_spec,
            stats_spec,
            stats_spec,
            pl.BlockSpec((1,), lambda i, j, k: (0,)),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x4.dtype),
        interpret=interpret,
    )(x4, mean, var, alpha)
    return y.reshape(orig_shape), mean, var


def _fwd_rule(x, alpha, interpret):
    y, mean, var = _forward(x, alpha, interpret)
    return y, (x, mean, var, alpha)


def _bwd_rule(interpret, res, g):
    x, mean, var, alpha = res
    orig_shape = x.shape
    x4 = _as_4d(x)
    g4 = _as_4d(g)
    n, h, w, c = x4.shape
    ct, h_t, resident = _pick_tile(c, h, w)
    alpha32 = alpha.astype(jnp.float32)
    stats_spec = pl.BlockSpec((None, 1, ct), lambda i, j, *k: (i, 0, j))
    if resident:
        dx, dalpha_parts = pl.pallas_call(
            _bwd_resident,
            grid=(n, c // ct),
            in_specs=[
                pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
                stats_spec,
                stats_spec,
                pl.BlockSpec((1,), lambda i, j: (0,)),
            ],
            out_specs=[
                pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec(
                    (n, c // ct), lambda i, j: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, w, c), x4.dtype),
                jax.ShapeDtypeStruct((n, c // ct), jnp.float32),
            ],
            interpret=interpret,
        )(x4, g4, mean, var, alpha32)
        dalpha = jnp.sum(dalpha_parts).astype(alpha.dtype)[None]
        return dx.reshape(orig_shape), dalpha

    x_spec = pl.BlockSpec((None, h_t, w, ct), lambda i, j, k: (i, k, 0, j))
    alpha_spec = pl.BlockSpec((1,), lambda i, j, k: (0,))
    ghm, ghxm, dalpha_parts = pl.pallas_call(
        _ghstats_stream,
        grid=(n, c // ct, h // h_t),
        in_specs=[x_spec, x_spec, stats_spec, stats_spec, alpha_spec],
        out_specs=[
            stats_spec,
            stats_spec,
            pl.BlockSpec(
                (n, c // ct), lambda i, j, k: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, c // ct), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, ct), jnp.float32)],
        interpret=interpret,
    )(x4, g4, mean, var, alpha32)
    dx = pl.pallas_call(
        _dx_stream,
        grid=(n, c // ct, h // h_t),
        in_specs=[
            x_spec, x_spec, stats_spec, stats_spec, stats_spec, stats_spec,
            alpha_spec,
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x4.dtype),
        interpret=interpret,
    )(x4, g4, mean, var, ghm, ghxm, alpha32)
    dalpha = jnp.sum(dalpha_parts).astype(alpha.dtype)[None]
    return dx.reshape(orig_shape), dalpha


fused_instance_norm_prelu.defvjp(_fwd_rule, _bwd_rule)


def reference_instance_norm_prelu(x, alpha):
    """Unfused jnp reference (identical math, f32 one-pass stats)."""
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=axes, keepdims=True) - mean * mean, 0.0
    )
    xhat = (x32 - mean) * jax.lax.rsqrt(var + EPS)
    a = alpha.astype(jnp.float32)
    return jnp.where(xhat >= 0, xhat, a * xhat).astype(x.dtype)
