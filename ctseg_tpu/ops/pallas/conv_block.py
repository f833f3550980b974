"""Fused conv3x3 + InstanceNorm + PReLU training op (custom VJP).

This is the production version of the round-1 forward prototype
(ops/pallas/conv_fused.py): the UNet's stride-1 Convolution units
(Conv -> InstanceNorm -> PReLU, the MONAI blocks the reference trains,
capstone/training/base_trainer.py:72-79) run as ONE Pallas kernel, so the
conv output is never materialized to HBM before the norm reductions — the
round-1 profile showed the train step dominated by exactly those
memory-bound norm/activation round-trips (PARITY.md perf notes).

Design:
  - Grid (N, Cout/CT): one sample's padded input stays VMEM-resident across
    the channel tiles (its block index ignores the tile axis, so Mosaic
    fetches it once); each step computes a (HW, CT) conv slice as 9 shifted
    MXU matmuls (f32 accumulation), takes f32 per-channel spatial stats,
    normalizes, applies PReLU, and writes the output tile.
  - bf16-native: matmul inputs stay in the model's compute dtype; statistics
    and normalization are float32 (CLAUDE.md rule: IN stats stay f32 under
    bf16 compute) and outputs are cast back.
  - Training forward also emits xhat (normalized pre-activation) and the
    per-(sample, channel) inverse stddev — exactly the residuals the
    backward needs, so the backward never re-runs the convolution.
  - Backward: one Pallas kernel fuses the PReLU + InstanceNorm gradient
      gh = g * (xhat >= 0 ? 1 : alpha)
      dy = rsinv * (gh - mean(gh) - xhat * mean(gh * xhat))
      dalpha = sum(g * min(xhat, 0))
    and the conv/bias gradients are delegated to XLA via jax.vjp of the
    plain convolution (XLA's transposed-conv kernels are already
    MXU-optimal; the win here is eliminating activation traffic, not
    rewriting matmuls).

Numerics are differential-tested against the unfused XLA chain in
tests/test_conv_block.py (forward and all four gradients).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5

# Per-kernel VMEM working-set budget (bytes). v5e VMEM is larger, but Mosaic
# double-buffers grid blocks; staying near half keeps the pipeline healthy.
VMEM_BUDGET = 12 * 1024 * 1024


def _itemsize(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def default_interpret() -> bool:
    """Interpret mode off-TPU so the fused path is testable on the CPU mesh."""
    return jax.default_backend() != "tpu"


def pick_cout_tile(
    h: int, w: int, cin: int, cout: int, dtype, budget: Optional[int] = None
) -> Optional[int]:
    """Largest MXU-friendly Cout tile whose working set fits the budget.

    The tile must be the full cout or a multiple of 128 dividing it (Pallas
    lane-dimension rule + MXU lane utilization). Returns None if even the
    smallest legal tile does not fit — callers fall back to the unfused path.
    """
    budget = VMEM_BUDGET if budget is None else budget
    it = _itemsize(dtype)
    x_bytes = (h + 2) * (w + 2) * cin * it

    def fits(ct: int) -> bool:
        w_bytes = 9 * cin * ct * it
        acc_bytes = h * w * ct * 4  # f32 accumulator
        out_bytes = 2 * h * w * ct * it  # out + xhat tiles
        # x is resident once; blocks that change per step are double-buffered.
        return x_bytes + 2 * (w_bytes + out_bytes) + acc_bytes <= budget

    candidates = [cout] + [t for t in (512, 384, 256, 128) if cout % t == 0]
    for ct in candidates:
        if fits(ct):
            return ct
    return None


def conv_fusion_supported(x_shape, cout: int, dtype, stride: int = 1,
                          kernel_size: int = 3) -> bool:
    """Whether the fused conv+IN+PReLU path can serve this call site."""
    if stride != 1 or kernel_size != 3 or len(x_shape) != 4:
        return False
    n, h, w, cin = x_shape
    return pick_cout_tile(h, w, cin, cout, dtype) is not None


# ------------------------------------------------------------------- kernels
def _fwd_kernel(x_ref, w_ref, b_ref, alpha_ref, out_ref, xhat_ref, rsinv_ref,
                *, train: bool):
    # x_ref: (H+2, W+2, Cin); w_ref: (9, Cin, CT); b_ref/alpha_ref in SMEM-ish
    # blocks; out/xhat: (H, W, CT); rsinv: (1, CT) f32.
    hp, wp, cin = x_ref.shape
    h, w = hp - 2, wp - 2
    ct = out_ref.shape[-1]

    acc = jnp.zeros((h * w, ct), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[dy : dy + h, dx : dx + w, :].reshape(h * w, cin)
            acc = acc + jnp.dot(
                patch, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]

    mean = jnp.mean(acc, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=0, keepdims=True)
    rsinv = jax.lax.rsqrt(var + EPS)
    xhat = (acc - mean) * rsinv
    alpha = alpha_ref[0].astype(jnp.float32)
    out = jnp.where(xhat >= 0, xhat, alpha * xhat)
    out_ref[:] = out.reshape(h, w, ct).astype(out_ref.dtype)
    if train:
        xhat_ref[:] = xhat.reshape(h, w, ct).astype(xhat_ref.dtype)
        rsinv_ref[:] = rsinv[None]  # (1, 1, CT)


def _bwd_kernel(g_ref, xhat_ref, rsinv_ref, alpha_ref, dy_ref, dalpha_ref):
    # g/xhat: (H, W, CT); rsinv: (1, 1, CT); dy: (H, W, CT);
    # dalpha: (N, n_tiles) partials in SMEM.
    g = g_ref[:].astype(jnp.float32)
    xhat = xhat_ref[:].astype(jnp.float32)
    rsinv = rsinv_ref[0, 0].astype(jnp.float32)[None, None, :]
    alpha = alpha_ref[0].astype(jnp.float32)

    gh = g * jnp.where(xhat >= 0, 1.0, alpha)
    gh_mean = jnp.mean(gh, axis=(0, 1), keepdims=True)
    ghx_mean = jnp.mean(gh * xhat, axis=(0, 1), keepdims=True)
    dy = rsinv * (gh - gh_mean - xhat * ghx_mean)
    dy_ref[:] = dy.astype(dy_ref.dtype)
    dalpha_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(
        g * jnp.minimum(xhat, 0.0)
    )


# --------------------------------------------------------------- entry points
def _run_forward(x, w, b, alpha, train: bool, interpret: bool):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    ct = pick_cout_tile(h, wd, cin, cout, x.dtype)
    assert ct is not None, "conv fusion called on an unsupported shape"

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.astype(x.dtype).reshape(9, cin, cout)
    b2 = b.reshape(1, -1)
    a2 = alpha.reshape(1)

    kernel = functools.partial(_fwd_kernel, train=train)
    out_shapes = [
        jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        jax.ShapeDtypeStruct((n, h, wd, cout) if train else (1, 1, 1, cout), x.dtype),
        # (N, 1, C): a (1, 1, CT) block keeps the last two dims legal for
        # Mosaic (second-to-last == array dim 1; last a 128-multiple or full).
        jax.ShapeDtypeStruct((n if train else 1, 1, cout), jnp.float32),
    ]
    grid = (n, cout // ct)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, h + 2, wd + 2, cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((9, cin, ct), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((None, h, wd, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec(
                (None, h, wd, ct) if train else (None, 1, 1, ct),
                (lambda i, j: (i, 0, 0, j)) if train else (lambda i, j: (0, 0, 0, j)),
            ),
            pl.BlockSpec(
                (1, 1, ct),
                (lambda i, j: (i, 0, j)) if train else (lambda i, j: (0, 0, j)),
            ),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, w9, b2, a2)
    out, xhat, rsinv = outs
    return out, xhat, rsinv[:, 0, :] if train else rsinv


def in_prelu_bwd(g, xhat, rsinv, alpha, interpret: bool = False):
    """Fused PReLU+InstanceNorm backward: returns (dy, dalpha).

    g, xhat: (N, H, W, C); rsinv: (N, C) f32; alpha: (1,).
    dy has g's dtype; dalpha is float32 (1,).
    """
    n, h, w, c = g.shape
    it = _itemsize(g.dtype)
    # 3 streamed blocks (g, xhat, dy), double-buffered.
    ct = c
    for cand in [c] + [t for t in (512, 384, 256, 128) if c % t == 0]:
        if 6 * h * w * cand * it <= VMEM_BUDGET:
            ct = cand
            break
    n_tiles = c // ct
    dy, dalpha_parts = pl.pallas_call(
        _bwd_kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, 1, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((None, h, w, ct), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec(
                (n, n_tiles), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), g.dtype),
            jax.ShapeDtypeStruct((n, n_tiles), jnp.float32),
        ],
        interpret=interpret,
    )(g, xhat, rsinv.reshape(n, 1, c), alpha.astype(jnp.float32))
    return dy, jnp.sum(dalpha_parts)[None]


def _plain_conv(x, w, b):
    return (
        jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b.astype(x.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_conv3x3_in_prelu(x, w, b, alpha, interpret: bool = False):
    """PReLU(InstanceNorm(conv3x3_same(x, w) + b)) as one Pallas kernel.

    x: (N, H, W, Cin) in the compute dtype (f32 or bf16); w: (3, 3, Cin,
    Cout); b: (Cout,); alpha: (1,). Output has x's dtype; statistics are
    float32 internally. Differentiable w.r.t. all four tensors.
    """
    out, _, _ = _run_forward(x, w, b, alpha, train=False, interpret=interpret)
    return out


def _fwd_rule(x, w, b, alpha, interpret):
    out, xhat, rsinv = _run_forward(x, w, b, alpha, train=True, interpret=interpret)
    return out, (x, w, b, alpha, xhat, rsinv)


def _bwd_rule(interpret, res, g):
    x, w, b, alpha, xhat, rsinv = res
    dy, dalpha = in_prelu_bwd(g, xhat, rsinv, alpha, interpret=interpret)
    dy = dy.astype(x.dtype)
    _, conv_vjp = jax.vjp(_plain_conv, x, w, b)
    dx, dw, db = conv_vjp(dy)
    return dx, dw.astype(w.dtype), db.astype(b.dtype), dalpha.astype(alpha.dtype)


fused_conv3x3_in_prelu.defvjp(_fwd_rule, _bwd_rule)


def reference_conv3x3_in_prelu(x, w, b, alpha):
    """Unfused XLA chain with identical semantics (f32 statistics)."""
    y = _plain_conv(x, w, b).astype(jnp.float32)
    mean = jnp.mean(y, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
    xhat = (y - mean) * jax.lax.rsqrt(var + EPS)
    a = alpha.reshape(()).astype(jnp.float32)
    return jnp.where(xhat >= 0, xhat, a * xhat).astype(x.dtype)
