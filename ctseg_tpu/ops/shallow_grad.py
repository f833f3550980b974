"""Lane-efficient weight gradients for shallow-channel convolutions.

Why this exists: the final decoder level of the UNet (MONAI architecture,
capstone/training/base_trainer.py:64-79 / volumetric/base_trainer.py:58-72)
maps directly to out_channels=10, so the full-resolution transposed conv and
the trailing residual-unit conv run with 10-channel operands. XLA's native
conv-weight-grad keeps channels in the lane (minor-most) dimension, so with
C=10 only 10/128 lanes carry data and the op runs at ~6% of HBM bandwidth —
measured at 35 ms of the 238.6 ms 3D train step (perf/profile3d_b128_v5e.json,
perf/probe_convgrad_shallow.py).

The fix is a reformulation, not a kernel (the obstruction is layout, not
fusion). Two formulations were measured at the real sites
(perf/probe_convgrad_shallow.py -> perf/convgrad_shallow_v5e.json):

  - Plain 3D conv (10->10): fold the small depth axis and the channels into
    ONE lane-full feature axis on both operands, take the 2D weight grad of
    the merged conv, and extract the true dW as an exact diagonal band
    (_dw_merged_3d). Measured 33.4 -> 19.3 ms (1.7x; traffic floor 3.4 ms).
    The batch-as-contracted-feature conv form ("batchfeat") measured a TIE
    with native here (XLA's huge-kernel conv path is equally lane-poor), so
    it is NOT used for the plain conv.
  - Transposed conv (128->10, stride 2): dW as a conv over the output
    cotangent with the INPUT as a stride-dilated rhs and batch as the
    contracted feature dim. conv_transpose does not flip the kernel, so the
    tap equation is o = s*i + pad_lo - t and the conv result arrives
    spatially flipped (see _convt_smallc_bwd). Measured 13.9 -> 11.3 ms.

Both are exact reorderings of the same sums (no approximation); the custom
VJPs below swap ONLY the weight gradient — dx and db stay on XLA's native
transpose rules. Forward numerics are bit-identical to nn.Conv /
nn.ConvTranspose (same lax calls), so parameter trees and checkpoints are
unchanged; gradient equality is differential-tested against the native VJP in
tests/test_shallow_grad.py (2D and 3D, f32/f64).

Applied from ConvUnit / ConvTransposeUnit when min(Cin, Cout) <=
SMALLC_THRESHOLD (shape-based, platform-independent, so the CPU test suite
exercises exactly the TPU code path). Measured verdict on v5e in
perf/convgrad_shallow_v5e.json.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Largest min(Cin, Cout) that routes to the reformulated weight grad. The
# real sites have 10 channels (out_channels); 16 leaves headroom without
# touching any lane-full site (the next-smallest model channel count is 64).
SMALLC_THRESHOLD = 16

# Deepest activation the merged (D, C)-fold dW is measured to win at. Its
# redundant MACs grow O(D) and its (D+2p)*C x D*Co intermediate grows O(D^2),
# so the win was swept across D on chip (perf/probe_merged_dw_depth.py ->
# perf/merged_dw_depth_v5e.json): 1.47-1.87x at every D in 16..64, no
# inversion found. Beyond the measured envelope the plain-conv rewrite falls
# back to XLA's native dW rather than extrapolating.
SMALLC_MERGED_MAX_DEPTH = 64

_SPATIAL = {1: "H", 2: "HW", 3: "HWD"}


def _dims(ndim: int):
    s = _SPATIAL[ndim]
    return (f"N{s}C", f"{s}IO", f"N{s}C")


def _grad_dims(ndim: int):
    """dW-as-conv dimension numbers: batch contracted as the feature dim."""
    s = _SPATIAL[ndim]
    return (f"C{s}N", f"I{s}O", f"N{s}C")


def smallc_supported(cin: int, cout: int, stride: int, kernel_size: int,
                     transpose: bool = False, ndim: int = 3,
                     depth: int | None = None) -> bool:
    """Whether the reformulated weight grad serves this conv configuration.

    The plain-conv rewrite is 3D-only: it folds the depth axis into the
    feature dim (no 2D analogue — batchfeat ties native on the plain conv,
    perf/convgrad_shallow_v5e.json), and is depth-bounded at the measured
    envelope (SMALLC_MERGED_MAX_DEPTH; pass the activation's depth — None
    means "unknown", which keeps the rewrite for the D<=64 sites this model
    family produces). The transposed rewrite has zero redundancy (batch is
    the contracted dim, no depth fold) and wins in both ranks
    (2D: 5.24 -> 3.56 ms isolated, perf/convgrad_shallow2d_v5e.json).
    """
    if min(cin, cout) > SMALLC_THRESHOLD:
        return False
    if transpose:
        # Derivation above assumes the unit's k=3 / s=2 torch-style padding.
        return kernel_size == 3 and stride == 2 and ndim in (2, 3)
    if depth is not None and depth > SMALLC_MERGED_MAX_DEPTH:
        return False
    return ndim == 3 and stride == 1 and kernel_size % 2 == 1


def _dw_merged_3d(x, dy, pad, k):
    """3D conv weight grad via the merged (D, C) feature fold.

    Fold the (small) depth and channel axes of BOTH operands into one
    lane-full feature axis and take the weight gradient of the equivalent
    2D conv; the true dW is an exact banded extraction:

        dw[kh,kw,kd,ci,co] = sum_q M[kh,kw,(q+kd,ci),(q,co)]

    where M is the (k, k, (D+2p)*C, D*Co) 2D weight grad of the merged
    operands. Computes (D+2p)*C x D*Co partial sums where only the 3-band
    is needed (~5.3x redundant MACs at D=16) but runs lane-full — measured
    1.7x over XLA's native dW at the real decoder site and the only
    winning formulation found there (perf/probe_convgrad_shallow.py).
    """
    b, h, w_, d, c = x.shape
    co = dy.shape[-1]
    acc = jnp.promote_types(x.dtype, jnp.float32)
    # The explicit pre-pad + reshape looks like avoidable traffic (an
    # out-of-range depth tap contributes zero, so a no-pad bitcast-view
    # variant is mathematically identical) — but the no-pad form measured
    # SLOWER end-to-end (246.7 vs 240.8 ms/step on v5e): the materialized
    # padded copy hands XLA a layout the merged conv tiles well, while the
    # view keeps the (D, C)-split layout and costs a hidden relayout.
    xp = jnp.pad(x, ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),))
    xm = xp.reshape(b, h + 2 * pad, w_ + 2 * pad, (d + 2 * pad) * c)
    dym = dy.reshape(b, h, w_, d * co)
    _, vjp = jax.vjp(
        lambda w2: lax.conv_general_dilated(
            xm, w2, (1, 1), [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        jnp.zeros((k, k, (d + 2 * pad) * c, d * co), x.dtype),
    )
    m6 = vjp(dym)[0].reshape(k, k, d + 2 * pad, c, d, co).astype(acc)
    # dw[kh,kw,kd,ci,co] = sum_q m6[kh,kw,q+kd,ci,q,co]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, d + 2 * pad, d), 1)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (k, d + 2 * pad, d), 2)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (k, d + 2 * pad, d), 0)
    ind = (p_idx == q_idx + k_idx).astype(acc)
    return jnp.einsum("hwpiqo,kpq->hwkio", m6, ind)


# ------------------------------------------- packed depth-fold strided conv
def packed_depth_supported(cin: int, cout: int, stride: int,
                           kernel_size: int, ndim: int, depth: int) -> bool:
    """Whether the packed depth-fold forward serves this strided 3D conv.

    Targets the lane-starved stem family (Cin=1 at full resolution, stride
    2 — the model's first conv AND its residual shortcut): measured 6.11 ->
    3.54 ms fwd+bwd ISOLATED at the bench shape (perf/probe_stem_packed.py).
    The dense fold costs depth/k redundant MACs, so the gate stays inside
    the measured bandwidth-bound territory (cin * depth <= 16).

    REJECTED for production (CLAUDE.md rule 3): on the compiled full 3D
    train step the packed build runs 0.986x of native (238.4 vs 235.1 ms,
    perf/ab_stem_packed_step_v5e.json) — XLA already overlaps the stem with
    the deep levels, and the folded kernel's weight gather breaks that
    schedule. Kept as a tested exact-math alternative; models default
    packed_depth=False.
    """
    return (
        ndim == 3
        and stride >= 2
        and kernel_size % 2 == 1
        and depth % stride == 0
        and depth >= kernel_size
        and cin * depth <= 16
    )


def conv_packed_depth(x, w, b, stride):
    """Strided 3D conv as ONE 2D conv over the (D, Cin)-folded input.

    y[b,h',w',d',co] = sum_{kh,kw,kd} x[b, s*h'+kh-p, s*w'+kw-p,
                                         s*d'+kd-p, ci] * w[kh,kw,kd,ci,co]
    == conv2d(xm[B,H,W,D*Ci], W2, stride s, pad p) with the packed kernel
       W2[kh,kw,(d,ci),(d',co)] = w[kh,kw, d - s*d' + p, ci, co]
    (zero where the tap index leaves [0, k) — exactly the zero padding the
    3D conv would have read). Both reshapes are free bitcast views; the
    kernel packing is a tiny gather the autodiff differentiates through,
    so backward runs on the same lane-full 2D conv (no custom VJP).
    """
    bsz, h, wd, d, ci = x.shape
    k = w.shape[0]
    co = w.shape[-1]
    p = (k - 1) // 2
    d_out = d // stride

    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, d_out), 0)
    dp_idx = jax.lax.broadcasted_iota(jnp.int32, (d, d_out), 1)
    t = d_idx - stride * dp_idx + p
    valid = (t >= 0) & (t < k)
    tc = jnp.clip(t, 0, k - 1)
    w = w.astype(x.dtype)
    w2 = jnp.where(
        valid[None, None, :, :, None, None],
        w[:, :, tc, :, :],  # (kh, kw, d, d', ci, co)
        jnp.zeros((), x.dtype),
    )
    w2 = jnp.transpose(w2, (0, 1, 2, 4, 3, 5)).reshape(k, k, d * ci, d_out * co)

    xm = x.reshape(bsz, h, wd, d * ci)
    y = lax.conv_general_dilated(
        xm, w2, (stride, stride), [(p, p)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # The 2D conv applies the exact per-axis stride/pad semantics of the 3D
    # conv on H/W (including odd sizes), so read the output extents back.
    y = y.reshape(y.shape[0], y.shape[1], y.shape[2], d_out, co)
    return y + b.astype(x.dtype)


# ------------------------------------------------------------- plain conv
def _conv_fwd_raw(x, w, b, stride, pad):
    ndim = x.ndim - 2
    return (
        lax.conv_general_dilated(
            x, w, (stride,) * ndim, [(pad, pad)] * ndim,
            dimension_numbers=_dims(ndim),
        )
        + b.astype(x.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_smallc(x, w, b, stride, pad):
    """nn.Conv-equivalent forward; dW via the batch-as-feature contraction.

    x: (N, *spatial, Cin); w: (*k, Cin, Cout); b: (Cout,). stride must be 1
    and k odd with symmetric pad=(k-1)//2 (asserted by smallc_supported).
    """
    return _conv_fwd_raw(x, w, b, stride, pad)


def _conv_smallc_fwd(x, w, b, stride, pad):
    return _conv_fwd_raw(x, w, b, stride, pad), (x, w)


def _conv_smallc_bwd(stride, pad, res, dy):
    x, w = res
    ndim = x.ndim - 2
    # dx: XLA's native transpose rule (lane-full on the Cin side of the
    # rotated kernel is irrelevant — this op is fine natively, and the
    # rewrite here would buy nothing).
    _, vjp_x = jax.vjp(lambda x_: _conv_fwd_raw(x_, w, jnp.zeros((), x.dtype), stride, pad), x)
    dx = vjp_x(dy)[0]
    if ndim == 3:
        dw = _dw_merged_3d(x, dy, pad, w.shape[0]).astype(w.dtype)
    else:
        # Measured tie vs native (perf/convgrad_shallow_v5e.json batchfeat);
        # keep XLA's own formulation outside 3D.
        _, vjp_w = jax.vjp(
            lambda w_: _conv_fwd_raw(x, w_, jnp.zeros((), x.dtype), stride, pad), w
        )
        dw = vjp_w(dy)[0]
    db = jnp.sum(
        dy.astype(jnp.promote_types(dy.dtype, jnp.float32)),
        axis=tuple(range(dy.ndim - 1)),
    )
    return dx, dw, db.astype(dy.dtype)


conv_smallc.defvjp(_conv_smallc_fwd, _conv_smallc_bwd)


# -------------------------------------------------------- transposed conv
def _convt_fwd_raw(x, w, b, stride, kernel_size):
    ndim = x.ndim - 2
    p = (kernel_size - 1) // 2
    pad_lo = kernel_size - 1 - p
    pad_hi = kernel_size - 1 - p + stride - 1
    return (
        lax.conv_transpose(
            x, w, (stride,) * ndim, [(pad_lo, pad_hi)] * ndim,
            dimension_numbers=_dims(ndim),
        )
        + b.astype(x.dtype)
    )


def _convt_fwd_dispatch(x, w, b, stride, kernel_size, fwd_mode):
    """Forward formulation selector for the smallc transposed conv.

    "native" is XLA's dilated-input lowering. "packed" computes the same
    taps/products as ONE stride-1 conv producing all s^ndim phases as
    s^ndim * Cout lane-fuller output features + depth-to-space
    (models/layers.py::_packed_conv_transpose) — measured 9.4 vs 12.4 ms
    fwd at the 3D up0 site (128->10 at (64,64,8)->(128,128,16), batch 128,
    perf/transp3d_v5e.json). Only the forward changes; dx/dW/db below are
    formulation-independent gradients of the same linear map.
    """
    if fwd_mode == "packed":
        from ctseg_tpu.models.layers import polyphase_conv_transpose

        return polyphase_conv_transpose(
            x, w, b, stride, x.dtype, mode="packed"
        )
    if fwd_mode != "native":
        raise ValueError(
            f"fwd_mode must be 'native' or 'packed', got {fwd_mode!r}"
        )
    return _convt_fwd_raw(x, w, b, stride, kernel_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_transpose_smallc(x, w, b, stride, kernel_size, fwd_mode="native"):
    """nn.ConvTranspose-equivalent (out = in*s); dW via dilated-rhs conv."""
    return _convt_fwd_dispatch(x, w, b, stride, kernel_size, fwd_mode)


def _convt_smallc_fwd(x, w, b, stride, kernel_size, fwd_mode):
    return _convt_fwd_dispatch(x, w, b, stride, kernel_size, fwd_mode), (x, w)


def _convt_smallc_bwd(stride, kernel_size, fwd_mode, res, dy):
    x, w = res
    ndim = x.ndim - 2
    p = (kernel_size - 1) // 2
    pad_hi = kernel_size - stride - p
    assert pad_hi >= 0, "unsupported (k, s) for the smallc transposed grad"
    _, vjp_x = jax.vjp(
        lambda x_: _convt_fwd_raw(x_, w, jnp.zeros((), x.dtype), stride, kernel_size), x
    )
    dx = vjp_x(dy)[0]
    # conv_transpose does NOT flip the kernel, so the tap equation is
    # o = s*i + pad_lo - t (see _polyphase_taps in models/layers.py), giving
    #   dW[t, ci, co] = sum_i x[i, ci] dy[s*i + pad_lo - t, co].
    # A conv with lhs padding p and rhs_dilation s computes
    #   out[r] = sum_i dy[r - p + s*i] x[i],  r - p = pad_lo - t
    # and with pad_lo = k-1-p this is r = k-1-t: the result arrives
    # spatially FLIPPED, so reverse each spatial axis at the end.
    dw = lax.conv_general_dilated(
        dy, x, (1,) * ndim, [(p, pad_hi)] * ndim,
        rhs_dilation=(stride,) * ndim,
        dimension_numbers=_grad_dims(ndim),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )  # (Co, *k_flipped, Ci)
    dw = dw[(slice(None),) + (slice(None, None, -1),) * ndim]
    dw = jnp.moveaxis(dw, 0, ndim + 1).astype(w.dtype)
    db = jnp.sum(
        dy.astype(jnp.promote_types(dy.dtype, jnp.float32)),
        axis=tuple(range(dy.ndim - 1)),
    )
    return dx, dw, db.astype(dy.dtype)


conv_transpose_smallc.defvjp(_convt_smallc_fwd, _convt_smallc_bwd)
