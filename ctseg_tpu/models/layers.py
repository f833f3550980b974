"""Building blocks of the UNet: ConvUnit, ResidualUnit, InstanceNorm, PReLU.

Architecture contract is MONAI's `Convolution` / `ResidualUnit` as configured
by the reference (capstone/training/base_trainer.py:72-79 uses MONAI UNet with
act=PReLU, norm=Instance): Conv -> InstanceNorm(affine=False, eps=1e-5) ->
PReLU(single shared parameter, init 0.25). Implemented channel-last
(NHWC/NDHWC) for TPU, with explicit torch-compatible padding so the numerics
are verifiable against torch in tests (tests/test_torch_parity.py).

Initialization follows torch's Conv default (kaiming-uniform with a=sqrt(5),
i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so training
dynamics match the reference.
"""

import itertools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == torch kaiming_uniform(a=sqrt(5)).
torch_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)
# Transposed convs: torch computes the kaiming fan from weight.size(1),
# which for a ConvTranspose weight (in, out, *k) is OUT_channels — so the
# bound is 1/sqrt(out * k^ndim), not 1/sqrt(in * k^ndim) (verified against
# torch.nn.init._calculate_fan_in_and_fan_out on ConvTranspose2d). For the
# flax kernel layout (*k, in, out), variance_scaling's "fan_out" is exactly
# out * k^ndim.
torch_convT_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_out", distribution="uniform"
)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) normalization over spatial dims, no affine.

    Matches torch InstanceNormNd defaults (affine=False, eps=1e-5, biased
    variance). x: (N, *spatial, C). Statistics are always accumulated in
    float32 — bf16 spatial means collapse small-batch stats (SURVEY.md §7)
    — and the result is cast back to the input dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    axes = tuple(range(1, x.ndim - 1))
    # One-pass statistics (E[x], E[x^2] in a single read of the activation)
    # instead of mean-then-centered-variance: the stat reductions are ~18%
    # of the train step (HBM-bound), and the two-pass form costs a second
    # full read. var = E[x^2] - E[x]^2 is exact in exact arithmetic; in
    # float32/float64 stats the difference is below every parity tolerance
    # (post-conv activations are near zero-mean, so cancellation is mild).
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


@jax.custom_vjp
def instance_norm_prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm (no affine, eps 1e-5) + shared-slope PReLU, one unit.

    Identical math to instance_norm followed by PReLU, with a custom VJP:
    one-pass f32 statistics in the forward, and an analytic backward whose
    large residual is the NORMALIZED activation xhat (stored in x's dtype)
    rather than x itself — the backward never re-reads or re-normalizes x.

    xhat (not the output y) is the residual deliberately: reconstructing
    xhat from y via the PReLU inverse (y/alpha on the negative branch) is
    only valid for alpha > 0, and nothing constrains the learned slope —
    a negative or zero alpha would silently corrupt dx/dalpha. Storing
    xhat keeps the gradient exact for every alpha (differential-tested at
    alpha in {0.25, 0.8, 0.03, -0.1, 0.0}).
    """
    out, _ = _in_prelu_fwd(x, alpha)
    return out


def _in_prelu_fwd(x, alpha):
    eps = 1e-5
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(mean_sq - jnp.square(mean), 0.0) + eps)
    xhat = (x32 - mean) * rstd
    a = alpha.reshape(()).astype(xhat.dtype)
    y = jnp.where(xhat >= 0, xhat, a * xhat).astype(x.dtype)
    return y, (xhat.astype(x.dtype), rstd, alpha)


def _in_prelu_bwd(res, dy):
    xhat_s, rstd, alpha = res
    in_dtype = xhat_s.dtype  # stored in x's dtype in the forward
    axes = tuple(range(1, xhat_s.ndim - 1))
    ctype = jnp.promote_types(in_dtype, jnp.float32)  # f32 stats under bf16
    a = alpha.reshape(()).astype(ctype)
    xhat = xhat_s.astype(ctype)
    dy32 = dy.astype(ctype)
    pos = xhat >= 0
    dxhat = jnp.where(pos, dy32, a * dy32)
    dalpha = jnp.sum(jnp.where(pos, 0.0, dy32 * xhat))
    # d instance_norm: dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat*xhat))
    m1 = jnp.mean(dxhat, axis=axes, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=axes, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(in_dtype)
    return dx, dalpha.reshape(alpha.shape).astype(alpha.dtype)


instance_norm_prelu.defvjp(_in_prelu_fwd, _in_prelu_bwd)


class PReLU(nn.Module):
    """PReLU with a single shared learnable slope (torch nn.PReLU default).

    With `fused_instance_norm=True` the preceding InstanceNorm and this
    activation run as one Pallas kernel (fwd + custom-VJP bwd); the param
    tree is identical either way, so checkpoints are interchangeable.
    """

    init_value: float = 0.25
    param_dtype: Any = jnp.float32
    fused_instance_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda key, shape, dtype: jnp.full(shape, self.init_value, dtype),
            (1,),
            self.param_dtype,
        )
        if self.fused_instance_norm:
            if jax.default_backend() == "tpu":
                from ctseg_tpu.ops.pallas.instance_norm import (
                    fused_instance_norm_prelu,
                    fusion_supported,
                )

                if fusion_supported(x.shape):
                    # bf16 stays bf16 end-to-end; the kernel keeps stats in
                    # f32 internally (ops/pallas/instance_norm.py).
                    return fused_instance_norm_prelu(x, alpha)
            # Off-TPU or infeasible tiling: the norm must still run — this
            # module owns BOTH ops when fused_instance_norm is set.
            x = instance_norm(x)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _same_padding(kernel_size: int) -> int:
    return (kernel_size - 1) // 2


class _ConvParams(nn.Module):
    """Declares exactly nn.Conv's parameter tree (kernel, bias) without
    running the convolution — used by the fused conv+IN+PReLU path so fused
    and unfused checkpoints are interchangeable."""

    kernel_shape: Any
    fan_in: int
    param_dtype: Any = jnp.float32
    kernel_init: Any = torch_kernel_init

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, tuple(self.kernel_shape), self.param_dtype
        )
        bias = self.param(
            "bias",
            _torch_bias_init(self.fan_in),
            (self.kernel_shape[-1],),
            self.param_dtype,
        )
        return kernel, bias


class _PReLUParam(nn.Module):
    """Declares exactly PReLU's parameter ("alpha", init 0.25)."""

    init_value: float = 0.25
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param(
            "alpha",
            lambda key, shape, dtype: jnp.full(shape, self.init_value, dtype),
            (1,),
            self.param_dtype,
        )


class ConvUnit(nn.Module):
    """Conv -> InstanceNorm -> PReLU (or conv only).

    Strided convs use torch-style symmetric padding (k-1)//2 so downsampling
    tap alignment matches the reference exactly.

    `fused_conv_block`: stride-1 3x3 2D units run conv+IN+PReLU as a single
    Pallas kernel (ops/pallas/conv_block.py) when the shape fits VMEM; the
    parameter tree is identical either way, so checkpoints are
    interchangeable and infeasible shapes silently use the XLA chain.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    conv_only: bool = False
    fused_norm_act: bool = False
    fused_conv_block: bool = False
    # Strided shallow-Cin 3D convs (the stem family) as ONE lane-full 2D
    # conv over the (D, Cin)-folded input (ops/shallow_grad.py::
    # conv_packed_depth). Measured 1.7x fwd+bwd ISOLATED at the bench stem
    # (perf/stem_packed_v5e.json) but 0.986x on the compiled FULL 3D train
    # step (perf/ab_stem_packed_step_v5e.json) — XLA already hides the
    # stem behind the deep levels, and the folded kernel's gather breaks
    # that overlap. Rejected per CLAUDE.md rule 3; kept off by default as
    # a tested, exact-math alternative.
    packed_depth: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2  # spatial rank
        pad = _same_padding(self.kernel_size)
        fan_in = x.shape[-1] * self.kernel_size ** ndim

        if self.fused_conv_block and not self.conv_only:
            from ctseg_tpu.ops.pallas.conv_block import (
                conv_fusion_supported,
                default_interpret,
                fused_conv3x3_in_prelu,
            )

            # Cast to the unit's compute dtype FIRST (the nn.Conv branch
            # does this internally): feasibility and kernels must match
            # between train (pre-cast bf16) and eval (f32 inputs) paths.
            x = x.astype(self.dtype)
            if conv_fusion_supported(
                x.shape, self.features, x.dtype,
                stride=self.stride, kernel_size=self.kernel_size,
            ):
                kernel, bias = _ConvParams(
                    kernel_shape=(self.kernel_size,) * ndim
                    + (x.shape[-1], self.features),
                    fan_in=fan_in,
                    param_dtype=self.param_dtype,
                    name="Conv_0",
                )()
                alpha = _PReLUParam(
                    param_dtype=self.param_dtype, name="PReLU_0"
                )()
                return fused_conv3x3_in_prelu(
                    x, kernel, bias, alpha, default_interpret()
                )

        from ctseg_tpu.ops.shallow_grad import (
            conv_packed_depth,
            conv_smallc,
            packed_depth_supported,
            smallc_supported,
        )

        if self.packed_depth and packed_depth_supported(
            x.shape[-1], self.features, self.stride, self.kernel_size,
            ndim=ndim, depth=x.shape[-2] if ndim == 3 else 0,
        ):
            kernel, bias = _ConvParams(
                kernel_shape=(self.kernel_size,) * ndim
                + (x.shape[-1], self.features),
                fan_in=fan_in,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )()
            x = conv_packed_depth(
                x.astype(self.dtype), kernel, bias, self.stride
            )
        elif smallc_supported(
            x.shape[-1], self.features, self.stride, self.kernel_size,
            ndim=ndim, depth=x.shape[-2] if ndim == 3 else None,
        ):
            # Shallow-channel conv (the decoder's out_channels=10 sites):
            # identical forward, but the weight gradient uses the
            # batch-as-contracted-feature formulation — XLA's native dW
            # runs at ~6% of HBM bandwidth there because C=10 fills 10/128
            # lanes (ops/shallow_grad.py, perf/probe_convgrad_shallow.py).
            # Params are declared under nn.Conv's name so the tree (and
            # every checkpoint) is unchanged.
            kernel, bias = _ConvParams(
                kernel_shape=(self.kernel_size,) * ndim
                + (x.shape[-1], self.features),
                fan_in=fan_in,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )()
            x = conv_smallc(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                bias.astype(self.dtype),
                self.stride,
                pad,
            )
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size,) * ndim,
                strides=(self.stride,) * ndim,
                padding=[(pad, pad)] * ndim,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(fan_in),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        if not self.conv_only:
            if self.fused_norm_act:
                x = PReLU(
                    param_dtype=self.param_dtype, fused_instance_norm=True
                )(x)
            else:
                alpha = _PReLUParam(
                    param_dtype=self.param_dtype, name="PReLU_0"
                )()
                x = instance_norm_prelu(x, alpha)
        return x


def _polyphase_taps(kernel_size: int, stride: int):
    """Per-output-phase tap decomposition of a stride-s transposed conv.

    With the unit's padding convention (pad_lo = k-1-p, p = (k-1)//2,
    output_padding = s-1, i.e. out = in * s), output index s*m + r draws
    from input taps  out[s*m+r] += x[m+q] * w[t]  exactly for the (q, t)
    pairs with (r + t - pad_lo) % s == 0, q = (r + t - pad_lo) // s.
    As t steps by s, q steps by 1, so each phase's taps are contiguous in q.

    Returns, per phase r: (pad_lo_r, pad_hi_r, t_indices) such that a plain
    stride-1 cross-correlation of x (padded (pad_lo_r, pad_hi_r)) with
    w[t_indices] yields that phase's length-H output.
    """
    p = (kernel_size - 1) // 2
    pad_lo = kernel_size - 1 - p
    phases = []
    for r in range(stride):
        taps = sorted(
            ((r + t - pad_lo) // stride, t)
            for t in range(kernel_size)
            if (r + t - pad_lo) % stride == 0
        )
        if not taps:  # k < s: this phase receives no input taps (zeros)
            phases.append((0, 0, ()))
            continue
        q_min = taps[0][0]
        # pl may be negative (crop) — lax conv padding supports that; an
        # out-of-range high tap just reads the zero high padding.
        pl = -q_min
        pr = len(taps) - 1 - pl
        phases.append((pl, pr, tuple(t for _, t in taps)))
    return phases


_CONV_DIMS = {1: ("NWC", "WIO", "NWC"), 2: ("NHWC", "HWIO", "NHWC"),
              3: ("NDHWC", "DHWIO", "NDHWC")}


def polyphase_conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    dtype: Any,
    mode: str = "phases",
) -> jnp.ndarray:
    """Stride-s transposed conv as s^ndim dense stride-1 convs + interleave.

    mode "phases": one conv per output phase with exactly that phase's taps
    (k^ndim total MACs, no zeros). mode "packed": ONE conv producing
    s^ndim * Cout channels from a zero-padded (Kp)^ndim kernel grid +
    depth-to-space ((Kp*s/k)^ndim MAC overhead, single pass).

    Numerically equal (same taps, same products) to
    nn.ConvTranspose(kernel_size=k, strides=s, padding=[(k-1-p, k-p+s-2)])
    — the torch ConvTranspose(k, s, padding=p, output_padding=s-1)
    convention with out = in * s — but with no input dilation: the per-phase
    subkernels are fully dense with the exact original MAC count
    (sum of per-phase tap counts over all phases == k^ndim).

    Measured verdict (perf/probe_transp.py, v5e bf16 fwd+bwd at every
    Model L up site): XLA's dilated lowering wins or ties BOTH modes —
    those sites are HBM-bound, so the dilated form's zero MACs are free
    while the interleave here costs an extra full-output pass. Kept as a
    checkpoint-compatible option for MAC-bound configurations; OFF by
    default (ConvTransposeUnit.polyphase).

    kernel: (*k, Cin, Cout) in nn.ConvTranspose layout (no spatial flip).
    """
    ndim = x.ndim - 2
    s = stride
    cout = kernel.shape[-1]
    # out = in * s only holds for odd k under this padding convention
    # (out = s*in + k-1-2p); the unit falls back to nn.ConvTranspose
    # for even kernel sizes.
    assert kernel.shape[0] % 2 == 1, "polyphase path requires odd kernel size"
    phases = _polyphase_taps(kernel.shape[0], s)
    dims = jax.lax.conv_dimension_numbers(
        x.shape, (1,) * ndim + kernel.shape[-2:], _CONV_DIMS[ndim]
    )

    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if mode == "packed":
        return _packed_conv_transpose(x, kernel, bias, s, dtype, phases)
    outs = []
    for rvec in itertools.product(range(s), repeat=ndim):
        if any(not phases[r][2] for r in rvec):  # k < s: tap-free phase
            outs.append(
                jnp.zeros((x.shape[0],) + x.shape[1:-1] + (cout,), dtype)
            )
            continue
        sub = kernel
        pads = []
        for axis, r in enumerate(rvec):
            pl, pr, t_idx = phases[r]
            sub = jnp.take(sub, jnp.asarray(t_idx), axis=axis)
            pads.append((pl, pr))
        outs.append(
            jax.lax.conv_general_dilated(
                x, sub, window_strides=(1,) * ndim, padding=pads,
                dimension_numbers=dims,
            )
        )

    # Interleave: out[n, s*m1+r1, ..., c] = phase_(r1..rn)[n, m1, ..., c].
    n = x.shape[0]
    spatial = x.shape[1:-1]
    y = jnp.stack(outs, axis=-2)  # (N, *S, P, Cout), P in (r1..rn) order
    y = y.reshape((n,) + spatial + (s,) * ndim + (cout,))
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]
    perm.append(1 + 2 * ndim)
    y = y.transpose(perm).reshape(
        (n,) + tuple(s * d for d in spatial) + (cout,)
    )
    return y + bias.astype(dtype)


def _packed_conv_transpose(x, kernel, bias, s, dtype, phases):
    """One dense conv to (..., s^ndim * Cout) + depth-to-space interleave.

    The packed kernel embeds every phase's taps on a shared (Kp,)*ndim grid
    (zeros where a phase has no tap at that offset), so a single stride-1
    conv computes all phases at once; channel layout is (r1..rn, co)-major
    to match the interleave reshape.
    """
    ndim = x.ndim - 2
    k = kernel.shape[0]
    cin, cout = kernel.shape[-2:]
    n = x.shape[0]
    spatial = x.shape[1:-1]

    # Global q grid shared by every phase, straight from the tap equation.
    pad_lo = k - 1 - (k - 1) // 2
    qs = [
        (r + t - pad_lo) // s
        for r in range(s)
        for t in range(k)
        if (r + t - pad_lo) % s == 0
    ]
    q_min, q_max = min(qs), max(qs)
    kp = q_max - q_min + 1

    # K[d1..dn, ci, r1..rn, co], zero where a phase lacks a tap at d.
    packed = jnp.zeros((kp,) * ndim + (cin,) + (s,) * ndim + (cout,), dtype)
    for rvec in itertools.product(range(s), repeat=ndim):
        if any(not phases[r][2] for r in rvec):
            continue  # tap-free phase stays zero
        sub = kernel
        dvec = []
        for axis, r in enumerate(rvec):
            taps = sorted(
                ((r + t - pad_lo) // s, t)
                for t in range(k)
                if (r + t - pad_lo) % s == 0
            )
            sub = jnp.take(sub, jnp.asarray([t for _, t in taps]), axis=axis)
            dvec.append([q - q_min for q, _ in taps])
        slot = (
            jnp.ix_(*[jnp.asarray(d) for d in dvec])
            + (slice(None),)
            + tuple(slice(r, r + 1) for r in rvec)
            + (slice(None),)
        )
        packed = packed.at[slot].set(
            sub.reshape(sub.shape[:-1] + (1,) * ndim + (cout,))
        )

    dims = jax.lax.conv_dimension_numbers(
        x.shape, (1,) * ndim + (cin, s**ndim * cout), _CONV_DIMS[ndim]
    )
    y = jax.lax.conv_general_dilated(
        x,
        packed.reshape((kp,) * ndim + (cin, s**ndim * cout)),
        window_strides=(1,) * ndim,
        padding=[(-q_min, kp - 1 + q_min)] * ndim,
        dimension_numbers=dims,
    )
    y = y.reshape((n,) + spatial + (s,) * ndim + (cout,))
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]
    perm.append(1 + 2 * ndim)
    y = y.transpose(perm).reshape((n,) + tuple(s * d for d in spatial) + (cout,))
    return y + bias.astype(dtype)


class ConvTransposeUnit(nn.Module):
    """Transposed conv (exactly doubles spatial dims at stride 2) -> IN -> PReLU.

    Padding mirrors torch ConvTranspose(k, s, padding=(k-1)//2,
    output_padding=s-1): on the stride-dilated input that is
    (k-1-p, k-1-p+s-1), giving out = in * s.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    conv_only: bool = False
    fused_norm_act: bool = False
    # Compute the transposed conv as dense per-phase stride-1 convs
    # (polyphase / subpixel decomposition) instead of XLA's dilated-input
    # lowering. Same taps and products — the parameter tree is identical
    # and checkpoints are interchangeable. Default OFF: measured on v5e
    # (perf/probe_transp.py, bf16 fwd+bwd at every Model L up site), the
    # dilated XLA lowering wins or ties both decompositions — these sites
    # are HBM-bound, so eliminating the zero MACs buys nothing and the
    # extra interleave pass costs a full output round-trip.
    polyphase: bool = False
    # Packed-polyphase FORWARD on the lane-starved smallc path (backward
    # stays on ops/shallow_grad.py's reformulated rules). Orthogonal to
    # `polyphase` above, which differentiates THROUGH the decomposition.
    # Site-measured win at the 3D up0 transposed conv (fwd 9.4 vs 12.4 ms,
    # perf/transp3d_v5e.json) but 0.996x on the compiled full 3D step
    # (perf/ab_packed_up_step_v5e.json) — OFF by default (CLAUDE.md rule 3).
    packed_fwd: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2
        p = _same_padding(self.kernel_size)
        pad_lo = self.kernel_size - 1 - p
        pad_hi = self.kernel_size - 1 - p + self.stride - 1
        # torch's kaiming fan for a ConvTranspose weight (in, out, *k) reads
        # weight.size(1) = OUT channels, so both the kernel bound and the bias
        # bound use out * k^ndim here (see torch_convT_kernel_init above).
        fan = self.features * self.kernel_size ** ndim
        from ctseg_tpu.ops.shallow_grad import (
            conv_transpose_smallc,
            smallc_supported,
        )

        if self.polyphase and self.stride > 1 and self.kernel_size % 2 == 1:
            kernel, bias = _ConvParams(
                kernel_shape=(self.kernel_size,) * ndim
                + (x.shape[-1], self.features),
                fan_in=fan,
                param_dtype=self.param_dtype,
                kernel_init=torch_convT_kernel_init,
                name="ConvTranspose_0",
            )()
            x = polyphase_conv_transpose(
                x, kernel, bias, self.stride, self.dtype
            )
        elif smallc_supported(
            x.shape[-1], self.features, self.stride, self.kernel_size,
            transpose=True, ndim=ndim,
        ):
            # Top decoder level (features == out_channels == 10): same
            # forward as nn.ConvTranspose, lane-efficient weight gradient
            # (ops/shallow_grad.py). Params under nn.ConvTranspose's name —
            # tree and checkpoints unchanged.
            kernel, bias = _ConvParams(
                kernel_shape=(self.kernel_size,) * ndim
                + (x.shape[-1], self.features),
                fan_in=fan,
                param_dtype=self.param_dtype,
                kernel_init=torch_convT_kernel_init,
                name="ConvTranspose_0",
            )()
            x = conv_transpose_smallc(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                bias.astype(self.dtype),
                self.stride,
                self.kernel_size,
                "packed" if self.packed_fwd else "native",
            )
        else:
            x = nn.ConvTranspose(
                features=self.features,
                kernel_size=(self.kernel_size,) * ndim,
                strides=(self.stride,) * ndim,
                padding=[(pad_lo, pad_hi)] * ndim,
                kernel_init=torch_convT_kernel_init,
                bias_init=_torch_bias_init(fan),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        if not self.conv_only:
            if self.fused_norm_act:
                x = PReLU(
                    param_dtype=self.param_dtype, fused_instance_norm=True
                )(x)
            else:
                alpha = _PReLUParam(
                    param_dtype=self.param_dtype, name="PReLU_0"
                )()
                x = instance_norm_prelu(x, alpha)
        return x


class ResidualUnit(nn.Module):
    """Residual block of `subunits` ConvUnits plus a projection shortcut.

    MONAI ResidualUnit semantics: the first subunit carries the stride and the
    channel change; the shortcut is identity when shape-preserving, otherwise
    a conv with kernel `kernel_size` when strided or 1 when only the channel
    count changes. `last_conv_only` drops norm+act from the final subunit.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    subunits: int = 2
    last_conv_only: bool = False
    fused_norm_act: bool = False
    fused_conv_block: bool = False
    packed_depth: bool = False  # see ConvUnit.packed_depth (rejected by A/B)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ctseg_tpu.ops.shallow_grad import (
            conv_packed_depth,
            packed_depth_supported,
        )

        ndim = x.ndim - 2
        in_features = x.shape[-1]
        subunits = max(1, self.subunits)

        residual = x
        if self.stride != 1 or in_features != self.features:
            rkernel = self.kernel_size if self.stride != 1 else 1
            rpad = _same_padding(rkernel)
            fan_in = in_features * rkernel ** ndim
            if self.packed_depth and packed_depth_supported(
                in_features, self.features, self.stride, rkernel,
                ndim=ndim, depth=x.shape[-2] if ndim == 3 else 0,
            ):
                # The strided shortcut shares the stem's lane-starved shape
                # (Cin=1 full-res); same packed depth-fold, params under
                # nn.Conv's "shortcut" name so checkpoints are unchanged.
                kernel, bias = _ConvParams(
                    kernel_shape=(rkernel,) * ndim
                    + (in_features, self.features),
                    fan_in=fan_in,
                    param_dtype=self.param_dtype,
                    name="shortcut",
                )()
                residual = conv_packed_depth(
                    x.astype(self.dtype), kernel, bias, self.stride
                )
            else:
                residual = nn.Conv(
                    features=self.features,
                    kernel_size=(rkernel,) * ndim,
                    strides=(self.stride,) * ndim,
                    padding=[(rpad, rpad)] * ndim,
                    kernel_init=torch_kernel_init,
                    bias_init=_torch_bias_init(fan_in),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="shortcut",
                )(x)

        out = x
        for su in range(subunits):
            out = ConvUnit(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride if su == 0 else 1,
                conv_only=self.last_conv_only and su == subunits - 1,
                fused_norm_act=self.fused_norm_act,
                fused_conv_block=self.fused_conv_block,
                packed_depth=self.packed_depth,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"unit{su}",
            )(out)
        return residual + out
