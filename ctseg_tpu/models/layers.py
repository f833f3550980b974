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

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == torch kaiming_uniform(a=sqrt(5)).
torch_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
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
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


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
            from ctseg_tpu.ops.pallas.instance_norm import (
                fused_instance_norm_prelu,
                fusion_supported,
            )

            if fusion_supported(x.shape):
                out = fused_instance_norm_prelu(
                    x.astype(jnp.float32), alpha.astype(jnp.float32)
                )
                return out.astype(x.dtype)
            # Infeasible tiling (large spatial x small channel count):
            # fall back to the unfused path below.
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

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_kernel_init, tuple(self.kernel_shape), self.param_dtype
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
                x = instance_norm(x)
                x = PReLU(param_dtype=self.param_dtype)(x)
        return x


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
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2
        p = _same_padding(self.kernel_size)
        pad_lo = self.kernel_size - 1 - p
        pad_hi = self.kernel_size - 1 - p + self.stride - 1
        fan_in = x.shape[-1] * self.kernel_size ** ndim
        x = nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size,) * ndim,
            strides=(self.stride,) * ndim,
            padding=[(pad_lo, pad_hi)] * ndim,
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
                x = instance_norm(x)
                x = PReLU(param_dtype=self.param_dtype)(x)
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
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2
        in_features = x.shape[-1]
        subunits = max(1, self.subunits)

        residual = x
        if self.stride != 1 or in_features != self.features:
            rkernel = self.kernel_size if self.stride != 1 else 1
            rpad = _same_padding(rkernel)
            fan_in = in_features * rkernel ** ndim
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
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"unit{su}",
            )(out)
        return residual + out
