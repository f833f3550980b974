"""N-dimensional residual UNet (architecture-equivalent to MONAI's UNet).

The reference re-exports MONAI's UNet (capstone/models/__init__.py:3) and
configures it at capstone/training/base_trainer.py:64-79 /
capstone/volumetric/base_trainer.py:58-72. This is a ground-up channel-last
flax implementation of that architecture:

  - 5-level encoder/decoder; encoder downsamples with strided convs, decoder
    upsamples with transposed convs (both kernel 3).
  - num_res_units = 0: plain Conv->IN->PReLU units.
  - num_res_units > 0: ResidualUnits with that many subunits on the encoder
    and bottom; decoder levels append a 1-subunit ResidualUnit after the
    transposed conv, with conv-only output at the top level.
  - Skip connections concatenate along the channel axis.

One code path serves 2D (N,H,W,C) and 3D (N,H,W,D,C) — depth is axis 3,
the convention _constrain_depth's PartitionSpecs rely on — where the
reference needed a separate volumetric twin stack (capstone/volumetric/).
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctseg_tpu.models.layers import (
    ConvTransposeUnit,
    ConvUnit,
    ResidualUnit,
    _torch_bias_init,
    torch_kernel_init,
)


class UNet(nn.Module):
    out_channels: int = 10
    channels: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    num_res_units: int = 0
    kernel_size: int = 3
    up_kernel_size: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Run InstanceNorm+PReLU as one Pallas kernel (TPU; checkpoint-compatible).
    fused_norm_act: bool = False
    # Run stride-1 3x3 conv+IN+PReLU units as one Pallas kernel where the
    # shape fits VMEM (TPU; checkpoint-compatible).
    fused_conv_block: bool = False
    # Decoder transposed convs as dense polyphase convs (models/layers.py::
    # polyphase_conv_transpose) instead of XLA's dilated-input lowering.
    # OFF by default — measured slower on v5e (see ConvTransposeUnit).
    polyphase_up: bool = False
    # Packed-polyphase FORWARD for every smallc-eligible decoder transposed
    # conv — min(Cin, Cout) <= 16, which is only up0 in the production
    # channel config but several levels in small-channel configs (backward
    # stays on the shallow_grad reformulations; checkpoint-compatible).
    # Site-measured fwd win at the 3D up0 site (perf/transp3d_v5e.json);
    # OFF by default — 0.996x on the compiled full 3D step
    # (perf/ab_packed_up_step_v5e.json).
    packed_up_fwd: bool = False
    # Strided shallow-Cin 3D convs (the stem family) as one lane-full 2D
    # conv over the (D, Cin)-folded input (layers.py::ConvUnit.packed_depth;
    # checkpoint-compatible). OFF by default — see the A/B verdict there.
    packed_depth: bool = False
    # When True, encoder/decoder activations are exposed through flax's
    # perturb mechanism ('perturbations' collection) so GradCAM can take
    # gradients w.r.t. them (ctseg_tpu/interpret/gradcam.py). No-op for
    # normal training/inference.
    capture_features: bool = False
    # GSPMD spatial partitioning of 3D volumes over the depth axis: when a
    # mesh with a `spatial_axis` axis is supplied, every level's activation
    # (N, H, W, D, C) is constrained to shard D over that axis while the
    # per-shard extent stays >= min_depth_per_shard and divisible, and to
    # replicate D below that (the deep levels are tiny; XLA's conv halo
    # exchange degenerates there — measured wrong GRADIENTS from the SPMD
    # partitioner when deep-level depth collapses under the shard count,
    # perf/probe_gspmd_depth.py — while explicit per-level constraints are
    # bit-exact). Batch stays sharded over `batch_axis` throughout.
    spatial_mesh: Optional[jax.sharding.Mesh] = None
    batch_axis: str = "data"
    spatial_axis: str = "space"
    min_depth_per_shard: int = 2

    def _constrain_depth(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pin the depth-axis sharding of a 3D activation (no-op otherwise)."""
        if self.spatial_mesh is None or x.ndim != 5:
            return x
        n = self.spatial_mesh.shape[self.spatial_axis]
        if n == 1:
            return x
        # Shard an axis only while its global extent divides (batch-1 traces
        # like model.init stay unsharded; deep levels drop the depth axis).
        n_b = self.spatial_mesh.shape[self.batch_axis]
        batch = self.batch_axis if x.shape[0] % n_b == 0 else None
        d = x.shape[3]
        space = (
            self.spatial_axis
            if d % n == 0 and d // n >= self.min_depth_per_shard
            else None
        )
        spec = P(batch, None, None, space)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.spatial_mesh, spec)
        )

    def _down(self, x: jnp.ndarray, features: int, stride: int, name: str):
        common = dict(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fused_norm_act=self.fused_norm_act,
            fused_conv_block=self.fused_conv_block,
            packed_depth=self.packed_depth,
            name=name,
        )
        if self.num_res_units > 0:
            return ResidualUnit(
                features=features,
                kernel_size=self.kernel_size,
                stride=stride,
                subunits=self.num_res_units,
                **common,
            )(x)
        return ConvUnit(
            features=features, kernel_size=self.kernel_size, stride=stride, **common
        )(x)

    def _up(self, x: jnp.ndarray, features: int, stride: int, is_top: bool, name: str):
        common = dict(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fused_norm_act=self.fused_norm_act,
        )
        x = ConvTransposeUnit(
            features=features,
            kernel_size=self.up_kernel_size,
            stride=stride,
            conv_only=is_top and self.num_res_units == 0,
            polyphase=self.polyphase_up,
            packed_fwd=self.packed_up_fwd,
            name=f"{name}_transp",
            **common,
        )(x)
        if self.num_res_units > 0:
            x = ResidualUnit(
                features=features,
                kernel_size=self.kernel_size,
                stride=1,
                subunits=1,
                last_conv_only=is_top,
                fused_conv_block=self.fused_conv_block,
                name=f"{name}_ru",
                **common,
            )(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert len(self.channels) == len(self.strides) + 1, (
            "need one more channel spec than strides"
        )
        depth = len(self.strides)

        # Encoder: strided downsampling blocks; keep skip tensors.
        skips = []
        for i in range(depth):
            x = self._down(x, self.channels[i], self.strides[i], name=f"down{i}")
            x = self._constrain_depth(x)
            if self.capture_features:
                x = self.perturb(f"feat_down{i}", x)
                self.sow("intermediates", f"feat_down{i}", x)
            skips.append(x)

        # Bottom block (stride 1).
        x = self._down(x, self.channels[depth], 1, name="bottom")
        x = self._constrain_depth(x)
        if self.capture_features:
            x = self.perturb("feat_bottom", x)
            self.sow("intermediates", "feat_bottom", x)

        # Decoder: concat skip, then upsample. Output channels per level
        # follow the MONAI recursion: level i emits channels[i-1]
        # (the top level emits out_channels).
        for i in reversed(range(depth)):
            x = jnp.concatenate([skips[i], x], axis=-1)
            is_top = i == 0
            features = self.out_channels if is_top else self.channels[i - 1]
            x = self._up(x, features, self.strides[i], is_top, name=f"up{i}")
            x = self._constrain_depth(x)
            if self.capture_features and not is_top:
                x = self.perturb(f"feat_up{i}", x)
                self.sow("intermediates", f"feat_up{i}", x)
        return x


class SegmentationModel(nn.Module):
    """UNet plus the optional 1x1 input-downsampling conv.

    The reference's BaseUNet2D owns a Conv2d(3->1, kernel 1) applied before
    the UNet when `downsample` is set (capstone/training/base_trainer.py:53,
    81-85); this wraps that composition as a single flax module.
    """

    out_channels: int = 10
    channels: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    num_res_units: int = 0
    downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    fused_norm_act: bool = False
    fused_conv_block: bool = False
    polyphase_up: bool = False
    packed_up_fwd: bool = False
    packed_depth: bool = False
    capture_features: bool = False
    # See UNet.spatial_mesh: GSPMD depth-axis partitioning for 3D volumes.
    spatial_mesh: Optional[jax.sharding.Mesh] = None
    batch_axis: str = "data"
    spatial_axis: str = "space"
    min_depth_per_shard: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.downsample:
            ndim = x.ndim - 2
            x = nn.Conv(
                features=1,
                kernel_size=(1,) * ndim,
                kernel_init=torch_kernel_init,
                bias_init=_torch_bias_init(x.shape[-1]),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv1x1",
            )(x)
        return UNet(
            out_channels=self.out_channels,
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fused_norm_act=self.fused_norm_act,
            fused_conv_block=self.fused_conv_block,
            polyphase_up=self.polyphase_up,
            packed_up_fwd=self.packed_up_fwd,
            packed_depth=self.packed_depth,
            capture_features=self.capture_features,
            spatial_mesh=self.spatial_mesh,
            batch_axis=self.batch_axis,
            spatial_axis=self.spatial_axis,
            min_depth_per_shard=self.min_depth_per_shard,
            name="unet",
        )(x)
