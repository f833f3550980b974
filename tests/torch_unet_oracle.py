"""Plain-torch replica of MONAI's UNet — the whole-model parity oracle.

The reference trains `monai.networks.nets.UNet` (capstone/models/__init__.py:3)
configured at capstone/training/base_trainer.py:64-79 and
capstone/volumetric/base_trainer.py:58-72. MONAI is not installable here, so
this file reconstructs the architecture from its published specification
(Kerfoot 2019 "Left-Ventricle Quantification Using Residual U-Net" + the MONAI
v0.3 API surface the reference relies on), with the SAME module tree and
state_dict key names:

  model.0                      down layer, level 0
  model.1.submodule.0          down layer, level 1
  model.1.submodule.1.submodule...
  model.(1.submodule.)*N       bottom layer
  model.(1.submodule.)*i.2     up layer, level i
  <ResidualUnit>.conv.unit{su}.conv / .act, <ResidualUnit>.residual
  <Convolution>.conv / .act    (InstanceNorm affine=False carries no params)

The key layout is load-bearing: ctseg_tpu/models/torch_import.py maps these
exact names onto the flax parameter tree, and the reference's interpretability
script addresses `model.unet.model[2][1].conv.unit0.conv`
(capstone/interpretability.py:85-103), which this structure reproduces.
"""

import torch
import torch.nn as nn


def _same_padding(k: int) -> int:
    return (k - 1) // 2


def _conv_nd(dims):
    return {2: nn.Conv2d, 3: nn.Conv3d}[dims]


def _conv_trans_nd(dims):
    return {2: nn.ConvTranspose2d, 3: nn.ConvTranspose3d}[dims]


def _norm_nd(dims):
    return {2: nn.InstanceNorm2d, 3: nn.InstanceNorm3d}[dims]


class Convolution(nn.Sequential):
    """MONAI `Convolution`: Conv -> InstanceNorm(affine=False) -> PReLU.

    Module names ("conv", "norm", "act") match MONAI so state_dict keys do.
    """

    def __init__(
        self,
        dims: int,
        in_channels: int,
        out_channels: int,
        strides: int = 1,
        kernel_size: int = 3,
        conv_only: bool = False,
        is_transposed: bool = False,
    ):
        super().__init__()
        p = _same_padding(kernel_size)
        if is_transposed:
            conv = _conv_trans_nd(dims)(
                in_channels,
                out_channels,
                kernel_size,
                stride=strides,
                padding=p,
                output_padding=strides - 1,
            )
        else:
            conv = _conv_nd(dims)(
                in_channels, out_channels, kernel_size, stride=strides, padding=p
            )
        self.add_module("conv", conv)
        if not conv_only:
            self.add_module("norm", _norm_nd(dims)(out_channels))
            self.add_module("act", nn.PReLU())


class ResidualUnit(nn.Module):
    """MONAI `ResidualUnit`: `subunits` Convolutions + projection shortcut.

    First subunit carries the stride and channel change; the shortcut is
    identity when shape-preserving, else a strided conv (kernel k) or a 1x1
    conv (channel change only). `last_conv_only` strips norm+act from the
    final subunit.
    """

    def __init__(
        self,
        dims: int,
        in_channels: int,
        out_channels: int,
        strides: int = 1,
        kernel_size: int = 3,
        subunits: int = 2,
        last_conv_only: bool = False,
    ):
        super().__init__()
        self.conv = nn.Sequential()
        self.residual = nn.Identity()
        subunits = max(1, subunits)

        schannels, sstrides = in_channels, strides
        for su in range(subunits):
            conv_only = last_conv_only and su == (subunits - 1)
            self.conv.add_module(
                f"unit{su}",
                Convolution(
                    dims, schannels, out_channels, sstrides, kernel_size,
                    conv_only=conv_only,
                ),
            )
            schannels, sstrides = out_channels, 1

        if strides != 1 or in_channels != out_channels:
            rkernel = kernel_size if strides != 1 else 1
            self.residual = _conv_nd(dims)(
                in_channels,
                out_channels,
                rkernel,
                stride=strides,
                padding=_same_padding(rkernel),
            )

    def forward(self, x):
        return self.residual(x) + self.conv(x)


class SkipConnection(nn.Module):
    """cat([x, submodule(x)], dim=1) — skip channels FIRST, like MONAI."""

    def __init__(self, submodule):
        super().__init__()
        self.submodule = submodule

    def forward(self, x):
        return torch.cat([x, self.submodule(x)], dim=1)


class MonaiUNetOracle(nn.Module):
    """MONAI UNet recursion, built exactly as configured by the reference."""

    def __init__(
        self,
        dims: int,
        in_channels: int,
        out_channels: int,
        channels,
        strides,
        num_res_units: int = 0,
        kernel_size: int = 3,
        up_kernel_size: int = 3,
    ):
        super().__init__()
        assert len(channels) == len(strides) + 1
        self.dims = dims
        self.num_res_units = num_res_units
        self.kernel_size = kernel_size
        self.up_kernel_size = up_kernel_size

        def _create_block(inc, outc, chans, strds, is_top):
            c, s = chans[0], strds[0]
            if len(chans) > 2:
                subblock = _create_block(c, c, chans[1:], strds[1:], False)
                upc = c * 2
            else:
                subblock = self._get_bottom_layer(c, chans[1])
                upc = c + chans[1]
            down = self._get_down_layer(inc, c, s, is_top)
            up = self._get_up_layer(upc, outc, s, is_top)
            return nn.Sequential(down, SkipConnection(subblock), up)

        self.model = _create_block(
            in_channels, out_channels, list(channels), list(strides), True
        )

    def _get_down_layer(self, inc, outc, strides, is_top):
        if self.num_res_units > 0:
            return ResidualUnit(
                self.dims, inc, outc, strides, self.kernel_size,
                subunits=self.num_res_units,
            )
        return Convolution(self.dims, inc, outc, strides, self.kernel_size)

    def _get_bottom_layer(self, inc, outc):
        return self._get_down_layer(inc, outc, 1, False)

    def _get_up_layer(self, inc, outc, strides, is_top):
        conv = Convolution(
            self.dims, inc, outc, strides, self.up_kernel_size,
            conv_only=is_top and self.num_res_units == 0,
            is_transposed=True,
        )
        if self.num_res_units > 0:
            ru = ResidualUnit(
                self.dims, outc, outc, 1, self.kernel_size, subunits=1,
                last_conv_only=is_top,
            )
            return nn.Sequential(conv, ru)
        return conv

    def forward(self, x):
        return self.model(x)


class ReferenceModelOracle(nn.Module):
    """BaseUNet2D's forward: optional conv1x1 3->1 downsample, then UNet
    (capstone/training/base_trainer.py:53-58, 81-85). State_dict keys carry
    the Lightning attribute prefixes `conv1x1.` / `unet.` of the released
    checkpoints (the conv1x1 exists even when unused, as in the reference)."""

    def __init__(self, dims, in_channels, out_channels, channels, strides,
                 num_res_units=0, downsample=False):
        super().__init__()
        self.downsample = downsample
        self.conv1x1 = _conv_nd(dims)(in_channels, 1, 1, stride=1)
        self.unet = MonaiUNetOracle(
            dims,
            1 if downsample else in_channels,
            out_channels,
            channels,
            strides,
            num_res_units=num_res_units,
        )

    def forward(self, x):
        if self.downsample:
            x = self.conv1x1(x)
        return self.unet(x)
