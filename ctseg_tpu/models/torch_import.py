"""Torch/MONAI checkpoint -> flax params importer.

The reference publishes its trained Model L / Model M as PyTorch-Lightning
checkpoints downloadable by URL (capstone/paths.py:46-49, loaded at
capstone/interpretability.py:28-31). This module converts those checkpoints
(or any MONAI-UNet state_dict with the reference's configuration) into this
framework's flax parameter tree, so real-data Dice parity can be validated
against the released weights without retraining.

Key schema: MONAI UNet's recursive Sequential layout —
  model.0 / model.1.submodule... / model.(1.submodule)*i.2
  <ResidualUnit>.conv.unit{su}.conv|.act, <ResidualUnit>.residual
  <Convolution>.conv|.act
(see tests/torch_unet_oracle.py, which reproduces the layout and differential-
tests this importer end-to-end). InstanceNorm is affine=False, so it carries
no parameters in either framework. Both MONAI<=0.3 (".act.") and newer ADN
(".adn.A.") activation key spellings are accepted.

Weight layout conversions (inverse of tests/test_torch_parity.py):
  conv:   torch (out, in, *k)  -> flax (*k, in, out)
  convT:  torch (in, out, *k)  -> flax (*k, in, out) with spatial axes flipped
          (torch cross-correlates the flipped kernel on the dilated input
          relative to lax.conv_transpose)
  PReLU:  torch weight (1,)    -> flax alpha (1,)
"""

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "monai_key_map",
    "import_monai_state_dict",
    "load_reference_checkpoint",
]

FlaxPath = Tuple[str, ...]


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    # (out, in, *k) -> (*k, in, out)
    return np.moveaxis(w, (0, 1), (-1, -2))


def _convT_to_flax(w: np.ndarray) -> np.ndarray:
    # (in, out, *k) -> (*k, in, out), spatial axes flipped.
    w = np.moveaxis(w, (0, 1), (-2, -1))
    flip_axes = tuple(range(w.ndim - 2))
    return w[tuple(slice(None, None, -1) for _ in flip_axes)]


def monai_key_map(
    in_channels: int,
    channels: Tuple[int, ...],
    strides: Tuple[int, ...] = (2, 2, 2, 2),
    num_res_units: int = 0,
    downsample: bool = False,
) -> List[Tuple[FlaxPath, str, str]]:
    """Enumerate (flax_path, torch_prefix, kind) for every parameterized
    module of the reference model (kind in {"conv", "convT", "prelu"}).

    flax paths are relative to the SegmentationModel params root
    (ctseg_tpu/models/unet.py); torch prefixes are relative to BaseUNet2D
    (so `conv1x1.*` and `unet.model.*`, matching the released checkpoints).
    """
    depth = len(strides)
    assert len(channels) == depth + 1
    entries: List[Tuple[FlaxPath, str, str]] = []

    def conv_unit(fpath: FlaxPath, tprefix: str, conv_only: bool, transposed=False):
        conv_name = "ConvTranspose_0" if transposed else "Conv_0"
        kind = "convT" if transposed else "conv"
        entries.append((fpath + (conv_name,), f"{tprefix}.conv", kind))
        if not conv_only:
            entries.append((fpath + ("PReLU_0",), f"{tprefix}.act", "prelu"))

    def residual_unit(
        fpath: FlaxPath, tprefix: str, inc: int, outc: int, stride: int,
        subunits: int, last_conv_only: bool,
    ):
        subunits = max(1, subunits)
        for su in range(subunits):
            conv_unit(
                fpath + (f"unit{su}",),
                f"{tprefix}.conv.unit{su}",
                last_conv_only and su == subunits - 1,
            )
        if stride != 1 or inc != outc:
            entries.append((fpath + ("shortcut",), f"{tprefix}.residual", "conv"))

    def down_layer(fpath, tprefix, inc, outc, stride):
        if num_res_units > 0:
            residual_unit(fpath, tprefix, inc, outc, stride, num_res_units, False)
        else:
            conv_unit(fpath, tprefix, conv_only=False)

    if downsample:
        entries.append((("conv1x1",), "conv1x1", "conv"))
        in_channels = 1

    unet = ("unet",)
    inc = in_channels
    for i in range(depth):
        bp = "unet.model" + ".1.submodule" * i
        down_layer(unet + (f"down{i}",), f"{bp}.0", inc, channels[i], strides[i])
        inc = channels[i]
    bottom_prefix = "unet.model" + ".1.submodule" * depth
    down_layer(unet + ("bottom",), bottom_prefix, channels[depth - 1], channels[depth], 1)

    for i in range(depth):
        bp = "unet.model" + ".1.submodule" * i
        is_top = i == 0
        if num_res_units > 0:
            conv_unit(
                unet + (f"up{i}_transp",), f"{bp}.2.0", conv_only=False,
                transposed=True,
            )
            # stride 1 and in==out: the decoder ResidualUnit never has a
            # shortcut conv, so the channel arguments only need to be equal.
            residual_unit(unet + (f"up{i}_ru",), f"{bp}.2.1", 0, 0, 1, 1, is_top)
        else:
            conv_unit(
                unet + (f"up{i}_transp",), f"{bp}.2", conv_only=is_top,
                transposed=True,
            )
    return entries


def _normalize_key(k: str) -> str:
    """Map newer-MONAI ADN spellings onto the v0.3 names this schema uses."""
    return k.replace(".adn.A.", ".act.")


def import_monai_state_dict(
    state_dict: Dict[str, Any],
    in_channels: int,
    channels: Tuple[int, ...],
    strides: Tuple[int, ...] = (2, 2, 2, 2),
    num_res_units: int = 0,
    downsample: bool = False,
    dtype=jnp.float32,
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a reference/MONAI state_dict into SegmentationModel params.

    Returns {"params": {...}} ready for `SegmentationModel.apply`. With
    `strict`, every expected key must be present and every parameterized
    torch key must be consumed (norm buffers are ignored; InstanceNorm here
    has none anyway).
    """
    sd = {_normalize_key(k): _to_numpy(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    def insert(path: FlaxPath, leaf: str, value: np.ndarray):
        node = params
        for name in path:
            node = node.setdefault(name, {})
        node[leaf] = jnp.asarray(value, dtype)

    consumed = set()
    for fpath, tprefix, kind in monai_key_map(
        in_channels, tuple(channels), tuple(strides), num_res_units, downsample
    ):
        if kind == "prelu":
            key = f"{tprefix}.weight"
            if key not in sd:
                if strict:
                    raise KeyError(f"missing checkpoint key: {key}")
                continue
            insert(fpath, "alpha", sd[key])
            consumed.add(key)
            continue
        wkey, bkey = f"{tprefix}.weight", f"{tprefix}.bias"
        if wkey not in sd:
            if strict:
                raise KeyError(f"missing checkpoint key: {wkey}")
            continue
        w = sd[wkey]
        insert(fpath, "kernel", _convT_to_flax(w) if kind == "convT" else _conv_to_flax(w))
        consumed.add(wkey)
        if bkey in sd:
            insert(fpath, "bias", sd[bkey])
            consumed.add(bkey)

    if strict:
        # conv1x1 exists in every reference checkpoint even when unused
        # (base_trainer.py:53); tolerate it being present-but-unmapped.
        leftovers = {
            k for k in sd
            if k not in consumed
            and not k.startswith("loss_func.")
            and k.split(".")[-1] in ("weight", "bias")
            and not (not downsample and k.startswith("conv1x1."))
        }
        if leftovers:
            raise KeyError(f"unconsumed checkpoint keys: {sorted(leftovers)[:8]}")
    return {"params": params}


def load_reference_checkpoint(
    path: str, dtype=jnp.float32
) -> Tuple[Any, Dict[str, Any]]:
    """Load a reference Lightning .ckpt -> (TrainConfig, flax params).

    Rebuilds the training configuration from the checkpoint's embedded
    hyperparameters (the reference's save_hyperparameters contract,
    capstone/training/base_trainer.py:43-52); num_res_units is recovered from
    the state_dict itself (`unit1` keys => 2 subunits) because the mixup
    trainer hardcodes 1 while sharing the same `use_res_units` hparam
    (capstone/training/mixup_trainer.py:26-42).
    """
    import torch

    from ctseg_tpu.training.trainer import TrainConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = dict(ckpt.get("hyper_parameters", ckpt.get("hparams", {})))
    sd = ckpt["state_dict"]

    if any(".conv.unit1." in k for k in sd):
        num_res_units = 2
    elif any(".conv.unit0." in k for k in sd):
        num_res_units = 1
    else:
        num_res_units = 0

    downsample = bool(hp.get("downsample", False))
    degree = int(hp.get("transform_degree", 1))
    in_channels = 1 if (downsample or degree == 0) else 3
    filters = tuple(hp.get("filters", (64, 128, 256, 512, 1024)))

    config = TrainConfig(
        filters=filters,
        num_res_units=num_res_units,
        downsample=downsample,
        transform_degree=degree,
        lr=float(hp.get("lr", 1e-3)),
        batch_size=int(hp.get("batch_size", 128)),
        loss_fx=tuple(hp.get("loss_fx", ("Dice", "Focal"))),
        exclude_missing=bool(hp.get("exclude_missing", False)),
    )
    params = import_monai_state_dict(
        sd,
        in_channels=in_channels,
        channels=filters,
        num_res_units=num_res_units,
        downsample=downsample,
        dtype=dtype,
    )
    return config, params
