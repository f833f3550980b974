"""WHOLE-model architecture oracle: flax UNet == hand-built MONAI-torch UNet.

Round-1 parity tests pinned each layer type individually
(tests/test_torch_parity.py); these pin the *composition* — skip-concat
ordering, decoder channel recursion, residual-unit placement, last_conv_only
at the top — against a plain-torch replica of the MONAI UNet the reference
trains (capstone/models/__init__.py:3, training/base_trainer.py:64-79,
volumetric/base_trainer.py:58-72). Weights flow torch -> flax through the
production checkpoint importer (ctseg_tpu/models/torch_import.py), so a
single forward-agreement assert validates both the wiring and the importer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_unet_oracle import ReferenceModelOracle

from ctseg_tpu.models import SegmentationModel
from ctseg_tpu.models.torch_import import (
    import_monai_state_dict,
    load_reference_checkpoint,
)


def _forward_pair(dims, in_channels, out_channels, channels, num_res_units,
                  downsample, spatial, rng):
    """Build torch oracle + flax model sharing weights; return both outputs."""
    torch.manual_seed(0)
    oracle = ReferenceModelOracle(
        dims, in_channels, out_channels, channels, strides=(2,) * (len(channels) - 1),
        num_res_units=num_res_units, downsample=downsample,
    ).double().eval()

    params = import_monai_state_dict(
        oracle.state_dict(),
        in_channels=in_channels,
        channels=channels,
        strides=(2,) * (len(channels) - 1),
        num_res_units=num_res_units,
        downsample=downsample,
        dtype=jnp.float64,
    )
    model = SegmentationModel(
        out_channels=out_channels,
        channels=channels,
        strides=(2,) * (len(channels) - 1),
        num_res_units=num_res_units,
        downsample=downsample,
        dtype=jnp.float64,
        param_dtype=jnp.float64,
    )

    x = rng.normal(size=(2, *spatial, in_channels)).astype(np.float64)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    return ours, np.moveaxis(ref, 1, -1)


@pytest.mark.parametrize("num_res_units", [0, 1, 2])
def test_unet2d_matches_monai_oracle(rng, num_res_units):
    ours, ref = _forward_pair(
        dims=2, in_channels=3, out_channels=10,
        channels=(4, 8, 16, 32, 64), num_res_units=num_res_units,
        downsample=False, spatial=(32, 32), rng=rng,
    )
    assert ours.shape == ref.shape == (2, 32, 32, 10)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_unet2d_downsample_matches_monai_oracle(rng):
    """conv1x1 3->1 input downsample before the UNet (base_trainer.py:81-85)."""
    ours, ref = _forward_pair(
        dims=2, in_channels=3, out_channels=10,
        channels=(4, 8, 16, 32, 64), num_res_units=2,
        downsample=True, spatial=(32, 32), rng=rng,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("num_res_units", [0, 2])
def test_unet3d_matches_monai_oracle(rng, num_res_units):
    """The volumetric configuration (volumetric/base_trainer.py:58-72)."""
    ours, ref = _forward_pair(
        dims=3, in_channels=1, out_channels=10,
        channels=(2, 4, 8, 16, 32), num_res_units=num_res_units,
        downsample=False, spatial=(32, 32, 16), rng=rng,
    )
    assert ours.shape == (2, 32, 32, 16, 10)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_wiring_bug_is_caught(rng):
    """The oracle has teeth: swapping the skip-concat order must fail."""
    torch.manual_seed(0)
    oracle = ReferenceModelOracle(
        2, 3, 10, (4, 8, 16, 32, 64), (2, 2, 2, 2), num_res_units=1,
    ).double().eval()
    params = import_monai_state_dict(
        oracle.state_dict(), in_channels=3, channels=(4, 8, 16, 32, 64),
        num_res_units=1, dtype=jnp.float64,
    )
    model = SegmentationModel(
        out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=1,
        dtype=jnp.float64, param_dtype=jnp.float64,
    )
    x = rng.normal(size=(1, 32, 32, 3))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    # Reorder the concat inside the torch oracle (deeper output first).
    import torch_unet_oracle as o

    class SwappedSkip(torch.nn.Module):
        def __init__(self, submodule):
            super().__init__()
            self.submodule = submodule

        def forward(self, t):
            return torch.cat([self.submodule(t), t], dim=1)

    orig = o.SkipConnection
    try:
        o.SkipConnection = SwappedSkip
        torch.manual_seed(0)
        swapped = o.ReferenceModelOracle(
            2, 3, 10, (4, 8, 16, 32, 64), (2, 2, 2, 2), num_res_units=1,
        ).double().eval()
    finally:
        o.SkipConnection = orig
    swapped.load_state_dict(oracle.state_dict())
    with torch.no_grad():
        ref = swapped(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    assert not np.allclose(ours, np.moveaxis(ref, 1, -1), atol=1e-3)


def test_lightning_checkpoint_roundtrip(tmp_path, rng):
    """A reference-style .ckpt (state_dict + hyper_parameters) loads into a
    TrainConfig + params whose forward matches the torch model exactly."""
    torch.manual_seed(1)
    oracle = ReferenceModelOracle(
        2, 3, 10, (4, 8, 16, 32, 64), (2, 2, 2, 2),
        num_res_units=2, downsample=False,
    ).double().eval()
    ckpt = {
        "state_dict": oracle.state_dict(),
        "hyper_parameters": {
            "batch_size": 128,
            "transform_degree": 2,
            "filters": [4, 8, 16, 32, 64],
            "use_res_units": True,
            "downsample": False,
            "lr": 1e-3,
            "loss_fx": ["Dice", "Focal"],
            "exclude_missing": True,
        },
    }
    path = tmp_path / "model_large.ckpt"
    torch.save(ckpt, path)

    config, params = load_reference_checkpoint(str(path), dtype=jnp.float64)
    assert config.num_res_units == 2
    assert config.filters == (4, 8, 16, 32, 64)
    assert config.exclude_missing and config.transform_degree == 2

    model = SegmentationModel(
        out_channels=10, channels=config.filters,
        num_res_units=config.num_res_units, downsample=config.downsample,
        dtype=jnp.float64, param_dtype=jnp.float64,
    )
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float64)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(ours, np.moveaxis(ref, 1, -1), rtol=1e-9, atol=1e-9)


def test_mixup_res_units_detected_from_state_dict(tmp_path):
    """num_res_units=1 (mixup trainer hardcode) is recovered from the keys."""
    torch.manual_seed(2)
    oracle = ReferenceModelOracle(
        2, 3, 10, (4, 8, 16, 32, 64), (2, 2, 2, 2), num_res_units=1,
    ).double()
    ckpt = {
        "state_dict": oracle.state_dict(),
        "hyper_parameters": {
            "filters": [4, 8, 16, 32, 64], "use_res_units": True,
            "transform_degree": 4, "downsample": False,
        },
    }
    path = tmp_path / "model_mixup.ckpt"
    torch.save(ckpt, path)
    config, params = load_reference_checkpoint(str(path))
    assert config.num_res_units == 1
    # Structure check: params must initialize-apply cleanly.
    model = SegmentationModel(
        out_channels=10, channels=config.filters, num_res_units=1,
    )
    out = model.apply(
        jax.tree.map(lambda a: a.astype(jnp.float32), params),
        jnp.zeros((1, 32, 32, 3)),
    )
    assert out.shape == (1, 32, 32, 10)
