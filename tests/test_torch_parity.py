"""Numerical parity of the conv/norm/act building blocks against torch.

These tests load identical weights into our flax layers and torch layers and
assert elementwise agreement — they pin down padding/stride/transposed-conv
semantics so the architecture is verifiably the one the reference trains
(MONAI Convolution units, capstone/training/base_trainer.py:72-79).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn_t

from ctseg_tpu.models.layers import instance_norm


def to_torch_conv_weight(kernel):
    # flax Conv kernel: (kh, kw, in, out) -> torch: (out, in, kh, kw)
    return torch.from_numpy(np.transpose(np.asarray(kernel), (3, 2, 0, 1))).double()


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_matches_torch(rng, stride):
    import flax.linen as nn

    x = rng.normal(size=(2, 16, 16, 5)).astype(np.float64)
    conv = nn.Conv(
        features=7,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        param_dtype=jnp.float64,
    )
    params = conv.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    tconv = nn_t.Conv2d(5, 7, 3, stride=stride, padding=1).double()
    with torch.no_grad():
        tconv.weight.copy_(to_torch_conv_weight(params["params"]["kernel"]))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(np.moveaxis(ref, 1, -1), ours, rtol=1e-10, atol=1e-10)


def test_conv_transpose_matches_torch(rng):
    """Our ConvTranspose padding ((1,2)) == torch ConvTranspose2d(k=3, s=2,
    p=1, output_padding=1), with the kernel transposed between conventions."""
    import flax.linen as nn

    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float64)
    conv = nn.ConvTranspose(
        features=7,
        kernel_size=(3, 3),
        strides=(2, 2),
        padding=[(1, 2), (1, 2)],
        param_dtype=jnp.float64,
    )
    params = conv.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    assert ours.shape == (2, 16, 16, 7)

    kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
    tconv = nn_t.ConvTranspose2d(5, 7, 3, stride=2, padding=1, output_padding=1).double()
    with torch.no_grad():
        # torch convT weight: (in, out, kh, kw); torch cross-correlates the
        # *flipped* kernel on the dilated input relative to lax.conv_transpose.
        w = np.transpose(kernel[::-1, ::-1], (2, 3, 0, 1))
        tconv.weight.copy_(torch.from_numpy(np.ascontiguousarray(w)))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    assert ref.shape == (2, 7, 16, 16)
    np.testing.assert_allclose(np.moveaxis(ref, 1, -1), ours, rtol=1e-10, atol=1e-10)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(3, 16, 16, 6)).astype(np.float64) * 4 + 1.5
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    tnorm = nn_t.InstanceNorm2d(6).double()  # affine=False, eps=1e-5 defaults
    ref = tnorm(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(np.moveaxis(ref, 1, -1), ours, rtol=1e-6, atol=1e-8)


def test_prelu_matches_torch(rng):
    from ctseg_tpu.models.layers import PReLU

    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    prelu = PReLU()
    params = prelu.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(prelu.apply(params, jnp.asarray(x)))
    tp = nn_t.PReLU()  # single shared parameter, init 0.25 (torch default)
    ref = tp(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_init_bounds_match_torch_convention():
    """Every kernel/bias in the UNet param tree is uniform(-b, b) with the
    torch kaiming_uniform(a=sqrt(5)) bound: b = 1/sqrt(fan * k^ndim), where
    torch reads the fan from weight.size(1) — IN channels for Conv but OUT
    channels for ConvTranspose (torch.nn.init._calculate_fan_in_and_fan_out
    on the (in, out, *k) convT weight layout). Statistical check: max|w| just
    under b, std ~= b/sqrt(3) for large leaves."""
    from ctseg_tpu.models.unet import UNet

    model = UNet(out_channels=9, channels=(16, 32, 64, 128, 256),
                 strides=(2, 2, 2, 2), num_res_units=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1), jnp.float32)
    )["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys[-1] == "kernel":
            kernels[keys[:-1]] = np.asarray(leaf)
    n_checked = 0
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if any("PReLU" in k for k in keys):
            np.testing.assert_allclose(np.asarray(leaf), 0.25)
            continue
        kshape = kernels[keys[:-1] if keys[-1] == "bias" else keys[:-1]].shape
        is_transposed = any("ConvTranspose" in k for k in keys)
        receptive = int(np.prod(kshape[:-2]))
        fan = (kshape[-1] if is_transposed else kshape[-2]) * receptive
        bound = 1.0 / np.sqrt(fan)
        w = np.asarray(leaf)
        assert np.abs(w).max() <= bound * (1 + 1e-6), keys
        if w.size >= 64:
            # max of n iid U(-b,b) concentrates at b; std at b/sqrt(3)
            assert np.abs(w).max() >= bound * 0.85, keys
        if w.size >= 2000:
            np.testing.assert_allclose(
                w.std(), bound / np.sqrt(3), rtol=0.1, err_msg=str(keys)
            )
        n_checked += 1
    # 5 levels x (res-units + up units) — make sure we actually saw convTs
    assert n_checked > 20
    assert any("ConvTranspose" in k for ks in kernels for k in ks)
