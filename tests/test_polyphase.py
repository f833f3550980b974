"""Polyphase (subpixel) transposed conv == nn.ConvTranspose, exactly.

The decoder's ConvTransposeUnit can optionally route through the polyphase
decomposition (off by default — measured slower than XLA's lowering on v5e)
(ctseg_tpu/models/layers.py::polyphase_conv_transpose): s^ndim dense
stride-1 convolutions + interleave, same taps and products as the
dilated-input lowering. These tests pin value and gradient agreement in
float64 against flax's nn.ConvTranspose with the unit's padding convention
(torch ConvTranspose(k, s, p=(k-1)//2, output_padding=s-1); the torch
equivalence of that convention is pinned by tests/test_torch_parity.py).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.models.layers import (
    ConvTransposeUnit,
    polyphase_conv_transpose,
)


def _reference(x, kernel, bias, stride):
    k = kernel.shape[0]
    ndim = x.ndim - 2
    p = (k - 1) // 2
    pad = [(k - 1 - p, k - 1 - p + stride - 1)] * ndim
    y = jax.lax.conv_transpose(
        x,
        kernel,
        strides=(stride,) * ndim,
        padding=pad,
        dimension_numbers=(
            ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NDHWC", "DHWIO", "NDHWC")
        ),
    )
    return y + bias


@pytest.mark.parametrize("mode", ["phases", "packed"])
@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("stride", [2, 3])
@pytest.mark.parametrize("hw", [7, 8])
def test_polyphase_matches_conv_transpose_2d(rng, k, stride, hw, mode):
    x = jnp.asarray(rng.normal(size=(2, hw, hw + 1, 5)))
    w = jnp.asarray(rng.normal(size=(k, k, 5, 4)))
    b = jnp.asarray(rng.normal(size=(4,)))
    ours = polyphase_conv_transpose(x, w, b, stride, jnp.float64, mode=mode)
    ref = _reference(x, w, b, stride)
    assert ours.shape == (2, stride * hw, stride * (hw + 1), 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", ["phases", "packed"])
def test_polyphase_matches_conv_transpose_3d(rng, mode):
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 7, 3)))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 2)))
    b = jnp.asarray(rng.normal(size=(2,)))
    ours = polyphase_conv_transpose(x, w, b, 2, jnp.float64, mode=mode)
    ref = _reference(x, w, b, 2)
    assert ours.shape == (1, 10, 12, 14, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_polyphase_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 4)))
    b = jnp.asarray(rng.normal(size=(4,)))
    cot = jnp.asarray(rng.normal(size=(2, 16, 16, 4)))

    def loss(fn):
        return lambda x, w, b: jnp.sum(fn(x, w, b) * cot)

    ours = jax.grad(
        loss(lambda x, w, b: polyphase_conv_transpose(x, w, b, 2, jnp.float64)),
        argnums=(0, 1, 2),
    )(x, w, b)
    ref = jax.grad(loss(lambda x, w, b: _reference(x, w, b, 2)), argnums=(0, 1, 2))(
        x, w, b
    )
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-11, atol=1e-12)


def test_unit_polyphase_flag_same_params_same_output(rng):
    """polyphase=True/False share one parameter tree and agree numerically."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)))
    kw = dict(features=4, dtype=jnp.float64, param_dtype=jnp.float64)
    poly = ConvTransposeUnit(polyphase=True, **kw)
    base = ConvTransposeUnit(polyphase=False, **kw)
    params = poly.init(jax.random.key(0), x)
    params_base = base.init(jax.random.key(0), x)
    jax.tree.map(np.testing.assert_array_equal, params, params_base)
    np.testing.assert_allclose(
        poly.apply(params, x), base.apply(params, x), rtol=1e-12, atol=1e-12
    )
