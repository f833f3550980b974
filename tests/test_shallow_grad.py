"""Differential tests: shallow-channel weight-grad reformulations vs native.

ops/shallow_grad.py swaps ONLY the weight gradient of the small-channel convs
for a batch-as-contracted-feature conv formulation (exact sum reordering).
These tests pin forward and all three gradients (dx, dw, db) against the
plain lax conv / conv_transpose VJP in float64 on CPU, 2D and 3D, including
non-square spatial shapes and cin != cout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ctseg_tpu.ops.shallow_grad import (
    conv_smallc,
    conv_transpose_smallc,
    smallc_supported,
)

_SPATIAL = {2: "HW", 3: "HWD"}


def _dims(ndim):
    s = _SPATIAL[ndim]
    return (f"N{s}C", f"{s}IO", f"N{s}C")


def _native_conv(x, w, b, stride, pad):
    ndim = x.ndim - 2
    return (
        lax.conv_general_dilated(
            x, w, (stride,) * ndim, [(pad, pad)] * ndim,
            dimension_numbers=_dims(ndim),
        )
        + b
    )


def _native_convt(x, w, b, stride, k):
    ndim = x.ndim - 2
    p = (k - 1) // 2
    return (
        lax.conv_transpose(
            x, w, (stride,) * ndim,
            [(k - 1 - p, k - 1 - p + stride - 1)] * ndim,
            dimension_numbers=_dims(ndim),
        )
        + b
    )


def _grads(fn, x, w, b, cot):
    out, vjp = jax.vjp(fn, x, w, b)
    return out, vjp(cot)


@pytest.mark.parametrize(
    "shape,cin,cout,k",
    [
        ((2, 12, 10), 10, 10, 3),      # 2D, the real decoder channel count
        ((2, 12, 10), 3, 10, 3),       # cin != cout
        ((3, 8, 10, 6), 10, 10, 3),    # 3D
        ((2, 9, 7, 5), 1, 12, 3),      # stem-like cin=1
        ((2, 11, 9), 10, 4, 5),        # k=5 odd kernel
    ],
)
def test_conv_smallc_matches_native(shape, cin, cout, k):
    rng = np.random.default_rng(0)
    ndim = len(shape) - 1
    x = jnp.asarray(rng.standard_normal(shape + (cin,)))
    w = jnp.asarray(rng.standard_normal((k,) * ndim + (cin, cout)))
    b = jnp.asarray(rng.standard_normal((cout,)))
    pad = (k - 1) // 2
    assert smallc_supported(cin, cout, 1, k, ndim=ndim) == (ndim == 3)

    fn_n = lambda x_, w_, b_: _native_conv(x_, w_, b_, 1, pad)
    fn_s = lambda x_, w_, b_: conv_smallc(x_, w_, b_, 1, pad)
    out_n = fn_n(x, w, b)
    cot = jnp.asarray(rng.standard_normal(out_n.shape))
    out_s, (dx_s, dw_s, db_s) = _grads(fn_s, x, w, b, cot)
    _, (dx_n, dw_n, db_n) = _grads(fn_n, x, w, b, cot)

    np.testing.assert_allclose(out_s, out_n, rtol=0, atol=1e-12)
    np.testing.assert_allclose(dx_s, dx_n, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(dw_s, dw_n, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(db_s, db_n, rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("fwd_mode", ["native", "packed"])
@pytest.mark.parametrize(
    "shape,cin,cout",
    [
        ((2, 8, 6), 12, 10),       # 2D final up level (many -> few)
        ((2, 8, 6), 10, 10),
        ((3, 6, 4, 3), 14, 10),    # 3D
        ((2, 5, 7, 3), 10, 2),
    ],
)
def test_conv_transpose_smallc_matches_native(shape, cin, cout, fwd_mode):
    rng = np.random.default_rng(1)
    ndim = len(shape) - 1
    k, s = 3, 2
    x = jnp.asarray(rng.standard_normal(shape + (cin,)))
    w = jnp.asarray(rng.standard_normal((k,) * ndim + (cin, cout)))
    b = jnp.asarray(rng.standard_normal((cout,)))
    assert smallc_supported(cin, cout, s, k, transpose=True, ndim=ndim)

    fn_n = lambda x_, w_, b_: _native_convt(x_, w_, b_, s, k)
    fn_s = lambda x_, w_, b_: conv_transpose_smallc(x_, w_, b_, s, k, fwd_mode)
    out_n = fn_n(x, w, b)
    assert out_n.shape == (shape[0],) + tuple(d * s for d in shape[1:]) + (cout,)
    cot = jnp.asarray(rng.standard_normal(out_n.shape))
    out_s, (dx_s, dw_s, db_s) = _grads(fn_s, x, w, b, cot)
    _, (dx_n, dw_n, db_n) = _grads(fn_n, x, w, b, cot)

    # The packed forward performs the same products in a different summation
    # grouping (one s^ndim*Cout-feature conv), so allow f64 reassociation.
    np.testing.assert_allclose(
        out_s, out_n, rtol=0, atol=1e-12 if fwd_mode == "native" else 1e-10
    )
    np.testing.assert_allclose(dx_s, dx_n, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(dw_s, dw_n, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(db_s, db_n, rtol=1e-12, atol=1e-10)


def test_smallc_threshold_gates():
    assert not smallc_supported(64, 128, 1, 3)          # lane-full: native
    assert not smallc_supported(10, 10, 2, 3)           # strided plain conv
    assert not smallc_supported(10, 10, 1, 4)           # even kernel
    assert not smallc_supported(10, 10, 1, 3, ndim=2)   # 2D plain: no win
    assert not smallc_supported(128, 10, 2, 5, transpose=True)  # k != 3
    assert smallc_supported(128, 10, 2, 3, transpose=True, ndim=2)  # 2D convT
    assert smallc_supported(128, 10, 2, 3, transpose=True)
    assert smallc_supported(10, 10, 1, 3, ndim=3)
    # Depth bound: the merged dW's redundancy grows O(D); measured winning
    # only through D=64 (perf/merged_dw_depth_v5e.json), native beyond.
    assert smallc_supported(10, 10, 1, 3, ndim=3, depth=64)
    assert not smallc_supported(10, 10, 1, 3, ndim=3, depth=65)
    # The transposed rewrite has no depth fold — depth must not gate it.
    assert smallc_supported(128, 10, 2, 3, transpose=True, depth=512)


# ---------------------------------------------------------- integration
def _unit_grads(module, x, key):
    params = module.init(key, x)

    def loss(p, x_):
        return jnp.sum(jnp.square(module.apply(p, x_)))

    val, grads = jax.value_and_grad(loss)(params, x)
    return params, val, grads


@pytest.mark.parametrize("ndim", [3])
def test_conv_unit_smallc_matches_native_path(monkeypatch, ndim):
    """ConvUnit with the smallc weight-grad == ConvUnit forced native:
    identical param tree, forward, and parameter gradients."""
    import ctseg_tpu.ops.shallow_grad as sg
    from ctseg_tpu.models.layers import ConvUnit

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2,) + (6,) * ndim + (10,))
    )
    key = jax.random.key(0)
    mod = ConvUnit(features=10, kernel_size=3, stride=1,
                   dtype=jnp.float64, param_dtype=jnp.float64)
    p_s, v_s, g_s = _unit_grads(mod, x, key)
    monkeypatch.setattr(sg, "SMALLC_THRESHOLD", -1)  # force nn.Conv
    p_n, v_n, g_n = _unit_grads(mod, x, key)

    assert jax.tree.structure(p_s) == jax.tree.structure(p_n)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_n)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(v_s, v_n, rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_n)):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("ndim", [2, 3])
def test_conv_transpose_unit_smallc_matches_native_path(monkeypatch, ndim):
    import ctseg_tpu.ops.shallow_grad as sg
    from ctseg_tpu.models.layers import ConvTransposeUnit

    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2,) + (4,) * ndim + (12,))
    )
    key = jax.random.key(1)
    mod = ConvTransposeUnit(features=10, kernel_size=3, stride=2,
                            dtype=jnp.float64, param_dtype=jnp.float64)
    p_s, v_s, g_s = _unit_grads(mod, x, key)
    monkeypatch.setattr(sg, "SMALLC_THRESHOLD", -1)  # force nn.ConvTranspose
    p_n, v_n, g_n = _unit_grads(mod, x, key)

    assert jax.tree.structure(p_s) == jax.tree.structure(p_n)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_n)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(v_s, v_n, rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_n)):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


# ------------------------------------------------- packed depth-fold stem
def _native_strided_conv3d(x, w, b, stride, k):
    p = (k - 1) // 2
    return (
        lax.conv_general_dilated(
            x, w, (stride,) * 3, [(p, p)] * 3,
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )
        + b
    )


@pytest.mark.parametrize(
    "shape,cin,cout,stride",
    [
        ((2, 16, 16, 8), 1, 12, 2),     # the stem family
        ((2, 15, 13, 8), 1, 6, 2),      # odd H/W (ceil semantics on H, W)
        ((2, 12, 12, 6), 2, 8, 2),      # cin=2
        ((1, 9, 9, 9), 1, 4, 3),        # stride 3, depth % stride == 0
    ],
)
def test_conv_packed_depth_matches_native(shape, cin, cout, stride):
    from ctseg_tpu.ops.shallow_grad import (
        conv_packed_depth,
        packed_depth_supported,
    )

    rng = np.random.default_rng(2)
    k = 3
    x = jnp.asarray(rng.standard_normal(shape + (cin,)))
    w = jnp.asarray(rng.standard_normal((k,) * 3 + (cin, cout)))
    b = jnp.asarray(rng.standard_normal((cout,)))
    assert packed_depth_supported(cin, cout, stride, k, 3, shape[-1])

    fn_n = lambda x_, w_, b_: _native_strided_conv3d(x_, w_, b_, stride, k)
    fn_p = lambda x_, w_, b_: conv_packed_depth(x_, w_, b_, stride)
    out_n = fn_n(x, w, b)
    cot = jnp.asarray(rng.standard_normal(out_n.shape))
    out_p, (dx_p, dw_p, db_p) = _grads(fn_p, x, w, b, cot)
    _, (dx_n, dw_n, db_n) = _grads(fn_n, x, w, b, cot)

    assert out_p.shape == out_n.shape
    np.testing.assert_allclose(out_p, out_n, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(dx_p, dx_n, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(dw_p, dw_n, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(db_p, db_n, rtol=1e-10, atol=1e-10)


def test_packed_depth_gates():
    from ctseg_tpu.ops.shallow_grad import packed_depth_supported

    assert packed_depth_supported(1, 64, 2, 3, 3, 16)    # the bench stem
    assert not packed_depth_supported(1, 64, 1, 3, 3, 16)   # unstrided
    assert not packed_depth_supported(1, 64, 2, 3, 2, 16)   # 2D
    assert not packed_depth_supported(1, 64, 2, 3, 3, 15)   # depth % s != 0
    assert not packed_depth_supported(64, 64, 2, 3, 3, 16)  # MAC-bound fold
    assert not packed_depth_supported(1, 64, 2, 3, 3, 32)   # beyond measured


def test_residual_unit_packed_depth_matches_native_path():
    """Strided 3D ResidualUnit (stem family: unit0 + shortcut both route
    through the packed fold): identical params, forward, and grads vs the
    packed_depth=False build."""
    from ctseg_tpu.models.layers import ResidualUnit

    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 8, 8, 8, 1))
    )
    key = jax.random.key(2)
    kw = dict(features=6, kernel_size=3, stride=2, subunits=2,
              dtype=jnp.float64, param_dtype=jnp.float64)
    p_p, v_p, g_p = _unit_grads(ResidualUnit(packed_depth=True, **kw), x, key)
    p_n, v_n, g_n = _unit_grads(ResidualUnit(packed_depth=False, **kw), x, key)

    assert jax.tree.structure(p_p) == jax.tree.structure(p_n)
    for a, b in zip(jax.tree.leaves(p_p), jax.tree.leaves(p_n)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(v_p, v_n, rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_n)):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)
