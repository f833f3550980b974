"""UNet architecture tests: shapes, parameter counts, 2D/3D, config variants.

Parameter-count targets come from the reference report (Report.pdf Table 1):
Model L (filters 64..1024, num_res_units=2) ~ 26M params; Model M
(num_res_units=1) ~ 13.5M is a *different* filter config in the report, but
the res-unit deltas here sanity-check the architecture wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.models import SegmentationModel, UNet


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.mark.parametrize("res_units", [0, 1, 2])
def test_unet2d_output_shape(res_units):
    model = UNet(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=res_units)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 64, 64, 10)


def test_unet3d_output_shape():
    model = UNet(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=2)
    x = jnp.zeros((1, 16, 32, 32, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 16, 32, 32, 10)


def test_model_l_param_count():
    """Model L: 2D UNet, in=3, out=10, filters 64..1024, res units 2 -> ~26M
    (Report.pdf Table 1)."""
    model = UNet(out_channels=10, num_res_units=2)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    count = n_params(params)
    assert 25_000_000 < count < 27_500_000, f"param count {count}"


def test_res_units_increase_params():
    counts = []
    for ru in (0, 1, 2):
        model = UNet(out_channels=10, channels=(8, 16, 32, 64, 128), num_res_units=ru)
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        counts.append(n_params(params))
    assert counts[0] < counts[1] < counts[2]


def test_downsample_conv1x1():
    model = SegmentationModel(
        channels=(4, 8, 16, 32, 64), num_res_units=0, downsample=True
    )
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 64, 64, 10)
    assert "conv1x1" in params["params"]


def test_odd_input_sizes_rejected_gracefully():
    """256 input halves cleanly 4 times; check a non-power-of-two still works
    when divisible by 16."""
    model = UNet(out_channels=10, channels=(4, 8, 16, 32, 64))
    x = jnp.zeros((1, 96, 96, 3))
    params = model.init(jax.random.key(0), x)
    assert model.apply(params, x).shape == (1, 96, 96, 10)


def test_forward_is_deterministic():
    model = UNet(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=1)
    x = jnp.ones((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out1 = model.apply(params, x)
    out2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_packed_depth_flag_is_numerically_transparent():
    """UNet(packed_depth=True) must produce the same outputs from the same
    params as the native build: the flag only re-expresses the strided
    Cin=1 stem conv as a (D, Cin)-folded 2D conv (exact math, see
    ops/shallow_grad.py::conv_packed_depth). Checkpoint-compatible by
    construction -- the param tree is identical."""
    kw = dict(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=2)
    native = UNet(packed_depth=False, **kw)
    packed = UNet(packed_depth=True, **kw)
    from ctseg_tpu.ops.shallow_grad import packed_depth_supported

    # (N, H, W, D, C): Cin=1, D=16 satisfies the packed gate at the stem.
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 16, 1))
    assert packed_depth_supported(1, kw["channels"][0], 2, 3, ndim=3,
                                  depth=x.shape[-2])
    params = native.init(jax.random.key(0), x)
    assert jax.tree.structure(packed.init(jax.random.key(0), x)) == (
        jax.tree.structure(params)
    )
    out_n = native.apply(params, x)
    out_p = packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               rtol=1e-9, atol=1e-9)


def test_packed_up_fwd_flag_is_numerically_transparent():
    """UNet(packed_up_fwd=True) must match the native build in value AND
    gradient from the same params: the flag only swaps the top decoder
    transposed conv's FORWARD for the packed-polyphase formulation
    (ops/shallow_grad.py::conv_transpose_smallc fwd_mode="packed"); the
    backward stays on the reformulated smallc rules either way. Parameter
    tree identical -> checkpoint-compatible."""
    kw = dict(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=2,
              dtype=jnp.float64, param_dtype=jnp.float64)
    native = UNet(packed_up_fwd=False, **kw)
    packed = UNet(packed_up_fwd=True, **kw)

    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 1),
                          dtype=jnp.float64)
    params = native.init(jax.random.key(0), x)
    assert jax.tree.structure(packed.init(jax.random.key(0), x)) == (
        jax.tree.structure(params)
    )

    def scalar(model, p):
        return jnp.sum(jnp.sin(model.apply(p, x)))

    v_n, g_n = jax.value_and_grad(lambda p: scalar(native, p))(params)
    v_p, g_p = jax.value_and_grad(lambda p: scalar(packed, p))(params)
    # f64 so the packed forward's different summation grouping stays at
    # reassociation level instead of cascading through the IN statistics
    # (in f32 the deep-net amplification reaches ~1e-2 relative on small
    # gradient elements). The backward rules are shared (shallow_grad), so
    # any gradient difference comes only from the reassociated forward
    # values feeding the cotangent.
    np.testing.assert_allclose(float(v_p), float(v_n), rtol=1e-12)
    for ln, lp in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ln),
                                   rtol=1e-8, atol=1e-10)
