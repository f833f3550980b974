"""Fused conv3x3+IN+PReLU training op: forward + all gradients vs XLA.

Differential tests in Pallas interpret mode (CPU): the fused op must match
the unfused chain the reference trains (MONAI Convolution unit,
capstone/training/base_trainer.py:72-79) for the forward AND all four
gradients (x, w, b, alpha), in f32 exactly and bf16 within rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.models import SegmentationModel
from ctseg_tpu.ops.pallas.conv_block import (
    conv_fusion_supported,
    fused_conv3x3_in_prelu,
    in_prelu_bwd,
    pick_cout_tile,
    reference_conv3x3_in_prelu,
)


def _case(rng, n=2, h=12, w=12, cin=8, cout=16, dtype=np.float32):
    x = rng.normal(size=(n, h, w, cin)).astype(dtype)
    wgt = (rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    alpha = np.asarray([0.25], np.float32)
    return jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(b), jnp.asarray(alpha)


def test_forward_matches_reference_f32(rng):
    x, w, b, alpha = _case(rng)
    out = fused_conv3x3_in_prelu(x, w, b, alpha, True)
    ref = reference_conv3x3_in_prelu(x, w, b, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference_f32(rng):
    x, w, b, alpha = _case(rng)
    r = jnp.asarray(rng.normal(size=(2, 12, 12, 16)).astype(np.float32))

    def loss_fused(x, w, b, alpha):
        return jnp.sum(fused_conv3x3_in_prelu(x, w, b, alpha, True) * r)

    def loss_ref(x, w, b, alpha):
        return jnp.sum(reference_conv3x3_in_prelu(x, w, b, alpha) * r)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, alpha)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, alpha)
    for name, a, e in zip(("dx", "dw", "db", "dalpha"), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_forward_bf16_matches_f32_reference(rng):
    x, w, b, alpha = _case(rng, cin=16, cout=32)
    out = fused_conv3x3_in_prelu(x.astype(jnp.bfloat16), w, b, alpha, True)
    assert out.dtype == jnp.bfloat16
    ref = reference_conv3x3_in_prelu(x, w, b, alpha)
    # bf16 matmul inputs with f32 accumulation/stats: a few ULPs of bf16.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.05
    )


def test_gradients_bf16_run_and_are_finite(rng):
    x, w, b, alpha = _case(rng, cin=16, cout=32)

    def loss(x16, w, b, alpha):
        return jnp.sum(
            fused_conv3x3_in_prelu(x16, w, b, alpha, True).astype(jnp.float32) ** 2
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        x.astype(jnp.bfloat16), w, b, alpha
    )
    assert grads[0].dtype == jnp.bfloat16
    assert grads[1].dtype == jnp.float32  # param grads stay in param dtype
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_in_prelu_bwd_matches_autodiff(rng):
    """The fused backward kernel alone == jax.vjp of IN+PReLU."""
    n, h, w, c = 2, 8, 8, 16
    y = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32)) * 3
    g = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)

    def in_prelu(y, alpha):
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
        xhat = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(xhat >= 0, xhat, alpha.reshape(()) * xhat)

    out, vjp = jax.vjp(in_prelu, y, alpha)
    dy_ref, dalpha_ref = vjp(g)

    mean = jnp.mean(y, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
    rsinv = jax.lax.rsqrt(var + 1e-5)[:, 0, 0, :]
    xhat = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    dy, dalpha = in_prelu_bwd(g, xhat, rsinv, alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dalpha), np.asarray(dalpha_ref), rtol=1e-5
    )


def test_cout_tiling(rng):
    """Shapes over the VMEM budget tile the channel axis (and still match)."""
    assert pick_cout_tile(32, 32, 256, 256, jnp.float32, budget=8 * 2**20) == 128
    assert pick_cout_tile(12, 12, 8, 16, jnp.float32) == 16
    # A huge shape is rejected entirely.
    assert pick_cout_tile(256, 256, 64, 64, jnp.float32, budget=8 * 2**20) is None
    assert not conv_fusion_supported((1, 16, 16, 8), 16, jnp.float32, stride=2)

    import ctseg_tpu.ops.pallas.conv_block as cb

    x, w, b, alpha = _case(rng, n=1, h=16, w=16, cin=128, cout=256)
    ref = reference_conv3x3_in_prelu(x, w, b, alpha)
    old = cb.VMEM_BUDGET
    try:
        cb.VMEM_BUDGET = 2 * 2**20  # force ct=128 < cout
        assert pick_cout_tile(16, 16, 128, 256, jnp.float32) == 128
        out = fused_conv3x3_in_prelu(x, w, b, alpha, True)
    finally:
        cb.VMEM_BUDGET = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_model_fused_conv_checkpoint_compatible(rng):
    """fused_conv_block=True: identical param tree, same forward, same grads."""
    kwargs = dict(
        out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=2,
    )
    plain = SegmentationModel(**kwargs)
    fused = SegmentationModel(**kwargs, fused_conv_block=True)

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = plain.init(jax.random.key(0), x)
    params_f = fused.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_p = plain.apply(params, x)
    out_f = fused.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=1e-4, atol=1e-4
    )

    r = jnp.asarray(rng.normal(size=out_p.shape).astype(np.float32))
    g_p = jax.grad(lambda p: jnp.sum(plain.apply(p, x) * r))(params)
    g_f = jax.grad(lambda p: jnp.sum(fused.apply(p, x) * r))(params)
    for pth, a, b in zip(
        jax.tree_util.tree_leaves_with_path(g_p),
        jax.tree.leaves(g_p),
        jax.tree.leaves(g_f),
    ):
        # f32 round-off through 18 conv layers: different reduction orders
        # (fused stats, saved-xhat backward, XLA conv-grad algorithm choice).
        # Verified against a float64 oracle: fused-vs-f64 error equals
        # plain-vs-f64 error at every parameter.
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=str(pth[0]),
        )
