"""Custom-VJP fused InstanceNorm+PReLU == composed reference, value + grads.

The unfused ConvUnit/ConvTransposeUnit norm+act path routes through
models/layers.py::instance_norm_prelu, whose backward stores the normalized
activation xhat (in x's dtype) as the residual and applies the analytic
InstanceNorm backward — exact for all alpha, including alpha <= 0 where
PReLU is not invertible. These tests pin value and gradient agreement in float64
against plain autodiff of instance_norm + PReLU, plus the parameter-tree
compatibility of the rewired units.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.models.layers import (
    ConvUnit,
    instance_norm,
    instance_norm_prelu,
)


def _composed(x, alpha):
    xn = instance_norm(x)
    a = alpha.reshape(()).astype(xn.dtype)
    return jnp.where(xn >= 0, xn, a * xn)


@pytest.mark.parametrize("shape", [(2, 8, 8, 5), (2, 4, 6, 8, 3)])
def test_value_matches_composed(rng, shape):
    x = jnp.asarray(rng.normal(size=shape))
    alpha = jnp.asarray([0.25])
    np.testing.assert_allclose(
        instance_norm_prelu(x, alpha), _composed(x, alpha), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("alpha0", [0.25, 0.8, 0.03, -0.1, 0.0])
def test_grads_match_autodiff(rng, alpha0):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)))
    alpha = jnp.asarray([alpha0])
    cot = jnp.asarray(rng.normal(size=x.shape))

    def loss(fn):
        return lambda x, a: jnp.sum(fn(x, a) * cot)

    dx, da = jax.grad(loss(instance_norm_prelu), argnums=(0, 1))(x, alpha)
    dx_ref, da_ref = jax.grad(loss(_composed), argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(da, da_ref, rtol=1e-9, atol=1e-11)


def test_conv_unit_param_tree_unchanged(rng):
    """The rewired unit declares exactly the same parameters as before
    (Conv_0/{kernel,bias}, PReLU_0/alpha) — checkpoints stay loadable."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)))
    params = ConvUnit(features=4).init(jax.random.key(0), x)["params"]
    assert set(params) == {"Conv_0", "PReLU_0"}
    assert set(params["PReLU_0"]) == {"alpha"}
    assert params["PReLU_0"]["alpha"].shape == (1,)
    assert float(params["PReLU_0"]["alpha"][0]) == 0.25


def test_grad_flows_through_conv_unit(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)))
    unit = ConvUnit(features=4)
    params = unit.init(jax.random.key(0), x)

    def loss(p, x):
        return jnp.sum(jnp.square(unit.apply(p, x)))

    grads = jax.grad(loss)(params, x)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(leaf))
    assert float(jnp.abs(grads["params"]["PReLU_0"]["alpha"]).sum()) > 0
