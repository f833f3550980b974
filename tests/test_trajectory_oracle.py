"""Full-model TRAINING-TRAJECTORY differential oracle vs torch.

Round-2 parity pinned the forward wiring (tests/test_model_oracle.py) and
per-op VJPs against JAX's own autodiff; nothing pinned the composed
full-model BACKWARD (convT backward under the reference padding convention,
the custom IN+PReLU VJP at depth, shortcut grads) or the Adam dynamics. The
±0.005 Dice-parity target (BASELINE.md) rides on training *trajectories*,
so these tests run >= 5 identical Adam steps in both frameworks from
identical weights (flowed through the production importer,
ctseg_tpu/models/torch_import.py) and assert the parameter trees agree at
every step in float64.

Reference step: capstone/training/base_trainer.py:97-148 (summed multi-loss
+ Adam lr=1e-3), losses at capstone/models/losses.py:71-124, mixup variant
at capstone/training/mixup_trainer.py:52-92.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_train_oracle import mixup_train_step_torch, train_step_torch
from torch_unet_oracle import ReferenceModelOracle

from ctseg_tpu.losses import MultiLoss
from ctseg_tpu.models import SegmentationModel
from ctseg_tpu.models.torch_import import import_monai_state_dict
from ctseg_tpu.training.mixup import mixup_tensors
from ctseg_tpu.training.optimizer import adam_init, adam_update

CHANNELS = (4, 8, 16, 32, 64)  # Model-L-shaped: 5 levels, strides 2,2,2,2
N_STEPS = 5
LR = 1e-3
# torch's default eps. This differential already caught one real bug: the
# optimizer originally computed 1 - b2^step in float32, whose catastrophic
# cancellation at early steps is a ~1e-4 relative LR error vs torch's
# Python-double bias corrections (fixed with the expm1 form in
# training/optimizer.py). Tolerance is absolute at 1e-8 — 1e-5 of the 1e-3
# update size — so a real backward bug cannot hide.
EPS = 1e-8


def _import_params(oracle, in_channels=3, channels=CHANNELS,
                   strides=(2, 2, 2, 2)):
    return import_monai_state_dict(
        oracle.state_dict(), in_channels=in_channels, channels=channels,
        strides=strides, num_res_units=oracle.unet.num_res_units,
        dtype=jnp.float64,
    )


def _setup(num_res_units, rng, batch=2, spatial=(32, 32)):
    torch.manual_seed(3)
    oracle = ReferenceModelOracle(
        2, 3, 10, CHANNELS, strides=(2,) * (len(CHANNELS) - 1),
        num_res_units=num_res_units,
    ).double()
    params = _import_params(oracle)
    model = SegmentationModel(
        out_channels=10, channels=CHANNELS, num_res_units=num_res_units,
        dtype=jnp.float64, param_dtype=jnp.float64,
    )
    images = rng.normal(size=(batch, *spatial, 3)).astype(np.float64)
    labels = rng.integers(0, 10, size=(batch, *spatial)).astype(np.int32)
    return oracle, model, params, images, labels


def _assert_trees_close(ours, oracle, step, import_kwargs=None, **tol):
    ref = _import_params(oracle, **(import_kwargs or {}))["params"]
    flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    assert len(flat_ours) == len(flat_ref)
    for k, v in flat_ours:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            err_msg=f"step {step}: {jax.tree_util.keystr(k)}", **tol,
        )


@pytest.mark.parametrize("num_res_units", [2, 0])
def test_adam_trajectory_matches_torch(rng, num_res_units):
    """>=5 identical Focal+Dice Adam steps: parameter trees agree each step.

    num_res_units=2 is Model L's configuration (residual subunits, strided
    shortcut convs, decoder ResidualUnits); 0 exercises the plain
    Convolution path incl. the top conv-only transposed conv."""
    oracle, model, params, images, labels = _setup(num_res_units, rng)
    opt = torch.optim.Adam(oracle.parameters(), lr=LR, eps=EPS)
    loss = MultiLoss(["Focal", "Dice"])
    opt_state = adam_init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, jnp.asarray(images))
            values = loss(logits, jnp.asarray(labels))
            return loss.total(values), values

        (_, values), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(grads, opt_state, params, LR, eps=EPS)
        return params, opt_state, values

    t_images = torch.from_numpy(np.moveaxis(images, -1, 1))
    t_labels = torch.from_numpy(labels)
    for i in range(N_STEPS):
        params, opt_state, values = step(params, opt_state)
        ref_values = train_step_torch(
            oracle, opt, t_images, t_labels, ["Focal", "Dice"]
        )
        for name in ("Focal", "Dice"):
            np.testing.assert_allclose(
                float(values[name]), ref_values[name], rtol=1e-6,
                err_msg=f"step {i}: loss {name}",
            )
        _assert_trees_close(
            params["params"], oracle, i, rtol=0, atol=1e-8
        )


def test_mixup_trajectory_matches_torch(rng):
    """The mixup trainer's step (num_res_units=1, lambda-combined losses on
    one mixed forward) follows torch for >=5 Adam steps. Partner index and
    lambda are FIXED identically on both sides: RNG-stream parity is
    impossible and not required (SURVEY.md §7); the loss composition and
    its backward are what's under test."""
    oracle, model, params, images, labels = _setup(1, rng, batch=4)
    opt = torch.optim.Adam(oracle.parameters(), lr=LR, eps=EPS)
    loss = MultiLoss(["Focal", "Dice"])
    opt_state = adam_init(params)
    index = np.array([2, 0, 3, 1])
    lam = 0.37

    @jax.jit
    def step(params, opt_state):
        imgs = jnp.asarray(images)
        labs = jnp.asarray(labels)
        mixed = mixup_tensors(imgs, jnp.take(imgs, jnp.asarray(index), 0), lam)

        def loss_fn(p):
            logits = model.apply(p, mixed)
            values_a = loss(logits, labs)
            values_b = loss(logits, jnp.take(labs, jnp.asarray(index), 0))
            values = {
                k: mixup_tensors(values_a[k], values_b[k], lam)
                for k in values_a
            }
            return loss.total(values), values

        (_, values), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(grads, opt_state, params, LR, eps=EPS)
        return params, opt_state, values

    t_images = torch.from_numpy(np.moveaxis(images, -1, 1))
    t_labels = torch.from_numpy(labels)
    t_index = torch.from_numpy(index)
    for i in range(N_STEPS):
        params, opt_state, values = step(params, opt_state)
        ref_values = mixup_train_step_torch(
            oracle, opt, t_images, t_labels, t_index, lam, ["Focal", "Dice"]
        )
        for name in ("Focal", "Dice"):
            np.testing.assert_allclose(
                float(values[name]), ref_values[name], rtol=1e-6,
                err_msg=f"step {i}: loss {name}",
            )
        _assert_trees_close(
            params["params"], oracle, i, rtol=0, atol=1e-8
        )


def test_adam_trajectory_matches_torch_3d(rng):
    """The VOLUMETRIC stack's training dynamics follow torch too: >=5
    identical Focal+Dice Adam steps of a 3D UNet (Conv3d/ConvTranspose3d/
    InstanceNorm3d oracle, patch-shaped input, num_res_units=2 as in the 3D
    patch trainer's presets) with parameter trees pinned each step.

    The 2D tests pin the plane-slice model; this one additionally exercises
    the rank-3 convT backward under the reference padding convention and
    the N-D loss path shared with volumetric/trainer3d.py. Ref:
    capstone/volumetric/base_trainer.py:55-101 (same summed-loss step)."""
    channels = (4, 8, 16, 32)
    strides = (2, 2, 2)
    torch.manual_seed(3)
    oracle = ReferenceModelOracle(
        3, 1, 10, channels, strides=strides, num_res_units=2,
    ).double()
    params = _import_params(
        oracle, in_channels=1, channels=channels, strides=strides
    )
    model = SegmentationModel(
        out_channels=10, channels=channels, strides=strides,
        num_res_units=2, dtype=jnp.float64, param_dtype=jnp.float64,
    )
    images = rng.normal(size=(2, 16, 16, 8, 1)).astype(np.float64)
    labels = rng.integers(0, 10, size=(2, 16, 16, 8)).astype(np.int32)

    opt = torch.optim.Adam(oracle.parameters(), lr=LR, eps=EPS)
    loss = MultiLoss(["Focal", "Dice"])
    opt_state = adam_init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, jnp.asarray(images))
            values = loss(logits, jnp.asarray(labels))
            return loss.total(values), values

        (_, values), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(grads, opt_state, params, LR, eps=EPS)
        return params, opt_state, values

    t_images = torch.from_numpy(np.moveaxis(images, -1, 1))
    t_labels = torch.from_numpy(labels)
    for i in range(N_STEPS):
        params, opt_state, values = step(params, opt_state)
        ref_values = train_step_torch(
            oracle, opt, t_images, t_labels, ["Focal", "Dice"]
        )
        for name in ("Focal", "Dice"):
            np.testing.assert_allclose(
                float(values[name]), ref_values[name], rtol=1e-6,
                err_msg=f"step {i}: loss {name}",
            )
        _assert_trees_close(
            params["params"], oracle, i,
            import_kwargs=dict(in_channels=1, channels=channels,
                               strides=strides),
            rtol=0, atol=1e-8,
        )


def test_trajectory_oracle_has_teeth(rng):
    """A deliberately broken convT backward is caught: flipping ONE
    transposed-conv weight gradient's spatial taps on the torch side (the
    classic convT kernel-flip backward bug) makes the step-0 tree comparison
    fail at the oracle's tolerance. (A uniform relative perturbation would
    cancel in Adam's m/sqrt(v) normalization — this one cannot.)"""
    oracle, model, params, images, labels = _setup(2, rng)
    opt = torch.optim.Adam(oracle.parameters(), lr=LR, eps=EPS)
    loss = MultiLoss(["Focal", "Dice"])
    opt_state = adam_init(params)

    def loss_fn(p):
        logits = model.apply(p, jnp.asarray(images))
        return loss.total(loss(logits, jnp.asarray(labels)))

    grads = jax.grad(loss_fn)(params)
    params, _ = adam_update(grads, opt_state, params, LR, eps=EPS)

    # Torch side: same step, but one convT weight grad perturbed before Adam.
    convt = [
        m for m in oracle.modules()
        if isinstance(m, (torch.nn.ConvTranspose2d,))
    ][0]
    convt.weight.register_hook(lambda g: g.flip(-1, -2))
    train_step_torch(
        oracle, opt, torch.from_numpy(np.moveaxis(images, -1, 1)),
        torch.from_numpy(labels), ["Focal", "Dice"],
    )
    with pytest.raises(AssertionError):
        _assert_trees_close(params["params"], oracle, 0, rtol=0, atol=1e-8)
