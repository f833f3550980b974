"""Plateau LR schedule vs torch.optim.lr_scheduler.ReduceLROnPlateau
(the reference's configuration: mode='max', factor=0.5, threshold=0.01,
capstone/training/base_trainer.py:140-148)."""

import numpy as np
import pytest
import torch

from ctseg_tpu.training.schedule import plateau_init, reduce_on_plateau


def torch_lr_trace(metrics, lr=1e-3, **kw):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, threshold=0.01, **kw
    )
    lrs = []
    for m in metrics:
        sched.step(m)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


def ours_lr_trace(metrics, lr=1e-3, patience=10):
    state = plateau_init(lr, mode="max")
    lrs = []
    for m in metrics:
        state, new_lr = reduce_on_plateau(
            state, m, mode="max", factor=0.5, patience=patience, threshold=0.01
        )
        lrs.append(float(new_lr))
    return lrs


def test_plateau_matches_torch_improving_then_stalling():
    metrics = [0.1 * i for i in range(1, 6)] + [0.5] * 15 + [0.8] + [0.8] * 15
    np.testing.assert_allclose(ours_lr_trace(metrics), torch_lr_trace(metrics))


def test_plateau_matches_torch_noisy(rng):
    metrics = list(rng.random(60) * 0.8)
    np.testing.assert_allclose(ours_lr_trace(metrics), torch_lr_trace(metrics))


def test_plateau_threshold_semantics():
    """An improvement below the 1% relative threshold still counts as bad."""
    metrics = [0.5] + [0.5049] * 15  # +0.98% — below threshold
    ours = ours_lr_trace(metrics)
    ref = torch_lr_trace(metrics)
    np.testing.assert_allclose(ours, ref)
    assert ours[-1] == pytest.approx(5e-4)  # one halving happened


def test_plateau_repeated_reductions():
    metrics = [1.0] + [1.0] * 40
    ours = ours_lr_trace(metrics)
    ref = torch_lr_trace(metrics)
    np.testing.assert_allclose(ours, ref)
    assert ours[-1] < 5e-4  # multiple halvings


def test_adam_matches_optax():
    """Hand-rolled Adam == optax.adam (torch-identical update) over 5 steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ctseg_tpu.training.optimizer import adam_init, adam_update

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    lr = 1e-3
    opt = optax.adam(lr)
    o_state = opt.init(params)
    a_state = adam_init(params)
    a_params = params
    for i in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)
            ),
            params,
        )
        updates, o_state = opt.update(grads, o_state, params)
        params = optax.apply_updates(params, updates)
        a_params, a_state = adam_update(grads, a_state, a_params, lr)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(a_params[k]), np.asarray(params[k]),
                rtol=1e-6, atol=1e-7,
            )
