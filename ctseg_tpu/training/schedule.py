"""ReduceLROnPlateau as a pure, jit-safe state transition.

Behavioral contract is torch.optim.lr_scheduler.ReduceLROnPlateau as the
reference configures it (capstone/training/base_trainer.py:140-148):
mode='max' on the validation mean Dice, factor=0.5, relative threshold 0.01,
patience=10, cooldown=0, min_lr=0, eps=1e-8. Implemented as a NamedTuple
state + transition function so it lives inside the jitted eval/update path
instead of a host-side scheduler object.
"""

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class PlateauState(NamedTuple):
    lr: jnp.ndarray  # current learning rate (float32 scalar)
    best: jnp.ndarray  # best metric seen so far
    num_bad_epochs: jnp.ndarray  # epochs without improvement (int32)


def plateau_init(lr: float, mode: str = "max") -> PlateauState:
    best0 = -jnp.inf if mode == "max" else jnp.inf
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(best0, jnp.float32),
        num_bad_epochs=jnp.asarray(0, jnp.int32),
    )


def reduce_on_plateau(
    state: PlateauState,
    metric: jnp.ndarray,
    mode: str = "max",
    factor: float = 0.5,
    patience: int = 10,
    threshold: float = 0.01,
    min_lr: float = 0.0,
    eps: float = 1e-8,
) -> Tuple[PlateauState, jnp.ndarray]:
    """One per-epoch transition. Returns (new_state, new_lr).

    torch semantics: with relative threshold and mode 'max', `metric` is an
    improvement iff metric > best * (1 + threshold) (for best >= 0); the LR
    is halved once `patience` consecutive non-improving epochs accumulate,
    and only if the change exceeds `eps`.
    """
    metric = jnp.asarray(metric, jnp.float32)
    if mode == "max":
        is_better = metric > state.best * (1.0 + threshold)
    else:
        is_better = metric < state.best * (1.0 - threshold)

    best = jnp.where(is_better, metric, state.best)
    num_bad = jnp.where(is_better, 0, state.num_bad_epochs + 1)

    should_reduce = num_bad > patience
    new_lr = jnp.maximum(state.lr * factor, min_lr)
    # torch skips the update when the delta is below eps.
    new_lr = jnp.where(state.lr - new_lr > eps, new_lr, state.lr)
    lr = jnp.where(should_reduce, new_lr, state.lr)
    num_bad = jnp.where(should_reduce, 0, num_bad)

    return PlateauState(lr=lr, best=best, num_bad_epochs=num_bad), lr
