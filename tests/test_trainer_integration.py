"""Trainer integration behaviors: plateau wiring inside fit(), key handling."""

import jax
import numpy as np
import pytest

from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.training.trainer import TrainConfig, Trainer


def _tiny(rng, n=8, hw=32):
    return PackedDataset2D(
        images=rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32),
        labels=rng.integers(0, 10, size=(n, hw, hw)).astype(np.uint8),
        indicators=np.ones((n, 9), np.float32),
    )


def test_fit_applies_plateau_lr_reduction(rng):
    """With patience 0 and a val metric that cannot improve (>1% threshold)
    every epoch, fit() must halve the LR through the plateau state."""
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        batch_size=8,
        transform_degree=1,
        input_size=32,
        lr=1e-3,
        plateau_patience=0,
        epochs=4,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _tiny(rng)
    pipe = DevicePipeline2D(ds, 8)
    state = tr.fit(state, pipe, val_pipeline=pipe, epochs=4)
    # epoch 1 sets best; epochs 2-4 cannot beat it by >1% -> reductions
    assert float(state.plateau.lr) < 1e-3


def test_train_steps_use_distinct_randomness(rng):
    """Two consecutive steps with the same epoch key still draw different
    augmentations (key folded with the step counter)."""
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        batch_size=4,
        transform_degree=2,
        input_size=16,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _tiny(rng, n=4, hw=32)
    pipe = DevicePipeline2D(ds, 4)
    batch = next(pipe.epoch(None))
    key = jax.random.key(9)
    state, m1 = tr._train_step(state, batch, key)
    state, m2 = tr._train_step(state, batch, key)
    # same batch, same key, but a different fold-in step: loss values differ
    assert float(m1["loss/total"]) != float(m2["loss/total"])
