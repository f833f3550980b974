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


def test_3d_trainer_partial_transform_falls_back_to_3d():
    """A 3D trainer given only a train_transform must still evaluate through
    the 3D fallback transform, never the 2D resize pipeline."""
    from ctseg_tpu.volumetric import trainer3d

    cfg = TrainConfig(
        filters=(2, 4),
        spatial_dims=3,
        input_shape=(16, 16, 8),
        in_channels=1,
        batch_size=2,
        volumetric_mode="resize",
    )

    def my_train_transform(key, image, label):
        return image[..., None], label

    tr = Trainer(cfg, train_transform=my_train_transform)
    assert tr.train_transform is my_train_transform
    assert tr.test_transform is trainer3d._identity_transform


def test_make_trainer_3d_patch_size_overrides_config():
    """patch_size is honored even when a config is supplied (previously a
    silent no-op whenever config was not None)."""
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    cfg = TrainConfig(
        filters=(2, 4),
        spatial_dims=3,
        input_shape=(32, 32, 16),
        in_channels=1,
        batch_size=2,
    )
    tr = make_trainer_3d(cfg, mode="patch", patch_size=(16, 16, 8))
    assert tuple(tr.config.input_shape) == (16, 16, 8)


def test_pipeline3d_rejects_oversized_batch(rng):
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.volumetric.pipeline3d import DevicePipeline3D

    vols = [rng.normal(size=(4, 8, 8)).astype(np.float32) for _ in range(2)]
    labs = [rng.integers(0, 10, size=(4, 8, 8)).astype(np.int16) for _ in range(2)]
    inds = [np.ones(9, np.float32) for _ in range(2)]
    ds = PackedDataset3D(vols, labs, inds)
    with pytest.raises(AssertionError, match="exceeds"):
        DevicePipeline3D(ds, batch_size=8, shape=(8, 8, 4))
