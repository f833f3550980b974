"""Evaluation module: dataset-level Dice aggregation + 3D sliding-window."""

import numpy as np

from ctseg_tpu.data.datasets import PackedDataset2D, PackedDataset3D
from ctseg_tpu.inference.evaluate import (
    evaluate_2d,
    evaluate_3d_sliding_window,
    format_table,
)
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d


def _packed2d(rng, n=16, hw=64):
    images = rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32)
    labels = rng.integers(0, 10, size=(n, hw, hw)).astype(np.uint8)
    ind = np.ones((n, 9), np.float32)
    return PackedDataset2D(images=images, labels=labels, indicators=ind)


def test_evaluate_2d(rng):
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng)
    result = evaluate_2d(tr, state.params, ds, batch_size=8)
    assert 0.0 <= result["mean_dice"] <= 1.0
    assert len(result["per_structure_dice"]) == 9
    assert result["num_slices"] == 16
    table = format_table(result)
    assert "Mean" in table and "BrainStem" in table


def test_evaluate_3d_sliding_window(rng):
    images = [rng.normal(40, 200, size=(20, 48, 48)).astype(np.float32)
              for _ in range(2)]
    labels = [rng.integers(0, 10, size=(20, 48, 48)).astype(np.uint8)
              for _ in range(2)]
    inds = [np.ones(9, np.float32)] * 2
    ds = PackedDataset3D(images, labels, inds)

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("Focal", "Dice"), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    result = evaluate_3d_sliding_window(
        tr, state.params, ds, patch_size=(32, 32, 16), batch_size=2,
        with_hd95=True,
    )
    assert result["num_volumes"] == 2
    assert 0.0 <= result["mean_dice"] <= 1.0
    assert result["vols_per_min"] > 0
    assert len(result["per_structure_hd95"]) == 9


def test_presets():
    from ctseg_tpu.models.presets import MODEL_3D, MODEL_L, MODEL_M, PRESETS

    assert MODEL_L.num_res_units == 2 and MODEL_L.loss_fx == ("Focal", "Dice")
    assert MODEL_M.num_res_units == 1 and MODEL_M.mixup
    assert "Boundary" in MODEL_M.loss_fx
    assert MODEL_3D.spatial_dims == 3
    assert set(PRESETS) == {"model_l", "model_m", "model_3d"}


def test_examples_callback(tmp_path, rng):
    from ctseg_tpu.training.callbacks import ExamplesLoggingCallback

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=6)
    cb = ExamplesLoggingCallback(ds, tmp_path, every_n_epochs=2, max_examples=3)
    cb(tr, state, epoch=0)  # epoch 1: not a multiple of 2
    assert not any(tmp_path.iterdir())
    cb(tr, state, epoch=1)  # epoch 2: fires
    out = tmp_path / "epoch_0002"
    assert out.is_dir()
    assert len(list(out.glob("*.npy"))) == 3
