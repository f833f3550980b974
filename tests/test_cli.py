"""CLI argparse surfaces: flag parity with the reference + preset wiring."""

import sys
from unittest import mock

from ctseg_tpu.training import cli


def _parse(argv):
    with mock.patch.object(sys, "argv", ["cli"] + argv):
        # Build the parser the same way main() does, but only parse.
        from argparse import ArgumentParser

        parser = ArgumentParser()
        sub = parser.add_subparsers(dest="command", required=True)
        for name in ("train", "train_mixup", "train_3d"):
            p = sub.add_parser(name)
            cli._add_common_args(p)
        return parser.parse_args(argv)


def test_reference_flag_surface():
    """Every reference argparse flag exists (base_trainer.py:150-209)."""
    args = _parse(
        [
            "train", "--batch_size", "64", "--transform_degree", "2",
            "--filters", "8", "16", "32", "64", "128", "--use_res_units",
            "--downsample", "--lr", "0.01", "--loss_fx", "Focal", "Dice",
            "--exclude_missing", "--use_full_data", "--max_epochs", "5",
            "--use_wandb", "--experiment_name", "x",
        ]
    )
    assert args.batch_size == 64
    assert args.filters == [8, 16, 32, 64, 128]
    assert args.use_res_units and args.downsample and args.exclude_missing
    assert args.loss_fx == ["Focal", "Dice"]


def test_config_from_args_res_units():
    args = _parse(["train", "--use_res_units"])
    cfg = cli._config_from_args(args, mixup=False)
    assert cfg.num_res_units == 2
    cfg_m = cli._config_from_args(args, mixup=True)
    assert cfg_m.num_res_units == 1 and cfg_m.mixup


def test_preset_overrides():
    args = _parse(["train", "--preset", "model_m", "--max_epochs", "7"])
    cfg = cli._config_from_args(args, mixup=False)
    assert cfg.mixup and cfg.num_res_units == 1
    assert cfg.loss_fx == ("Boundary", "Dice", "Focal")
    assert cfg.epochs == 7


def test_bf16_flag():
    args = _parse(["train", "--bf16"])
    cfg = cli._config_from_args(args, mixup=False)
    assert cfg.compute_dtype == "bfloat16"


def test_preset_dimension_mismatch_rejected():
    """A 3D preset on the 2D entry points (and vice versa) exits with a
    clear error instead of silently training the wrong stack."""
    import pytest

    args = _parse(["train", "--preset", "model_3d"])
    with pytest.raises(SystemExit):
        cli._config_from_args(args, mixup=False)


def test_train_3d_preset_builds_parity_config(tmp_path):
    """train_3d --preset model_3d trains the reference-parity configuration
    (CrossEntropy, batch 1), not the shared CLI defaults (Focal+Dice, 128)."""
    import numpy as np

    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.volumetric import trainer3d

    captured = {}

    class _StubTrainer:
        def __init__(self, config):
            self.config = config

        def init_state(self):
            return None

    def fake_make_trainer_3d(config, mode="resize", patch_size=None, mesh=None):
        # The real builder is too heavy for this test (the preset is the
        # 95M-param reference model); capture the config it would train.
        captured["config"] = config
        return _StubTrainer(config)

    args = _parse(
        ["train_3d", "--preset", "model_3d", "--checkpoint_dir",
         str(tmp_path), "--data_dir", str(tmp_path)]
    )
    vols = [np.zeros((4, 8, 8), np.float32) for _ in range(8)]
    labs = [np.zeros((4, 8, 8), np.int16) for _ in range(8)]
    inds = [np.ones(9, np.float32) for _ in range(8)]
    ds = PackedDataset3D(vols, labs, inds)
    with mock.patch.object(PackedDataset3D, "load", return_value=ds), \
         mock.patch.object(trainer3d, "make_trainer_3d",
                           fake_make_trainer_3d), \
         mock.patch("ctseg_tpu.training.cli.fit_and_finalize",
                    lambda *a, **k: None), \
         mock.patch.object(trainer3d, "DevicePipeline3D"):
        trainer3d.run_3d_training(args)
    cfg = captured["config"]
    assert cfg.loss_fx == ("CrossEntropy",)
    assert cfg.batch_size == 1
    assert cfg.spatial_dims == 3
    assert tuple(cfg.input_shape) == (256, 256, 96)


def test_train_3d_rejects_2d_preset():
    import pytest

    from ctseg_tpu.volumetric import trainer3d

    args = _parse(["train_3d", "--preset", "model_l"])
    with pytest.raises(SystemExit):
        trainer3d.run_3d_training(args)
