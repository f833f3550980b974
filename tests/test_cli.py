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
