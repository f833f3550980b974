"""End-to-end CLI run on tiny synthetic data (guards the full train CLI
lifecycle: load packed data, fit with val loop, save model, run test)."""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from ctseg_tpu.data.datasets import PackedDataset2D


@pytest.fixture
def tiny_data_dir(tmp_path, rng):
    for split, n in (("train", 24), ("valid", 8), ("test", 8)):
        images = rng.normal(40, 200, size=(n, 48, 48)).astype(np.float32)
        labels = rng.integers(0, 10, size=(n, 48, 48)).astype(np.uint8)
        ind = np.ones((n, 9), np.float32)
        PackedDataset2D(images, labels, ind).save(
            tmp_path / "data" / f"{split}_packed.npz"
        )
    return tmp_path / "data"


def _args(tiny_data_dir, tmp_path, **kw):
    base = dict(
        batch_size=8,
        transform_degree=1,
        filters=[2, 4, 8, 16, 32],
        use_res_units=True,
        downsample=False,
        lr=1e-3,
        loss_fx=["Focal", "Dice"],
        exclude_missing=False,
        use_full_data=False,
        max_epochs=1,
        seed=0,
        bf16=False,
        data_dir=str(tiny_data_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        use_wandb=False,
        experiment_name="test",
        n_devices=None,
        preset=None,
        profile=False,
        resume=None,
    )
    base.update(kw)
    base["input_size"] = base.get("input_size", 48)
    return SimpleNamespace(**base)


def test_cli_train_runs_one_epoch(tiny_data_dir, tmp_path, monkeypatch):
    from ctseg_tpu.training import cli

    # shrink the transform to the data size via the preset-free path
    import ctseg_tpu.training.trainer as trainer_mod

    orig = trainer_mod.TrainConfig

    def small_cfg(**kw):
        kw.setdefault("input_size", 48)
        return orig(**kw)

    monkeypatch.setattr(cli, "TrainConfig", small_cfg)
    args = _args(tiny_data_dir, tmp_path)
    cli.run_2d(args, mixup=False)
    metrics = [
        json.loads(l)
        for l in (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val/dice/mean" in m for m in metrics)


def test_cli_train_full_data_saves_and_tests(
    tiny_data_dir, tmp_path, monkeypatch
):
    from ctseg_tpu.training import cli
    import ctseg_tpu.training.trainer as trainer_mod

    orig = trainer_mod.TrainConfig

    def small_cfg(**kw):
        kw.setdefault("input_size", 48)
        return orig(**kw)

    monkeypatch.setattr(cli, "TrainConfig", small_cfg)
    monkeypatch.setenv("CTSEG_DATA_STORAGE", str(tmp_path / "storage"))
    # paths module caches DEFAULT_DATA_STORAGE at import; patch directly.
    monkeypatch.setattr(cli, "DEFAULT_DATA_STORAGE", tmp_path / "storage")
    args = _args(tiny_data_dir, tmp_path, use_full_data=True)
    cli.run_2d(args, mixup=False)
    assert (tmp_path / "storage" / "model_large" / "state.msgpack").exists()
    hp = json.loads(
        (tmp_path / "storage" / "model_large" / "hparams.json").read_text()
    )
    assert hp["filters"] == [2, 4, 8, 16, 32]


def test_parity_report_from_released(tiny_data_dir, tmp_path, monkeypatch):
    """`parity_report.py --from_released <dir>`: a synthesized reference
    Lightning checkpoint (released-file layout, model_large.ckpt) is
    resolved, imported through load_reference_checkpoint, and evaluated on
    the packed test split — the no-retraining parity path, runnable today."""
    import torch

    import parity_report
    from torch_unet_oracle import ReferenceModelOracle

    torch.manual_seed(0)
    oracle = ReferenceModelOracle(
        2, 3, 10, (2, 4, 8, 16, 32), (2, 2, 2, 2), num_res_units=2,
    )
    released = tmp_path / "released"
    released.mkdir()
    torch.save(
        {
            "state_dict": oracle.state_dict(),
            "hyper_parameters": {
                "batch_size": 8,
                "transform_degree": 1,
                "filters": [2, 4, 8, 16, 32],
                "use_res_units": True,
                "downsample": False,
                "lr": 1e-3,
                "loss_fx": ["Focal", "Dice"],
                "exclude_missing": False,
            },
        },
        released / "model_large.ckpt",
    )
    out = tmp_path / "parity_out"
    monkeypatch.setattr(
        "sys.argv",
        ["parity_report.py", "--models", "model_l",
         "--from_released", str(released),
         "--data_dir", str(tiny_data_dir), "--out_dir", str(out)],
    )
    parity_report.main()
    payload = json.loads((out / "parity_report.json").read_text())
    res = payload["models"]["model_l"]["result"]
    assert res["num_slices"] == 8
    assert set(res["per_structure_dice"]) == set(
        parity_report.REFERENCE_DICE["model_l"]
    )
    assert (out / "parity_report.md").exists()


def test_parity_report_from_released_missing_file(tmp_path):
    import parity_report
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        parity_report.resolve_released(str(tmp_path), "model_l", tmp_path)
