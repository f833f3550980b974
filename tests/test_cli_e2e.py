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
    """`parity_report.py --from_released model_l --released_source <dir>`
    (the flag pair shared with predict/serve/evaluate/interpret): a
    synthesized reference Lightning checkpoint (released-file layout,
    model_large.ckpt) is resolved, imported through
    load_reference_checkpoint, and evaluated on the packed test split —
    the no-retraining parity path, runnable today."""
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
        ["parity_report.py", "--from_released", "model_l",
         "--released_source", str(released),
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


def test_cli_train3d_resume(tmp_path):
    """train_3d --resume continues from a checkpoint (the preemption-resume
    contract): the first epoch logged after resume starts from the restored
    step, not from zero."""
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.volumetric import trainer3d
    from ctseg_tpu.volumetric.pipeline3d import DevicePipeline3D

    rng = np.random.default_rng(5)
    shape = (12, 48, 48)
    for split, n in (("train", 4), ("valid", 2)):
        images = [rng.normal(40, 200, size=shape).astype(np.float32)
                  for _ in range(n)]
        labels = [rng.integers(0, 10, size=shape).astype(np.uint8)
                  for _ in range(n)]
        inds = [np.ones(9, np.float32) for _ in range(n)]
        PackedDataset3D(images, labels, inds).save(
            tmp_path / "d3" / f"{split}_packed.npz"
        )

    resize = (32, 32, 16)
    args = SimpleNamespace(
        filters=[2, 4, 8, 16, 32], lr=1e-3, batch_size=2,
        loss_fx=["CrossEntropy"], exclude_missing=False, max_epochs=2,
        seed=0, bf16=False, data_dir=str(tmp_path / "d3"),
        checkpoint_dir=str(tmp_path / "run3d"), use_wandb=False,
        experiment_name="t", n_devices=2, spatial_devices=1,
        resize_shape=list(resize), resume=None, use_full_data=False,
    )

    # simulate a preempted earlier run: a saved state at step 3
    from ctseg_tpu.training.trainer import TrainConfig

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=2, transform_degree=0,
        batch_size=2, loss_fx=("CrossEntropy",), spatial_dims=3,
        input_shape=resize, in_channels=1, plateau_patience=10_000, seed=0,
    )
    tr = trainer3d.make_trainer_3d(cfg, mode="resize")
    state = tr.init_state()
    import jax

    pipe = DevicePipeline3D(
        PackedDataset3D.load(tmp_path / "d3" / "train_packed.npz"), 2,
        shape=resize,
    )
    for batch in pipe.epoch(jax.random.key(0)):
        state, _ = tr._train_step(state, batch, jax.random.key(1))
    saved_step = int(state.step)
    assert saved_step > 0
    tr.save(tmp_path / "ckpt3d", state)

    args.resume = str(tmp_path / "ckpt3d")
    trainer3d.run_3d_training(args)
    metrics = [
        json.loads(l)
        for l in (tmp_path / "run3d" / "metrics.jsonl").read_text().splitlines()
    ]
    train_steps = [m["step"] for m in metrics if "train/loss/total" in m
                   or "train/loss/CrossEntropy" in m]
    assert train_steps and min(train_steps) > saved_step
    # epochs are a TOTAL: 1 epoch done before the save + max_epochs=2 means
    # exactly ONE more epoch (2 steps) runs after resume, not two.
    assert max(train_steps) == 2 * saved_step


def test_cli_train3d_patch_mode(tmp_path):
    """train_3d --volumetric_mode patch drives the north-star configuration
    (native-resolution random patches, windowing + flips) end to end: train
    steps run, metrics land, and the checkpoint restores as a patch-mode
    trainer usable for sliding-window inference."""
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.training.trainer import Trainer
    from ctseg_tpu.volumetric import trainer3d

    rng = np.random.default_rng(7)
    for split, n in (("train", 3), ("valid", 2)):
        # non-uniform depths exercise the depth-padded patch sampler
        images = [rng.normal(40, 200, size=(10 + 2 * i, 48, 48)).astype(
            np.float32) for i in range(n)]
        labels = [rng.integers(0, 10, size=img.shape).astype(np.uint8)
                  for img in images]
        inds = [np.ones(9, np.float32) for _ in range(n)]
        PackedDataset3D(images, labels, inds).save(
            tmp_path / "d3" / f"{split}_packed.npz"
        )

    args = SimpleNamespace(
        filters=[2, 4, 8, 16], lr=1e-3, batch_size=2,
        loss_fx=["Focal", "Dice"], exclude_missing=False, max_epochs=2,
        seed=0, bf16=False, data_dir=str(tmp_path / "d3"),
        checkpoint_dir=str(tmp_path / "runp"), use_wandb=False,
        experiment_name="t", n_devices=2, spatial_devices=1,
        resize_shape=None, resume=None, use_full_data=False,
        volumetric_mode="patch", patch_size=[32, 32, 8], steps_per_epoch=3,
    )
    trainer3d.run_3d_training(args)

    metrics = [
        json.loads(l)
        for l in (tmp_path / "runp" / "metrics.jsonl").read_text().splitlines()
    ]
    train_rows = [m for m in metrics if "train/loss/total" in m]
    val_rows = [m for m in metrics if "val/dice/mean" in m]
    # 2 epochs x 3 patch steps
    assert [m["step"] for m in train_rows] == [3, 6]
    assert len(val_rows) == 2

    # periodic saves never fired (epoch 25 cadence); save+restore the
    # patch-mode trainer explicitly and check the mode round-trips.
    cfg_path = tmp_path / "ckptp"
    tr = trainer3d.make_trainer_3d(
        trainer3d.TrainConfig(
            filters=(2, 4, 8, 16), num_res_units=2, transform_degree=0,
            batch_size=2, loss_fx=("Focal", "Dice"), spatial_dims=3,
            input_shape=(32, 32, 8), in_channels=1, plateau_patience=10_000,
            volumetric_mode="patch",
        ),
        mode="patch", patch_size=(32, 32, 8),
    )
    tr.save(cfg_path, tr.init_state())
    restored, _ = Trainer.restore(cfg_path)
    assert restored.config.volumetric_mode == "patch"
    assert tuple(restored.config.input_shape) == (32, 32, 8)
