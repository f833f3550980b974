"""Released-checkpoint workflow: the reference's Lightning .ckpt files load
directly in every restore-by-path surface (reference loads its released
weights in capstone/interpretability.py:28-31; files named in paths.py:46-49).
"""

import numpy as np
import pytest

from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.models.released import (
    RELEASED_FILES,
    resolve_checkpoint_arg,
    resolve_released,
)
from ctseg_tpu.testing.synth import make_patient
from ctseg_tpu.training.trainer import Trainer


@pytest.fixture
def released_dir(tmp_path):
    """A directory holding a synthesized model_large.ckpt in the released
    layout (state_dict + hyper_parameters), tiny filters."""
    import torch

    from torch_unet_oracle import ReferenceModelOracle

    torch.manual_seed(0)
    oracle = ReferenceModelOracle(
        2, 3, 10, (2, 4, 8, 16, 32), (2, 2, 2, 2), num_res_units=2,
    )
    d = tmp_path / "released"
    d.mkdir()
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
        d / "model_large.ckpt",
    )
    return d


def test_trainer_restore_accepts_lightning_ckpt(released_dir):
    trainer, state = Trainer.restore(released_dir / "model_large.ckpt")
    assert trainer.config.filters == (2, 4, 8, 16, 32)
    assert trainer.config.num_res_units == 2
    # params are usable: a forward pass runs
    import jax.numpy as jnp

    img = jnp.zeros((1, 32, 32, 3))
    out = trainer.model.apply(state.params, img)
    assert out.shape == (1, 32, 32, 10)


def test_resolve_checkpoint_arg_released(released_dir, tmp_path):
    from types import SimpleNamespace

    args = SimpleNamespace(
        checkpoint=None,
        from_released="model_l",
        released_source=str(released_dir),
    )
    path = resolve_checkpoint_arg(args)
    assert path.endswith(RELEASED_FILES["model_l"])
    # --checkpoint wins when from_released is absent
    args2 = SimpleNamespace(
        checkpoint="native_dir", from_released=None, released_source="github"
    )
    assert resolve_checkpoint_arg(args2) == "native_dir"
    # neither -> clear error
    args3 = SimpleNamespace(
        checkpoint=None, from_released=None, released_source="github"
    )
    with pytest.raises(SystemExit):
        resolve_checkpoint_arg(args3)


def test_resolve_released_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_released(str(tmp_path), "model_l", tmp_path)


def test_predict_cli_from_released(released_dir, tmp_path, monkeypatch):
    """One command segments a scan from the released weights."""
    from ctseg_tpu.inference import predict

    patient = make_patient(tmp_path / "0522c0001", shape=(6, 48, 48), seed=0)
    out = tmp_path / "pred_out"
    monkeypatch.setattr(
        "sys.argv",
        [
            "predict",
            "--from_released", "model_l",
            "--released_source", str(released_dir),
            "--input", str(patient),
            "--out", str(out),
            "--no_crop",
            "--no_structures",
        ],
    )
    predict.main()
    labels_path = out / "0522c0001" / "segmentation.nrrd"
    assert labels_path.exists()
    from ctseg_tpu.utils import nrrd_io

    labels, _ = nrrd_io.read(labels_path)
    assert labels.shape == (48, 48, 6)
    assert labels.max() <= 9


def test_interpret_from_released(released_dir, tmp_path, rng):
    """The interpretability driver consumes released weights directly."""
    from ctseg_tpu.interpret.run import run_interpretability

    trainer, state = Trainer.restore(released_dir / "model_large.ckpt")
    n = 4
    ds = PackedDataset2D(
        images=rng.normal(40, 200, size=(n, 48, 48)).astype(np.float32),
        labels=rng.integers(0, 10, size=(n, 48, 48)).astype(np.uint8),
        indicators=np.ones((n, 9), np.float32),
    )
    done = run_interpretability(
        trainer, state.params, ds, tmp_path / "interp",
        max_samples=2, min_structures=5, batch_size=2,
    )
    assert done == 2
    assert (tmp_path / "interp" / "0_gradcam.npy").exists()


def test_serve_service_from_released(released_dir):
    """The HTTP service restores from a released .ckpt (no server started)."""
    from ctseg_tpu.inference.serve import SegmentationService

    svc = SegmentationService(
        str(released_dir / "model_large.ckpt"), crop=False
    )
    assert svc.trainer.config.filters == (2, 4, 8, 16, 32)
