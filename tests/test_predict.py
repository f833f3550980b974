"""Prediction CLI: scan in -> segmentation NRRD artifacts out."""

from pathlib import Path

import numpy as np
import pytest

from ctseg_tpu.inference.predict import (
    _scan_paths,
    predict_scan,
    write_artifacts,
)
from ctseg_tpu.testing.synth import make_patient
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.utils import nrrd_io
from ctseg_tpu.utils.miccai import Volume
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d


@pytest.fixture()
def patient_dir(tmp_path):
    return make_patient(tmp_path / "0522c0001", shape=(12, 48, 48), seed=0)


def test_predict_scan_2d(patient_dir):
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    vol = Volume.from_nrrd(patient_dir / "img.nrrd")
    labels = predict_scan(tr, state.params, vol, crop=False)
    assert labels.shape == vol.as_numpy()[0].shape
    assert labels.dtype == np.uint8
    assert labels.max() <= 9


def test_predict_scan_3d(patient_dir):
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=1,
        loss_fx=("CrossEntropy",), spatial_dims=3, input_shape=(32, 32, 16),
        in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch", patch_size=(32, 32, 16))
    state = tr.init_state()
    vol = Volume.from_nrrd(patient_dir / "img.nrrd")
    labels = predict_scan(
        tr, state.params, vol, crop=False, patch_size=(32, 32, 16)
    )
    assert labels.shape == vol.as_numpy()[0].shape
    assert labels.max() <= 9


def test_predict_3d_bucketed_runner_reuse(tmp_path):
    """Scans whose depths fall in one window-grid bucket share a single
    cached runner on the trainer (no per-shape giant recompiles in the
    predict CLI / HTTP server), and warming a second shape leaves the
    first scan's prediction bit-identical."""
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=1,
        loss_fx=("CrossEntropy",), spatial_dims=3, input_shape=(32, 32, 16),
        in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch", patch_size=(32, 32, 16))
    state = tr.init_state()

    vols = [
        Volume.from_nrrd(
            make_patient(tmp_path / f"0522c000{i}", shape=(d, 48, 48), seed=i)
            / "img.nrrd"
        )
        for i, d in enumerate((17, 20, 23))  # one depth bucket (24)
    ]
    first = predict_scan(
        tr, state.params, vols[0], crop=False, patch_size=(32, 32, 16)
    )
    for v in vols[1:]:
        labels = predict_scan(
            tr, state.params, v, crop=False, patch_size=(32, 32, 16)
        )
        assert labels.shape == v.as_numpy()[0].shape
    assert len(tr._swin_cache) == 1
    again = predict_scan(
        tr, state.params, vols[0], crop=False, patch_size=(32, 32, 16)
    )
    np.testing.assert_array_equal(first, again)


def test_write_artifacts_round_trip(tmp_path, rng):
    labels = rng.integers(0, 10, size=(5, 16, 16)).astype(np.uint8)
    header = {"space": "left-posterior-superior",
              "space directions": np.diag([1.5, 1.5, 3.0])}
    write_artifacts(tmp_path / "p1", labels, header)

    seg, hdr = nrrd_io.read(tmp_path / "p1" / "segmentation.nrrd")
    assert seg.shape == (16, 16, 5)  # (H, W, D) like PDDCA inputs
    np.testing.assert_array_equal(np.transpose(seg, (2, 0, 1)), labels)
    np.testing.assert_allclose(
        np.asarray(hdr["space directions"]), np.diag([1.5, 1.5, 3.0])
    )
    masks = sorted((tmp_path / "p1" / "structures").glob("*.nrrd"))
    assert len(masks) == 9
    brain, _ = nrrd_io.read(tmp_path / "p1" / "structures" / "BrainStem.nrrd")
    np.testing.assert_array_equal(
        np.transpose(brain, (2, 0, 1)), (labels == 1).astype(np.uint8)
    )


def test_scan_paths_variants(tmp_path):
    p1 = make_patient(tmp_path / "root" / "0522c0001", shape=(6, 24, 24), seed=1)
    p2 = make_patient(tmp_path / "root" / "0522c0002", shape=(6, 24, 24), seed=2)

    assert [n for n, _ in _scan_paths(p1)] == ["0522c0001"]
    assert [n for n, _ in _scan_paths(p1 / "img.nrrd")] == ["0522c0001"]
    assert [n for n, _ in _scan_paths(tmp_path / "root")] == [
        "0522c0001", "0522c0002",
    ]
    with pytest.raises(FileNotFoundError):
        list(_scan_paths(tmp_path))
