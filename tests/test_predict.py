"""Prediction CLI: scan in -> segmentation NRRD artifacts out."""

from pathlib import Path

import numpy as np
import pytest

from ctseg_tpu.inference.predict import (
    _scan_paths,
    predict_labels_2d,
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


def test_predict_3d_resize_checkpoint_gets_raw_hu(rng):
    """A resize-mode parity checkpoint (trained on raw HU, reference
    volumetric/predefined.py:4-7 applies no windowing) must be fed raw HU by
    the predict/serve runner — previously bucketed_swin_runner always
    windowed, handing the model out-of-distribution [0,1] inputs."""
    import jax.numpy as jnp

    from ctseg_tpu.constants import NUM_CLASSES
    from ctseg_tpu.inference.sliding_window import (
        bucketed_grid,
        bucketed_swin_runner,
        build_sliding_window_fn,
        pad_volume_dhw,
    )
    from ctseg_tpu.ops import squash_predictions

    vol = rng.normal(40, 200, size=(16, 32, 32)).astype(np.float32)
    patch = (32, 32, 16)

    def expected(tr, params, window):
        from ctseg_tpu.transforms.windowing import soft_tissue_window

        bucket, starts = bucketed_grid(vol.shape, patch, 0.5)
        run = build_sliding_window_fn(
            tr.model.apply, bucket, patch, overlap=0.5, batch_size=2,
            out_channels=NUM_CLASSES, dynamic_starts=True,
        )
        padded = pad_volume_dhw(vol, bucket, -1024.0)
        v = jnp.moveaxis(jnp.asarray(padded, jnp.float32), 0, -1)
        v = soft_tissue_window(v) if window else v[..., None]
        return np.asarray(
            squash_predictions(run(params, v, jnp.asarray(starts)))
        )

    for mode, want_window in (("resize", False), ("patch", True)):
        cfg = TrainConfig(
            filters=(2, 4, 8), num_res_units=1, batch_size=1,
            loss_fx=("CrossEntropy",), spatial_dims=3,
            input_shape=(32, 32, 16), in_channels=1,
        )
        tr = make_trainer_3d(cfg, mode=mode, patch_size=(32, 32, 16))
        params = tr.init_state().params
        bucket, starts = bucketed_grid(vol.shape, patch, 0.5)
        infer = bucketed_swin_runner(tr, bucket, patch, 0.5, 2)
        got = np.asarray(
            infer(params, jnp.asarray(pad_volume_dhw(vol, bucket, -1024.0)),
                  jnp.asarray(starts))
        )
        np.testing.assert_array_equal(got, expected(tr, params, want_window))


def test_predict_2d_caches_compiled_step(patient_dir):
    """A split of same-shape scans reuses one jitted program (previously a
    fresh jit per volume -> a 30-90s remote compile per scan)."""
    cfg = TrainConfig(
        filters=(4, 8, 16), batch_size=4, transform_degree=1, input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    vol = Volume.from_nrrd(patient_dir / "img.nrrd").as_numpy()[0]
    a = predict_labels_2d(tr, state.params, vol)
    assert len(tr._predict2d_cache) == 1
    b = predict_labels_2d(tr, state.params, vol)
    assert len(tr._predict2d_cache) == 1
    np.testing.assert_array_equal(a, b)
