"""Data layer: split parity, domain model, converters, packed datasets."""

import numpy as np
import pytest

from ctseg_tpu.constants import STRUCTURES
from ctseg_tpu.data.datasets import (
    PackedDataset2D,
    PackedDataset3D,
    _squash_masks_np,
    pack_slices,
    pack_volumes,
)
from ctseg_tpu.data.download import split_patient_ids
from ctseg_tpu.data.process_miccai import convert_to_2d, convert_to_3d
from ctseg_tpu.testing.synth import make_dataset, make_patient
from ctseg_tpu.utils import miccai


def test_split_is_deterministic_and_sized():
    """The seed-42 split algorithm: shuffle sorted 1-479 ids, first 8 valid.
    Exact-parity check: same algorithm as reference download.py:69-81."""
    ids = list(range(1, 34)) + list(range(555, 570))
    split = split_patient_ids(ids)
    assert len(split["train"]) == 25
    assert len(split["valid"]) == 8
    assert len(split["test"]) == 15
    # deterministic across calls
    assert split == split_patient_ids(list(reversed(ids)))
    # reproduces numpy's rng(42) Fisher-Yates on the sorted list
    rng = np.random.default_rng(seed=42)
    expected = sorted(i for i in ids if i < 480)
    rng.shuffle(expected)
    assert split["valid"] == expected[:8]
    assert split["train"] == expected[8:]


def test_patient_domain_model(tmp_path):
    pdir = make_patient(
        tmp_path / "0522c0001", shape=(12, 40, 40),
        structures=["BrainStem", "Chiasm"], seed=3,
    )
    patient = miccai.Patient(pdir)
    assert patient.image.data.shape == (1, 12, 40, 40)
    assert patient.num_slides == 12
    assert patient.structures["BrainStem"] is not None
    assert patient.structures["Mandible"] is None
    assert patient.landmarks is not None and len(patient.landmarks) == 3
    np.testing.assert_allclose(patient.image.spacing, [3.0, 1.1, 1.1])

    combined = patient.combine_segmentation_masks(["BrainStem", "Chiasm"])
    assert combined.shape == (1, 12, 40, 40)
    assert combined.max() == 1


def test_patient_crop(tmp_path):
    pdir = make_patient(tmp_path / "0522c0002", shape=(20, 512, 512), seed=1)
    patient = miccai.Patient(pdir)
    patient.crop_data()  # default boundaries for 512x512 scans
    # x:(120,400) y:(55,335) z: ceil(0.32*20)=7 .. ceil(0.99*20)=20
    assert patient.image.data.shape == (1, 13, 280, 280)


def test_convert_and_pack_2d(tmp_path):
    make_dataset(tmp_path / "raw", n_patients=2, shape=(10, 48, 48))
    convert_to_2d(tmp_path / "raw", tmp_path / "out", crop=False)
    ds = pack_slices(tmp_path / "out")
    assert len(ds) > 0
    assert ds.spatial_shape == (48, 48)
    assert ds.labels.max() <= 9 and ds.labels.min() >= 0
    # every packed slice has at least one structure (empty dropped)
    assert (ds.labels.reshape(len(ds), -1).max(axis=1) > 0).all()
    # round trip
    ds.save(tmp_path / "packed.npz")
    back = PackedDataset2D.load(tmp_path / "packed.npz")
    np.testing.assert_array_equal(back.images, ds.images)
    np.testing.assert_array_equal(back.labels, ds.labels)
    np.testing.assert_array_equal(back.indicators, ds.indicators)
    assert back.names == ds.names


def test_convert_and_pack_3d(tmp_path):
    make_dataset(tmp_path / "raw", n_patients=2, shape=(10, 48, 48))
    convert_to_3d(tmp_path / "raw", tmp_path / "out", crop=False)
    ds = pack_volumes(tmp_path / "out")
    assert len(ds) == 2
    assert ds.images[0].shape == (10, 48, 48)
    ds.save(tmp_path / "packed3d.npz")
    back = PackedDataset3D.load(tmp_path / "packed3d.npz")
    np.testing.assert_array_equal(back.images[1], ds.images[1])


def test_volume_spacing_matches_axis_permutation(tmp_path):
    """Volume.spacing must be permuted exactly like the data axes.

    NRRD raw axes are (H, W, D); load_nrrd_as_array transposes to
    (C, D, H, W), so spacing must come out (s_D, s_H, s_W). Distinct
    spacings AND distinct extents per axis pin the mapping — a plain
    diagonal reversal (the historical bug) would swap the in-plane
    spacings, which isotropic-in-plane fixtures cannot detect."""
    from ctseg_tpu.utils import nrrd_io

    img = np.zeros((4, 6, 8), np.int16)  # (H, W, D) raw file layout
    nrrd_io.write(
        tmp_path / "v.nrrd", img,
        header={"space directions": np.diag([10.0, 20.0, 30.0])},
    )
    vol = miccai.Volume.from_nrrd(tmp_path / "v.nrrd")
    assert vol.data.shape == (1, 8, 4, 6)  # (C, D, H, W)
    # z-first spacing: D axis (extent 8) has spacing 30, H (4) has 10,
    # W (6) has 20.
    np.testing.assert_allclose(vol.spacing, [30.0, 10.0, 20.0])


def test_pack_3d_carries_voxel_spacing(tmp_path):
    """Spacing flows NRRD header -> converter npz -> packed file -> load,
    z-first (the reference's npz contract drops it; HD95-in-mm needs it).
    Synth patients have space directions diag(1.1, 1.1, 3.0) in (H, W, D),
    i.e. (3.0, 1.1, 1.1) z-first."""
    make_dataset(tmp_path / "raw", n_patients=2, shape=(8, 32, 32))
    convert_to_3d(tmp_path / "raw", tmp_path / "out", crop=False)
    ds = pack_volumes(tmp_path / "out")
    assert ds.spacings is not None and len(ds.spacings) == 2
    np.testing.assert_allclose(ds.spacings[0], [3.0, 1.1, 1.1], rtol=1e-6)
    ds.save(tmp_path / "packed3d.npz")
    back = PackedDataset3D.load(tmp_path / "packed3d.npz")
    assert back.spacings is not None
    np.testing.assert_allclose(back.spacings[1], ds.spacings[1])


def test_pack_2d_carries_inplane_spacing(tmp_path):
    """In-plane spacing flows NRRD header -> per-slice npz -> packed file
    -> load, as (row, col) = the (y, x) tail of the z-first patient
    spacing. Synth patients have space directions diag(1.1, 1.1, 3.0) in
    (H, W, D) => (1.1, 1.1) in-plane."""
    make_dataset(tmp_path / "raw", n_patients=2, shape=(8, 32, 32))
    convert_to_2d(tmp_path / "raw", tmp_path / "out", crop=False)
    ds = pack_slices(tmp_path / "out")
    assert ds.spacings is not None and ds.spacings.shape == (len(ds), 2)
    np.testing.assert_allclose(ds.spacings[0], [1.1, 1.1], rtol=1e-6)
    ds.save(tmp_path / "packed2d.npz")
    back = PackedDataset2D.load(tmp_path / "packed2d.npz")
    assert back.spacings is not None
    np.testing.assert_allclose(back.spacings, ds.spacings)
    # concatenate keeps spacing only when every part carries it
    both = PackedDataset2D.concatenate(ds, back)
    assert both.spacings is not None and len(both.spacings) == 2 * len(ds)
    legacy = PackedDataset2D(
        images=ds.images, labels=ds.labels, indicators=ds.indicators
    )
    assert PackedDataset2D.concatenate(ds, legacy).spacings is None


def test_pack_2d_mixed_spacing_drops_to_voxel(tmp_path):
    """A split where any slice npz lacks spacing packs with spacings=None
    (and warns) — never mixing units under one mm label."""
    make_dataset(tmp_path / "raw", n_patients=1, shape=(8, 32, 32))
    convert_to_2d(tmp_path / "raw", tmp_path / "out", crop=False)
    paths = sorted((tmp_path / "out").glob("*.npz"))
    with np.load(paths[0]) as z:
        stripped = {k: z[k] for k in z.files if k != "spacing"}
    np.savez(paths[0], **stripped)
    with pytest.warns(UserWarning, match="pack_slices: no in-plane"):
        ds = pack_slices(tmp_path / "out")
    assert ds.spacings is None


def test_pack_3d_legacy_without_spacing(tmp_path):
    """Per-patient npz without a spacing key (reference-written files) and
    legacy packed files load with spacings=None -> voxel-unit metrics."""
    np.savez(
        tmp_path / "p0.npz",
        image=np.zeros((1, 4, 8, 8), np.float32),
        masks=np.concatenate(
            [np.ones((1, 4, 8, 8), np.uint8), np.zeros((8, 4, 8, 8), np.uint8)]
        ),
        mask_indicator=np.ones(9),
    )
    ds = pack_volumes(tmp_path)
    assert ds.spacings is None
    ds.save(tmp_path / "packed.npz")
    assert PackedDataset3D.load(tmp_path / "packed.npz").spacings is None


def test_pack_3d_mixed_spacing_refuses_mixed_units(tmp_path):
    """A split where only SOME volumes carry spacing packs with
    spacings=None and warns naming the offenders: back-filling unit spacing
    would let HD95 average voxel-unit distances into a table labeled mm."""
    common = dict(
        masks=np.concatenate(
            [np.ones((1, 4, 8, 8), np.uint8), np.zeros((8, 4, 8, 8), np.uint8)]
        ),
        mask_indicator=np.ones(9),
    )
    np.savez(
        tmp_path / "p0.npz", image=np.zeros((1, 4, 8, 8), np.float32),
        spacing=np.array([3.0, 1.1, 1.1], np.float32), **common,
    )
    np.savez(
        tmp_path / "p1.npz", image=np.zeros((1, 4, 8, 8), np.float32),
        **common,
    )
    with pytest.warns(UserWarning, match="p1.npz"):
        ds = pack_volumes(tmp_path)
    assert ds.spacings is None


def test_squash_masks_np_overlap():
    masks = np.zeros((9, 4, 4), np.uint8)
    masks[0, 0, 0] = 1  # class 1
    masks[4, 0, 0] = 1  # class 5 overlaps -> wins
    masks[8, 1, 1] = 1  # class 9
    lab = _squash_masks_np(masks)
    assert lab[0, 0] == 5
    assert lab[1, 1] == 9
    assert lab[2, 2] == 0


def test_missing_structure_indicator(tmp_path):
    make_patient(
        tmp_path / "0522c0009", shape=(8, 32, 32),
        structures=[s for s in STRUCTURES if s != "Chiasm"], seed=5,
    )
    convert_to_2d(tmp_path, tmp_path / "out", crop=False)
    ds = pack_slices(tmp_path / "out")
    assert (ds.indicators[:, 1] == 0).all()  # Chiasm column


def test_pack_3d_preserves_integer_hu(tmp_path):
    """pack_volumes keeps integer image dtypes (int16 PDDCA HU -> half the
    packed bytes and half the eval-chunk upload) and still normalizes
    floats to float32; the npz save/load round-trip preserves both."""
    common = dict(
        masks=np.zeros((9, 4, 8, 8), np.uint8),
        mask_indicator=np.ones(9),
        spacing=np.array([3.0, 1.1, 1.1], np.float32),
    )
    common["masks"][0, 1, 2, 2] = 1
    np.savez(
        tmp_path / "p0.npz",
        image=np.full((1, 4, 8, 8), -1024, np.int16), **common,
    )
    np.savez(
        tmp_path / "p1.npz",
        image=np.zeros((1, 4, 8, 8), np.float64), **common,
    )
    ds = pack_volumes(tmp_path)
    assert ds.images[0].dtype == np.int16
    assert ds.images[1].dtype == np.float32
    ds.save(tmp_path / "packed.npz")
    back = PackedDataset3D.load(tmp_path / "packed.npz")
    assert back.images[0].dtype == np.int16
    assert back.images[1].dtype == np.float32
    np.testing.assert_array_equal(back.images[0], ds.images[0])
