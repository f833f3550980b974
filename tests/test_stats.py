"""Dataset-statistics derivations (ctseg_tpu/data/stats.py): each published
constant's derivation is checked against a hand-computed oracle on synthetic
data (reference formulas: sample_dataset_2d.ipynb cells 3-4,
miccai_batch_exploration.ipynb cells 3 and 10-12)."""

import json

import numpy as np
import pytest

from ctseg_tpu.constants import STRUCTURES
from ctseg_tpu.data.stats import (
    annotation_counts,
    class_pixel_counts,
    class_weights,
    crop_envelope,
    derive_all,
    stacked_window_stats,
)


@pytest.fixture
def labels(rng):
    labs = np.zeros((12, 32, 32), np.uint8)
    labs[0, :4, :4] = 1  # 16 px BrainStem in slice 0
    labs[1, :2, :2] = 2  # 4 px Chiasm in slice 1
    labs[2, :8, :8] = 1  # 64 px BrainStem in slice 2
    labs[2, 20:22, 20:23] = 9  # 6 px Submandibular_R in slice 2
    return labs


def test_class_pixel_counts(labels):
    counts = class_pixel_counts(labels)
    assert counts[1] == 16 + 64
    assert counts[2] == 4
    assert counts[9] == 6
    assert counts.sum() == labels.size


def test_class_weights_formula(labels):
    # absent classes are excluded (weight 0) with a warning, so the present
    # classes keep the notebook's relative proportions.
    with pytest.warns(UserWarning, match="no pixels"):
        w = class_weights(labels)
    fg = 16 + 64 + 4 + 6
    raw = {"BrainStem": fg / 80, "Chiasm": fg / 4, "Submandibular_R": fg / 6}
    total = sum(raw.values())
    assert w["Background"] == 1e-10
    for s in STRUCTURES:
        assert w[s] == pytest.approx(raw.get(s, 0.0) / total)
    assert sum(w[s] for s in STRUCTURES) == pytest.approx(1.0)


def test_class_weights_all_present_no_warning(rng):
    import warnings

    labs = rng.integers(0, 10, size=(4, 24, 24)).astype(np.uint8)
    assert (np.bincount(labs.ravel(), minlength=10)[1:] > 0).all()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w = class_weights(labs)
    assert sum(w[s] for s in STRUCTURES) == pytest.approx(1.0)


def test_annotation_counts(labels):
    counts = annotation_counts(labels)
    assert counts[0] == 2  # BrainStem in slices 0 and 2
    assert counts[1] == 1  # Chiasm in slice 1
    assert counts[8] == 1  # Submandibular_R in slice 2
    assert counts[2:8].sum() == 0


def test_window_shift_matches_production_transform(rng):
    """Independent oracle: the numpy shift used by the stats derivations
    must equal the production jnp apply_window (transforms/windowing.py,
    itself differential-tested against the reference transforms_2d.py:
    shift normalizes by the FIXED window bounds, not the data min/max)."""
    import jax.numpy as jnp

    from ctseg_tpu.constants import WINDOW_ORDER, WINDOWING_CONFIG
    from ctseg_tpu.data.stats import _window_clip_shift
    from ctseg_tpu.transforms.windowing import apply_window

    img = rng.normal(100, 700, size=(16, 16))
    for wname in WINDOW_ORDER:
        width, level = WINDOWING_CONFIG[wname]
        ours = _window_clip_shift(img, width, level)
        prod = np.asarray(apply_window(jnp.asarray(img), width, level))
        np.testing.assert_allclose(ours, prod, rtol=1e-6, atol=1e-7)
    # hand-computed: soft_tissue (350, 20) -> bounds [-155, 195]; a pixel
    # at HU=20 sits at (20+155)/350 = 0.5 of the window
    assert _window_clip_shift(np.full((2, 2), 20.0), 350, 20)[0, 0] == (
        pytest.approx(0.5, abs=1e-6)
    )


def test_stacked_window_stats_oracle(rng):
    """per_item=False must equal the direct global mean/std of the
    windowed+shifted values (oracle built on the PRODUCTION apply_window);
    per_item=True matches the notebook's within-item pooled std
    (<= global std)."""
    import jax.numpy as jnp

    from ctseg_tpu.constants import WINDOW_ORDER, WINDOWING_CONFIG
    from ctseg_tpu.transforms.windowing import apply_window

    imgs = rng.normal(100, 700, size=(5, 16, 16))
    mean_g, std_g = stacked_window_stats(imgs, per_item=False)
    mean_p, std_p = stacked_window_stats(imgs, per_item=True)
    for k, wname in enumerate(WINDOW_ORDER):
        width, level = WINDOWING_CONFIG[wname]
        shifted = np.asarray(apply_window(jnp.asarray(imgs), width, level))
        assert mean_g[k] == pytest.approx(shifted.mean(), rel=1e-6)
        assert std_g[k] == pytest.approx(shifted.std(), rel=1e-6)
        assert mean_p[k] == pytest.approx(shifted.mean(), rel=1e-6)
        within = np.sqrt(
            sum(s.var() * s.size for s in shifted) / shifted.size
        )
        assert std_p[k] == pytest.approx(within, rel=1e-6)
        assert std_p[k] <= std_g[k] + 1e-12


def test_crop_envelope_contains_all_structures(tmp_path):
    from ctseg_tpu.testing.synth import make_patient
    from ctseg_tpu.utils.miccai import Patient, PatientCollection

    for i, pid in enumerate((1, 2, 3)):
        make_patient(tmp_path / f"0522c{pid:04d}", shape=(16, 48, 48), seed=i)
    env = crop_envelope(tmp_path)
    assert set(env) == {"x", "y", "z"}
    for path in PatientCollection(tmp_path).patient_paths.values():
        patient = Patient(path)
        d_total = patient.image.as_numpy().shape[1]
        for name in patient.present_structures():
            m = patient.structures[name].as_numpy()[0]  # (D, H, W)
            d, h, w = np.nonzero(m)
            if len(d) == 0:
                continue
            # reference axis convention: "x" slices H, "y" slices W
            assert env["x"][0] <= h.min() and h.max() <= env["x"][1]
            assert env["y"][0] <= w.min() and w.max() <= env["y"][1]
            assert env["z"][0] <= d.min() / d_total
            assert d.max() / d_total <= env["z"][1]


def test_derive_all_and_cli(tmp_path, labels, rng, capsys):
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.stats import main

    imgs = rng.normal(100, 500, size=labels.shape)
    ds = PackedDataset2D(
        images=imgs.astype(np.float32),
        labels=labels,
        indicators=np.ones((len(labels), 9), np.float32),
    )
    report = derive_all(ds)
    assert set(report) == {
        "class_weights", "annotation_counts", "stacked_window_stats",
    }
    ds.save(tmp_path / "train_packed.npz")
    main(["--data_dir", str(tmp_path), "--split", "train"])
    out = json.loads(capsys.readouterr().out)
    assert out["annotation_counts"]["derived"]["BrainStem"] == 2
    assert out["annotation_counts"]["published"]["BrainStem"] == 601
