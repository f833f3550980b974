"""HD95 metric sanity and known-geometry cases."""

import numpy as np
import pytest

from ctseg_tpu.metrics.hd95 import hd95, hd95_per_structure


def test_identical_masks_zero():
    mask = np.zeros((32, 32), bool)
    mask[8:20, 8:20] = True
    assert hd95(mask, mask) == 0.0


def test_shifted_square():
    a = np.zeros((64, 64), bool)
    b = np.zeros((64, 64), bool)
    a[10:20, 10:20] = True
    b[13:23, 10:20] = True  # shifted 3 down
    d = hd95(a, b)
    assert 0 < d <= 3.0 + 1e-6


def test_empty_mask_nan():
    a = np.zeros((16, 16), bool)
    b = np.zeros((16, 16), bool)
    b[4:8, 4:8] = True
    assert np.isnan(hd95(a, b))
    assert np.isnan(hd95(b, a))


def test_spacing_scales_distance():
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[10, 10] = True
    b[10, 14] = True  # 4 px apart along axis 1
    assert hd95(a, b) == pytest.approx(4.0)
    assert hd95(a, b, spacing=(1.0, 2.5)) == pytest.approx(10.0)


def test_per_structure(rng):
    pred = rng.integers(0, 4, size=(24, 24))
    target = rng.integers(0, 4, size=(24, 24))
    target[target == 2] = 0  # class 2 absent from GT -> nan
    out = hd95_per_structure(pred, target, n_classes=4)
    assert out.shape == (3,)
    assert np.isnan(out[1])
    assert np.isfinite(out[0]) and np.isfinite(out[2])
