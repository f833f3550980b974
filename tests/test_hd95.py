"""HD95 metric sanity, known-geometry cases, and device==scipy parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.metrics.hd95 import (
    hd95,
    hd95_per_structure,
    hd95_per_structure_device,
)


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


@pytest.mark.parametrize("shape", [(24, 24), (16, 20, 12)])
def test_device_matches_scipy_random(rng, shape):
    """Jitted HD95 == scipy path (surfaces, EDT, percentile interpolation)."""
    pred = rng.integers(0, 4, size=shape)
    target = rng.integers(0, 4, size=shape)
    target[target == 2] = 0  # class absent from GT -> invalid/nan
    ref = hd95_per_structure(pred, target, n_classes=4)
    vals, ok = hd95_per_structure_device(jnp.asarray(pred), jnp.asarray(target), 4)
    # device path encodes invalidity as (0, valid=False); scipy oracle as nan
    ours = np.where(np.asarray(ok), np.asarray(vals), np.nan)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_device_matches_scipy_blobs(rng):
    """Structured (non-noise) masks: interiors erode away, percentile
    interpolates between distinct order statistics."""
    pred = np.zeros((32, 32, 16), np.int32)
    target = np.zeros((32, 32, 16), np.int32)
    pred[4:18, 4:18, 3:10] = 1
    target[7:21, 5:19, 4:12] = 1
    pred[22:30, 22:30, 8:14] = 2
    target[20:28, 21:31, 7:13] = 2
    ref = hd95_per_structure(pred, target, n_classes=3)
    vals, ok = hd95_per_structure_device(jnp.asarray(pred), jnp.asarray(target), 3)
    ours = np.where(np.asarray(ok), np.asarray(vals), np.nan)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape,spacing",
    [((24, 24), (3.0, 1.1)), ((16, 20, 12), (1.1, 0.98, 2.5))],
)
def test_device_anisotropic_matches_scipy(rng, shape, spacing):
    """Anisotropic device HD95 (float-bisection order statistic over the
    spacing-scaled EDT) == scipy path with sampling=spacing: HD95 in mm."""
    pred = rng.integers(0, 4, size=shape)
    target = rng.integers(0, 4, size=shape)
    target[target == 2] = 0
    ref = hd95_per_structure(pred, target, n_classes=4, spacing=spacing)
    vals, ok = hd95_per_structure_device(
        jnp.asarray(pred), jnp.asarray(target), 4,
        spacing=jnp.asarray(spacing, jnp.float32),
    )
    ours = np.where(np.asarray(ok), np.asarray(vals), np.nan)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_device_anisotropic_blobs(rng):
    """Structured masks under PDDCA-like spacing (z 3x in-plane)."""
    pred = np.zeros((20, 24, 12), np.int32)
    target = np.zeros((20, 24, 12), np.int32)
    pred[4:14, 4:14, 3:9] = 1
    target[6:16, 5:15, 4:10] = 1
    spacing = (1.1, 1.1, 3.0)
    ref = hd95_per_structure(pred, target, n_classes=2, spacing=spacing)
    vals, ok = hd95_per_structure_device(
        jnp.asarray(pred), jnp.asarray(target), 2,
        spacing=jnp.asarray(spacing, jnp.float32),
    )
    assert bool(np.asarray(ok)[0])
    np.testing.assert_allclose(
        np.asarray(vals)[0], ref[0], rtol=1e-4, atol=1e-4
    )


def test_device_unit_spacing_array_matches_none(rng):
    """spacing=ones goes down the float-bisection path and must agree with
    the integer-exact unit path."""
    pred = rng.integers(0, 3, size=(24, 24))
    target = rng.integers(0, 3, size=(24, 24))
    v0, ok0 = hd95_per_structure_device(
        jnp.asarray(pred), jnp.asarray(target), 3
    )
    v1, ok1 = hd95_per_structure_device(
        jnp.asarray(pred), jnp.asarray(target), 3,
        spacing=jnp.ones(2, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_allclose(
        np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-5
    )


def test_device_all_percentiles(rng):
    """The order-statistic binary search is exact at any percentile."""
    pred = np.zeros((40, 40), np.int32)
    target = np.zeros((40, 40), np.int32)
    pred[5:15, 5:15] = 1
    target[9:23, 8:20] = 1
    for q in (50.0, 90.0, 100.0):
        ref = hd95(pred == 1, target == 1, percentile=q)
        vals, ok = hd95_per_structure_device(
            jnp.asarray(pred), jnp.asarray(target), 2, percentile=q
        )
        assert bool(np.asarray(ok)[0])
        np.testing.assert_allclose(
            np.asarray(vals)[0], ref, rtol=1e-5, atol=1e-5
        )


def test_kary_order_stat_matches_plain_bisection(rng):
    """The k-ary masked order statistic equals a reference 50-iteration
    binary bisection (the pre-round-5 implementation) bit-for-bit on
    randomized value sets — same invariant, finer interval shrink."""
    import jax
    import jax.numpy as jnp

    from ctseg_tpu.metrics.hd95 import _masked_order_stat_float

    def plain_bisection(d2, mask, j, hi0, iters=50):
        d2 = d2.ravel()
        m = mask.ravel()

        def body(_, bounds):
            lo, hi = bounds
            mid = (lo + hi) * 0.5
            cnt = jnp.sum(jnp.where(m, d2 <= mid, False))
            found = cnt >= j + 1
            return jnp.where(found, lo, mid), jnp.where(found, mid, hi)

        lo, hi = jax.lax.fori_loop(
            0, iters, body, (jnp.float32(-1.0), hi0.astype(jnp.float32))
        )
        return hi

    for _ in range(20):
        n = int(rng.integers(50, 3000))
        vals = np.abs(
            rng.normal(0, rng.uniform(0.1, 100), size=n)
        ).astype(np.float32) ** 2
        mask = rng.random(n) < rng.uniform(0.05, 0.9)
        if not mask.any():
            mask[0] = True
        hi0 = jnp.float32(vals.max() * 1.5 + 1.0)
        j = int(rng.integers(0, mask.sum()))
        a = float(plain_bisection(jnp.asarray(vals), jnp.asarray(mask), j, hi0))
        b = float(
            _masked_order_stat_float(
                jnp.asarray(vals), jnp.asarray(mask), j, hi0
            )
        )
        expected = float(np.sort(vals[mask])[j])
        assert np.float32(a) == np.float32(b), (a, b, expected)
