"""On-device exact EDT vs scipy, and the signed distance-map contract
(reference capstone/data/utils.py:10-26)."""

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import distance_transform_edt

from ctseg_tpu.data.distance import compute_distance_map
from ctseg_tpu.ops.edt import (
    edt,
    signed_distance_map,
    signed_distance_maps_from_labels,
)


def test_edt_matches_scipy(rng):
    mask = (rng.random((32, 48)) > 0.7).astype(np.uint8)
    ours = np.asarray(edt(jnp.asarray(mask)))
    ref = distance_transform_edt(mask)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_edt_blob(rng):
    mask = np.zeros((40, 40), np.uint8)
    mask[10:25, 12:30] = 1
    np.testing.assert_allclose(
        np.asarray(edt(jnp.asarray(mask))),
        distance_transform_edt(mask),
        rtol=1e-5,
        atol=1e-5,
    )


def test_edt_anisotropic_matches_scipy_2d(rng):
    """Per-axis spacing == scipy's sampling= (PDDCA voxels are ~3x taller
    in z than in-plane, so mm-correct metrics need this)."""
    mask = (rng.random((24, 40)) > 0.8).astype(np.uint8)
    spacing = (3.0, 1.1)
    ours = np.asarray(edt(jnp.asarray(mask), spacing=spacing))
    ref = distance_transform_edt(mask, sampling=spacing)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_edt_anisotropic_matches_scipy_3d(rng):
    mask = (rng.random((12, 20, 16)) > 0.85).astype(np.uint8)
    spacing = (2.5, 0.98, 1.27)
    ours = np.asarray(edt(jnp.asarray(mask), spacing=spacing))
    ref = distance_transform_edt(mask, sampling=spacing)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_edt_traced_spacing_matches_static(rng):
    """Spacing as a traced array (one compile shared across patients) gives
    the same result as the Python-constant path."""
    import jax

    mask = (rng.random((16, 16, 10)) > 0.8).astype(np.uint8)
    spacing = np.array([1.1, 1.1, 3.0], np.float32)
    jitted = jax.jit(lambda m, s: edt(m, spacing=s))
    ours = np.asarray(jitted(jnp.asarray(mask), jnp.asarray(spacing)))
    ref = distance_transform_edt(mask, sampling=spacing)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_signed_distance_map_matches_reference_formula(rng):
    mask = np.zeros((3, 24, 24), np.uint8)
    mask[0, 5:12, 5:12] = 1
    mask[1, 2:6, 15:22] = 1
    # class 2 left empty -> zero map (reference behavior)
    ref = compute_distance_map(mask)  # scipy-based oracle (host module)
    for c in range(3):
        ours = np.asarray(signed_distance_map(jnp.asarray(mask[c])))
        np.testing.assert_allclose(ours, ref[c], rtol=1e-4, atol=1e-5)


def test_signed_distance_maps_from_labels(rng):
    labels = rng.integers(0, 4, size=(2, 16, 16))
    maps = np.asarray(signed_distance_maps_from_labels(jnp.asarray(labels), 4))
    assert maps.shape == (2, 16, 16, 3)
    for n in range(2):
        mask = np.stack([(labels[n] == c).astype(np.uint8) for c in (1, 2, 3)])
        ref = compute_distance_map(mask)
        np.testing.assert_allclose(
            maps[n].transpose(2, 0, 1), ref, rtol=1e-4, atol=1e-5
        )
