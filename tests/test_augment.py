"""Augmentation op correctness (crop/grid-distortion matmul forms vs oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from ctseg_tpu.transforms import augment


def test_random_crop_matches_slice(rng):
    img = jnp.asarray(rng.random((40, 50, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(40, 50)).astype(np.int32))
    key = jax.random.key(5)
    ic, lc = augment.random_crop(key, img, lab, (32, 32))
    kh, kw = jax.random.split(key)
    top = int(jax.random.randint(kh, (), 0, 40 - 32 + 1))
    left = int(jax.random.randint(kw, (), 0, 50 - 32 + 1))
    np.testing.assert_array_equal(
        np.asarray(ic), np.asarray(img)[top : top + 32, left : left + 32]
    )
    np.testing.assert_array_equal(
        np.asarray(lc), np.asarray(lab)[top : top + 32, left : left + 32]
    )


def test_grid_distortion_matmul_matches_map_coordinates(rng):
    """The separable interpolation-matmul form equals order-1/order-0
    map_coordinates with edge clamping for in-range coordinate maps."""
    h, w = 32, 48
    img = jnp.asarray(rng.random((h, w, 2)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(h, w)).astype(np.int32))
    key = jax.random.key(1)
    # Force application (p=1) so we compare actual warps.
    out_img, out_lab = augment.grid_distortion(key, img, lab, p=1.0)

    k_apply, kx, ky = jax.random.split(key, 3)
    map_x = np.asarray(augment._distortion_map(kx, w, 5, 0.3))
    map_y = np.asarray(augment._distortion_map(ky, h, 5, 0.3))
    map_x = np.clip(map_x, 0, w - 1)
    map_y = np.clip(map_y, 0, h - 1)
    cy = np.broadcast_to(map_y[:, None], (h, w))
    cx = np.broadcast_to(map_x[None, :], (h, w))
    for c in range(2):
        ref = map_coordinates(
            img[..., c], [jnp.asarray(cy), jnp.asarray(cx)], order=1, mode="nearest"
        )
        np.testing.assert_allclose(
            np.asarray(out_img[..., c]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
    ref_lab = map_coordinates(
        lab.astype(jnp.float32), [jnp.asarray(cy), jnp.asarray(cx)],
        order=0, mode="nearest",
    )
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(ref_lab))


def test_grid_distortion_not_applied(rng):
    img = jnp.asarray(rng.random((16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(16, 16)).astype(np.int32))
    out_img, out_lab = augment.grid_distortion(jax.random.key(0), img, lab, p=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_horizontal_flip_and_rot90_shapes(rng):
    img = jnp.asarray(rng.random((24, 24, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(24, 24)).astype(np.int32))
    for op in (augment.horizontal_flip, augment.random_rotate90):
        oi, ol = op(jax.random.key(2), img, lab)
        assert oi.shape == img.shape and ol.shape == lab.shape


def test_elastic_transform_runs(rng):
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(32, 32)).astype(np.int32))
    oi, ol = augment.elastic_transform(jax.random.key(3), img, lab, p=1.0)
    assert oi.shape == img.shape and ol.shape == lab.shape
    assert np.isfinite(np.asarray(oi)).all()
    # labels stay in the valid class range after nearest warping
    assert int(ol.max()) <= 9 and int(ol.min()) >= 0
