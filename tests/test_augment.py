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


def test_affine_two_pass_warp(rng):
    """The LU shear-decomposed affine warp: exact on linear-ramp images,
    tight on smooth ones (two-pass bilinear == bilinear for locally linear
    content; the filter differs only on high-frequency content)."""
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    h = w = 48
    ys_, xs_ = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray(np.stack([2.0 * ys_ + 3.0 * xs_ + 5.0, ys_ - xs_], -1))
    lab = jnp.asarray(rng.integers(0, 10, size=(h, w)).astype(np.int32))
    Minv = jnp.asarray((np.eye(2) + rng.normal(0, 0.08, (2, 2))).astype(np.float32))
    binv = jnp.asarray(rng.normal(0, 2.0, (2,)).astype(np.float32))
    out_img, out_lab = augment._affine_warp_two_pass(img, lab, Minv, binv)
    assert out_img.shape == img.shape and out_lab.shape == lab.shape

    ys = jnp.asarray(ys_)
    xs = jnp.asarray(xs_)
    cy = Minv[0, 0] * ys + Minv[0, 1] * xs + binv[0]
    cx = Minv[1, 1] * xs + Minv[1, 0] * ys + binv[1]
    ref = map_coordinates(img[..., 0], [cy, cx], order=1, mode="nearest")
    interior = np.s_[6:-6, 6:-6]
    d = np.abs(np.asarray(out_img[..., 0])[interior] - np.asarray(ref)[interior])
    assert d.max() < 1e-3
    assert int(out_lab.max()) <= 9 and int(out_lab.min()) >= 0


def test_elastic_default_uses_affine_fast_path(rng):
    """At Albumentations defaults (alpha=1, sigma=50) elastic takes the
    matmul fast path and produces a valid warp."""
    import jax

    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(32, 32)).astype(np.int32))
    oi, ol = augment.elastic_transform(jax.random.key(7), img, lab, p=1.0)
    assert np.isfinite(np.asarray(oi)).all()
    assert not np.array_equal(np.asarray(oi), np.asarray(img))  # warp applied

    # Large alpha forces the general gather path.
    oi2, _ = augment.elastic_transform(
        jax.random.key(7), img, lab, alpha=40.0, sigma=8.0, p=1.0
    )
    assert np.isfinite(np.asarray(oi2)).all()


def test_reflect_101_matches_map_coordinates_mirror(rng):
    """_reflect_101 folds coordinates exactly like map_coordinates
    mode='mirror' (cv2 BORDER_REFLECT_101, Albumentations' default)."""
    n = 11
    row = jnp.asarray(rng.random(n).astype(np.float32))
    coords = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-2 * n, 3 * n, size=64),
                np.array([0.0, n - 1.0, -0.5, n - 0.5, -(n - 1.0), 2.0 * (n - 1.0)]),
            ]
        ).astype(np.float32)
    )
    ref = map_coordinates(row, [coords], order=1, mode="mirror")
    folded = augment._reflect_101(coords, n)
    got = map_coordinates(row, [folded], order=1, mode="nearest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_shear_pass_border_reflects(rng):
    """A pure vertical translation far past the edge must read mirrored
    interior rows (REFLECT_101), not edge-replicated ones — the border
    behavior Albumentations' warps use. (With beta=0 the pass's 1D source
    coordinate equals the composed map, so the gather oracle is exact.)"""
    h, w = 16, 12
    img = jnp.asarray(rng.random((h, w, 2)).astype(np.float32))
    ty = 6.3  # rows 10..15 map past h-1
    out = augment._shear_pass_vertical(img, 1.0, 0.0, ty, order=1)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for c in range(2):
        ref = map_coordinates(
            img[..., c], [jnp.asarray(ys + ty), jnp.asarray(xs)],
            order=1, mode="mirror",
        )
        np.testing.assert_allclose(
            np.asarray(out[..., c]), np.asarray(ref), atol=1e-5
        )
    # Edge-replication would give identical out-of-range rows; mirrored
    # rows must differ from the last valid one.
    assert not np.allclose(np.asarray(out[-1]), np.asarray(out[-3]))


def test_distortion_map_matches_albumentations_linspace(rng):
    """_distortion_map reproduces Albumentations' endpoint-INCLUSIVE
    np.linspace map pixel-for-pixel given the same steps vector
    (A.GridDistortion's xx/yy construction)."""
    length, num_steps, limit = 50, 5, 0.3
    key = jax.random.key(9)
    got = np.asarray(augment._distortion_map(key, length, num_steps, limit))

    steps = np.asarray(
        1.0
        + jax.random.uniform(
            key, (num_steps + 1,), jnp.float32, -limit, limit
        )
    )
    step = length // num_steps
    xx = np.zeros(length, np.float32)
    prev = 0.0
    for idx in range(num_steps + 1):
        start = idx * step
        if start >= length:
            break
        end = start + step
        if end > length:
            end = length
            cur = float(length)
        else:
            cur = prev + step * steps[idx]
        xx[start:end] = np.linspace(prev, cur, end - start)
        prev = cur
    np.testing.assert_allclose(got, xx, rtol=1e-6, atol=1e-5)
