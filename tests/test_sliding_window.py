"""Sliding-window inference: coverage, blending correctness, sharding."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.inference import gaussian_importance, sliding_window_inference
from ctseg_tpu.inference.sliding_window import compute_window_grid


def test_window_grid_covers_volume():
    starts = compute_window_grid((100, 100), (64, 64), overlap=0.5)
    assert (starts >= 0).all()
    covered = np.zeros((100, 100), bool)
    for sy, sx in starts:
        covered[sy : sy + 64, sx : sx + 64] = True
    assert covered.all()
    # last window flush with the edge
    assert starts[:, 0].max() == 36 and starts[:, 1].max() == 36


def test_pad_volume_unsigned_dtype_keeps_air_fill():
    """-1024 HU pad fill must survive unsigned scan dtypes.

    np.full(-1024, dtype=uint16) silently wraps to 64512, which the
    soft-tissue window maps to 1.0 (max-intensity tissue) instead of 0.0
    (air) — changing boundary-window predictions. The pad must promote to
    float32 instead; signed dtypes keep their compact layout."""
    from ctseg_tpu.inference.sliding_window import pad_volume_dhw
    from ctseg_tpu.transforms.windowing import apply_window

    for dt in (np.uint16, np.uint8):
        arr = np.full((4, 8, 8), 500, dtype=dt)  # (D, H, W)
        out = pad_volume_dhw(arr, (16, 16, 8), fill=-1024.0)
        assert out.dtype == np.float32
        assert out[-1, -1, -1] == -1024.0
        np.testing.assert_array_equal(out[:4, :8, :8], arr)
        windowed = np.asarray(apply_window(jnp.asarray(out), 350, 20, shift=True))
        assert windowed[-1, -1, -1] == 0.0
    # int16 represents the fill: no promotion.
    arr = np.full((4, 8, 8), 500, dtype=np.int16)
    out = pad_volume_dhw(arr, (16, 16, 8), fill=-1024.0)
    assert out.dtype == np.int16 and out[-1, -1, -1] == -1024


def test_bucket_axis_window_count_neutral():
    """The whole bucketed-compile design rests on this property: rounding
    an axis up to the window grid never changes the number of windows, so
    volumes in one bucket can share a compiled program while keeping their
    own clamped grids. Checked exhaustively over sizes and overlaps."""
    from ctseg_tpu.inference.sliding_window import _window_starts, bucket_axis

    for patch in (16, 32, 48, 64):
        for overlap in (0.0, 0.25, 0.5, 0.75):
            for size in range(1, 4 * patch + 1):
                b = bucket_axis(size, patch, overlap)
                assert b >= max(size, patch)
                n_true = len(_window_starts(max(size, patch), patch, overlap))
                n_bucket = len(_window_starts(b, patch, overlap))
                assert n_true == n_bucket, (size, patch, overlap, b)
                # idempotent: a bucket is its own bucket
                assert bucket_axis(b, patch, overlap) == b


def test_dynamic_starts_matches_static(rng):
    """A dynamic-starts runner fed the exact clamped grid of a smaller
    volume (padded to the bucket) reproduces the static runner's blended
    logits bit-for-bit inside the true extent."""
    import jax

    from ctseg_tpu.inference.sliding_window import (
        bucket_axis,
        build_sliding_window_fn,
        compute_window_grid,
    )

    patch = (16, 16)
    true_shape = (25, 21)
    bucket = tuple(bucket_axis(s, 16, 0.5) for s in true_shape)
    vol = rng.normal(size=true_shape + (1,)).astype(np.float32)

    def apply_fn(params, patches):
        return jnp.tanh(patches) + patches**2

    static_run = build_sliding_window_fn(
        apply_fn, true_shape, patch, overlap=0.5, batch_size=2,
        out_channels=1,
    )
    ref = static_run(None, jnp.asarray(vol))

    dyn_run = build_sliding_window_fn(
        apply_fn, bucket, patch, overlap=0.5, batch_size=2,
        out_channels=1, dynamic_starts=True,
    )
    padded = np.zeros(bucket + (1,), np.float32)
    padded[: true_shape[0], : true_shape[1]] = vol
    starts = compute_window_grid(true_shape, patch, 0.5)
    got = dyn_run(None, jnp.asarray(padded), jnp.asarray(starts))

    np.testing.assert_array_equal(
        np.asarray(got)[: true_shape[0], : true_shape[1]], np.asarray(ref)
    )
    # untouched bucket padding has zero blend weight -> exactly 0 logits
    assert (np.asarray(got)[true_shape[0]:] == 0).all()
    assert (np.asarray(got)[:, true_shape[1]:] == 0).all()
    del jax


def test_gaussian_importance_peak_center():
    g = np.asarray(gaussian_importance((32, 32)))
    assert g.shape == (32, 32)
    assert g.max() == pytest.approx(1.0)
    cy = np.unravel_index(g.argmax(), g.shape)
    assert cy in [(15, 15), (16, 16), (15, 16), (16, 15)]


def test_identity_model_blends_to_input(rng):
    """With apply_fn = identity over channels, blending must reproduce the
    input exactly (weights cancel)."""
    vol = jnp.asarray(rng.random((70, 75, 3)).astype(np.float32))
    out = sliding_window_inference(
        vol, lambda p: p, patch_size=(32, 32), overlap=0.5, batch_size=3
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-4, atol=1e-5)


def test_constant_model(rng):
    vol = jnp.asarray(rng.random((50, 50, 1)).astype(np.float32))
    out = sliding_window_inference(
        vol,
        lambda p: jnp.full(p.shape[:-1] + (4,), 2.5),
        patch_size=(25, 25),
        overlap=0.25,
        batch_size=2,
        out_channels=4,
    )
    assert out.shape == (50, 50, 4)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-5)


def test_3d_volume(rng):
    vol = jnp.asarray(rng.random((20, 33, 34, 1)).astype(np.float32))
    out = sliding_window_inference(
        vol, lambda p: p, patch_size=(16, 16, 16), overlap=0.5, batch_size=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-4, atol=1e-5)


def test_patch_equals_volume_single_window(rng):
    vol = jnp.asarray(rng.random((32, 32, 2)).astype(np.float32))
    out = sliding_window_inference(
        vol, lambda p: p * 3.0, patch_size=(32, 32), overlap=0.5, batch_size=1
    )
    np.testing.assert_allclose(np.asarray(out), 3.0 * np.asarray(vol), rtol=1e-5)


def test_mesh_sharded_matches_unsharded(rng):
    from ctseg_tpu.parallel import make_mesh

    vol = jnp.asarray(rng.random((70, 70, 2)).astype(np.float32))
    fn = lambda p: p * 2.0 + 1.0
    ref = sliding_window_inference(vol, fn, (32, 32), batch_size=8)
    mesh = make_mesh(8)
    out = sliding_window_inference(vol, fn, (32, 32), batch_size=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
