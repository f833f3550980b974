"""Depth-sharded halo-exchange sliding-window inference on an 8-way mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.inference.spatial_sharded import sliding_window_inference_spatial
from ctseg_tpu.parallel import make_mesh


def test_identity_exact_8way(rng):
    """Blending an identity model must reproduce the input exactly,
    including across every slab boundary and halo region."""
    vol = jnp.asarray(rng.random((64, 40, 40, 2)).astype(np.float32))
    mesh = make_mesh(8)
    out = sliding_window_inference_spatial(
        vol, lambda p: p, patch_size=(16, 24, 24), mesh=mesh, batch_size=4
    )
    assert out.shape == vol.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-4, atol=1e-5)


def test_constant_model_8way(rng):
    vol = jnp.asarray(rng.random((48, 32, 32, 1)).astype(np.float32))
    mesh = make_mesh(8)
    out = sliding_window_inference_spatial(
        vol,
        lambda p: jnp.full(p.shape[:-1] + (5,), 1.5),
        patch_size=(8, 16, 16),
        mesh=mesh,
        batch_size=4,
        out_channels=5,
    )
    assert out.shape == (48, 32, 32, 5)
    np.testing.assert_allclose(np.asarray(out), 1.5, rtol=1e-5)


def test_unpadded_depth(rng):
    """Depth not divisible by the mesh size gets edge-padded and cropped."""
    vol = jnp.asarray(rng.random((50, 32, 32, 1)).astype(np.float32))
    mesh = make_mesh(8)
    out = sliding_window_inference_spatial(
        vol, lambda p: p, patch_size=(8, 16, 16), mesh=mesh, batch_size=4
    )
    assert out.shape == vol.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-4, atol=1e-5)


def test_real_model_matches_replicated_interior(rng):
    """With a real (nonlinear) model, the sharded result matches the
    replicated window-parallel path away from the padded tail."""
    from ctseg_tpu.inference import sliding_window_inference
    from ctseg_tpu.models import UNet

    model = UNet(out_channels=4, channels=(2, 4, 8, 16, 32), num_res_units=0)
    x0 = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.key(0), x0)
    apply_fn = lambda p: model.apply(params, p)

    vol = jnp.asarray(rng.random((64, 16, 16, 1)).astype(np.float32))
    ref = sliding_window_inference(
        vol, apply_fn, patch_size=(16, 16, 16), overlap=0.5, batch_size=4,
        out_channels=4,
    )
    mesh = make_mesh(8)
    out = sliding_window_inference_spatial(
        vol, apply_fn, patch_size=(16, 16, 16), mesh=mesh, batch_size=4,
        out_channels=4,
    )
    # Interior rows (those not influenced by the sharded grid's extra tail
    # windows over the padded region) must agree.
    np.testing.assert_allclose(
        np.asarray(out)[:48], np.asarray(ref)[:48], rtol=2e-3, atol=2e-4
    )


def test_params_as_arguments_matches_closure(rng):
    """The (params, patches) form — weights as jit ARGUMENTS per CLAUDE.md
    rule 2 — produces the same blended output as the legacy closure form,
    and an out_channels=None probe uses eval_shape (no device forward)."""
    from ctseg_tpu.models import SegmentationModel

    mesh = make_mesh(8)
    model = SegmentationModel(
        out_channels=10, channels=(2, 4), strides=(2,), num_res_units=0,
    )
    vol = jnp.asarray(rng.random((32, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), vol[:8][None])

    out_closure = sliding_window_inference_spatial(
        vol, lambda p: model.apply(params, p), patch_size=(8, 16, 16),
        mesh=mesh, batch_size=4, out_channels=10,
    )
    out_args = sliding_window_inference_spatial(
        vol, model.apply, patch_size=(8, 16, 16),
        mesh=mesh, batch_size=4, params=params,  # out_channels via eval_shape
    )
    np.testing.assert_allclose(
        np.asarray(out_args), np.asarray(out_closure), rtol=1e-5, atol=1e-6
    )
