"""GradCAM and visualization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.interpret import gradcam
from ctseg_tpu.models import UNet


@pytest.fixture(scope="module")
def small_model():
    model = UNet(out_channels=10, channels=(4, 8, 16, 32, 64), num_res_units=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    return model, params


def test_gradcam_shape_and_nonneg(small_model, rng):
    model, params = small_model
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    cam = gradcam(model, params, x, class_idx=3, layer="feat_down1")
    assert cam.shape == (2, 32, 32)
    assert np.asarray(cam).min() >= 0.0
    assert np.isfinite(np.asarray(cam)).all()


def test_gradcam_layers(small_model, rng):
    model, params = small_model
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    for layer in ("feat_down0", "feat_bottom", "feat_up1"):
        cam = gradcam(model, params, x, class_idx=1, layer=layer)
        assert cam.shape == (1, 32, 32)


def test_gradcam_unknown_layer(small_model, rng):
    model, params = small_model
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(KeyError):
        gradcam(model, params, x, class_idx=1, layer="nonexistent")


def test_capture_flag_does_not_change_params_or_output(small_model, rng):
    """Enabling capture_features must not alter params or forward values."""
    model, params = small_model
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    base = model.apply(params, x)
    cmodel = model.clone(capture_features=True)
    pert = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: cmodel.init(jax.random.key(0), x)["perturbations"]),
    )
    out = cmodel.apply({"params": params["params"], "perturbations": pert}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-6)


def test_visualize_arrays(rng):
    from ctseg_tpu.utils.visualize import (
        overlay_labels,
        prediction_panel,
        structure_hu_values,
        window_image,
        windowed_gallery,
    )

    img = rng.normal(40, 300, size=(32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(32, 32))
    w = window_image(img, 350, 20)
    assert w.min() >= 0 and w.max() <= 1
    rgb = overlay_labels(w, labels)
    assert rgb.shape == (32, 32, 3)
    panel = prediction_panel(img, labels, labels)
    assert panel.shape == (32, 96, 3)
    gallery = windowed_gallery(img)
    assert set(gallery) >= {"brain", "soft_tissue", "bone"}
    values = structure_hu_values(img, labels)
    assert len(values) == 9


def test_gradcam_all_structures_matches_single(small_model, rng):
    """The batched 9-class sweep == per-class calls (one jitted pass)."""
    import numpy as np
    from ctseg_tpu.interpret import gradcam_all_structures

    model, params = small_model
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    cams = gradcam_all_structures(model, params, x)
    assert cams.shape == (1, 9, 32, 32)
    for c in (1, 5, 9):
        single = gradcam(model, params, x, class_idx=c)
        np.testing.assert_allclose(
            np.asarray(cams[:, c - 1]), np.asarray(single), rtol=1e-5, atol=1e-6
        )
