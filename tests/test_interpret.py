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


def test_run_interpretability_batched(tmp_path, rng):
    """The batched driver writes one artifact set per qualifying sample —
    incl. a partial final batch — and skips under-annotated samples."""
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.interpret.run import run_interpretability
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    config = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=0, transform_degree=1,
        batch_size=2, input_size=32,
    )
    trainer = Trainer(config)
    state = trainer.init_state()

    n = 7
    indicators = np.ones((n, 9), np.float32)
    indicators[2, :] = 0  # disqualified (<5 structures)
    dataset = PackedDataset2D(
        images=rng.normal(size=(n, 32, 32)).astype(np.float32) * 300,
        labels=rng.integers(0, 10, size=(n, 32, 32)).astype(np.uint8),
        indicators=indicators,
        names=[f"s{i}" for i in range(n)],
    )
    done = run_interpretability(
        trainer, state.params, dataset, tmp_path, max_samples=5,
        min_structures=5, batch_size=4,
    )
    assert done == 5
    written = sorted(p.name for p in tmp_path.glob("*_gradcam.npy"))
    assert written == [f"s{i}_gradcam.npy" for i in (0, 1, 3, 4, 5)]
    cams = np.load(tmp_path / "s0_gradcam.npy")
    assert cams.shape == (9, 32, 32) and np.isfinite(cams).all()


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
