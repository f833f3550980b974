"""Windowing math vs an independent numpy oracle of the reference contract
(reference capstone/transforms/transforms_2d.py:97-107)."""

import jax.numpy as jnp
import numpy as np

from ctseg_tpu.constants import WINDOWING_CONFIG
from ctseg_tpu.transforms import apply_window, normalize, windowed_channels


def np_apply_window(image, width, level, shift=True):
    lo = level - width // 2
    hi = level + width // 2
    out = np.clip(image, lo, hi)
    if shift:
        out = (out - lo) / (hi - lo + 1e-8)
    return out


def test_apply_window_matches_numpy(rng):
    img = rng.integers(-1024, 3000, size=(5, 32, 32)).astype(np.float32)
    for name, (w, l) in WINDOWING_CONFIG.items():
        ours = np.asarray(apply_window(jnp.asarray(img), w, l, shift=True))
        ref = np_apply_window(img, w, l, shift=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
        ours_ns = np.asarray(apply_window(jnp.asarray(img), w, l, shift=False))
        np.testing.assert_allclose(ours_ns, np_apply_window(img, w, l, False))


def test_windowed_channels_stacks_three_windows(rng):
    img = rng.integers(-1024, 3000, size=(2, 16, 16)).astype(np.float32)
    out = np.asarray(windowed_channels(jnp.asarray(img)))
    assert out.shape == (2, 16, 16, 3)
    for i, name in enumerate(("brain", "soft_tissue", "bone")):
        w, l = WINDOWING_CONFIG[name]
        np.testing.assert_allclose(
            out[..., i], np_apply_window(img, w, l), rtol=1e-6, atol=1e-6
        )
    # Shifted outputs live in [0, 1].
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_normalize(rng):
    img = rng.random((2, 8, 8, 3)).astype(np.float32)
    mean = (0.107, 0.135, 0.085)
    std = (0.271, 0.267, 0.152)
    out = np.asarray(normalize(jnp.asarray(img), mean, std))
    ref = (img - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
