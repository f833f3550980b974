"""Predefined transform pipelines, degrees 0-4 (train/test pairs).

Mirrors reference capstone/transforms/predefined.py:31-105 as composable
on-device functions. Each pipeline maps a single raw-HU slice
(H, W) + label (H, W) to a windowed/normalized/augmented
(256, 256, C) + (256, 256) pair; `batched_transform` vmaps it with
per-sample PRNG keys inside the jitted train step.

  degree 1: windowed 3ch + Resize(256) + Normalize              (train == test)
  degree 2: windowed + RandomCrop(256) + RandomRotate90 + HFlip + Normalize
  degree 3: degree 2 with ElasticTransform after the crop
  degree 4: windowed + RandomCrop(256) + OneOf(Elastic, GridDistortion) + Norm
  degree 0: degree 4 with a single soft-tissue channel
Test side is always windows + Resize(256) + Normalize.
"""

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import STACKED_WINDOW_MEAN, STACKED_WINDOW_STD
from ctseg_tpu.transforms import augment
from ctseg_tpu.transforms.windowing import (
    normalize,
    soft_tissue_window,
    windowed_channels,
)

DEFAULT_SIZE = (256, 256)
_SOFT_MEAN = (STACKED_WINDOW_MEAN[1],)
_SOFT_STD = (STACKED_WINDOW_STD[1],)

# (key, image_HW, label_HW) -> (image_256x256xC, label_256x256)
TransformFn = Callable[[jax.Array, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def _window(image, single_channel: bool):
    if single_channel:
        return soft_tissue_window(image)
    return windowed_channels(image)


def _normalize(image, single_channel: bool):
    if single_channel:
        return normalize(image, _SOFT_MEAN, _SOFT_STD)
    return normalize(image)


def _test_transform(key, image, label, size=DEFAULT_SIZE, single_channel=False):
    img = _window(image, single_channel)
    img, lab = augment.resize_image_and_label(img, label, size)
    return _normalize(img, single_channel), lab


def _degree_1(key, image, label, size=DEFAULT_SIZE):
    return _test_transform(key, image, label, size)


def _degree_2(key, image, label, size=DEFAULT_SIZE):
    k1, k2, k3 = jax.random.split(key, 3)
    img = _window(image, False)
    img, lab = augment.random_crop(k1, img, label, size)
    img, lab = augment.random_rotate90(k2, img, lab)
    img, lab = augment.horizontal_flip(k3, img, lab)
    return _normalize(img, False), lab


def _degree_3(key, image, label, size=DEFAULT_SIZE):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = _window(image, False)
    img, lab = augment.random_crop(k1, img, label, size)
    img, lab = augment.elastic_transform(k2, img, lab)
    img, lab = augment.random_rotate90(k3, img, lab)
    img, lab = augment.horizontal_flip(k4, img, lab)
    return _normalize(img, False), lab


def _degree_4(key, image, label, size=DEFAULT_SIZE, single_channel=False):
    k1, k2 = jax.random.split(key)
    img = _window(image, single_channel)
    img, lab = augment.random_crop(k1, img, label, size)
    img, lab = augment.one_of(
        k2, (augment.elastic_transform, augment.grid_distortion), img, lab
    )
    return _normalize(img, single_channel), lab


def _degree_0(key, image, label, size=DEFAULT_SIZE):
    return _degree_4(key, image, label, size, single_channel=True)


_TRAIN = {
    0: _degree_0,
    1: _degree_1,
    2: _degree_2,
    3: _degree_3,
    4: _degree_4,
}


def transform_in_channels(degree: int) -> int:
    """Channel count produced by a degree (reference base_trainer.py:64-69)."""
    return 1 if degree == 0 else 3


def get_transform(
    degree: int, train: bool, size: Tuple[int, int] = DEFAULT_SIZE
) -> TransformFn:
    assert degree in _TRAIN, f"invalid transform degree: {degree}"
    if train:
        return functools.partial(_TRAIN[degree], size=size)
    return functools.partial(
        _test_transform, size=size, single_channel=(degree == 0)
    )


def batched_transform(
    transform: TransformFn, key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray
):
    """vmap a per-sample transform over a batch with per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(transform)(keys, images, labels)
