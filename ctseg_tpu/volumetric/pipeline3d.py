"""Device-resident 3D volume pipeline.

Two modes:
  - "resize" (reference parity): every volume nearest-resized once to a fixed
    (H, W, D) grid at construction — the reference re-interpolates each item
    every epoch inside the dataloader (capstone/volumetric/transforms.py:9-32,
    datasets.py:24-48); here it happens exactly once, on device.
  - "patch" (north star): volumes are kept at native resolution (depth-padded
    to a bucket) and the pipeline yields random fixed-size patches — the
    TPU-friendly way to train 3D without destroying resolution.

Layout: images (N, H, W, D), labels (N, H, W, D) int, matching the
reference's B x 1 x 256 x 256 x 96 convention (volumetric/base_trainer.py:88-99)
in channel-last form.
"""

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.data.datasets import PackedDataset3D

RESIZE_SHAPE = (256, 256, 96)  # (H, W, D) — reference volumetric grid


def _nearest_resize_3d(vol: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest-neighbor 3D resize (reference uses F.interpolate nearest for
    both image and mask, volumetric/transforms.py:15-23)."""
    return jax.image.resize(vol, shape, method="nearest")


class DevicePipeline3D:
    """Whole-volume pipeline (resize mode)."""

    def __init__(
        self,
        dataset: PackedDataset3D,
        batch_size: int = 1,
        shape: Tuple[int, int, int] = RESIZE_SHAPE,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.batch_size = batch_size
        self.size = len(dataset)
        # Same contract as DevicePipeline2D: a batch larger than the split
        # would make num_batches() == 0 and silently train nothing.
        assert self.size >= batch_size, (
            f"batch_size {batch_size} exceeds the dataset's {self.size} "
            "volumes — no full batch can be formed"
        )
        h, w, d = shape

        resize = jax.jit(lambda v: _nearest_resize_3d(v, (h, w, d)))
        images, labels = [], []
        for img, lab in zip(dataset.images, dataset.labels):
            # host arrays are (D, H, W); device layout is (H, W, D)
            img_hwd = jnp.moveaxis(jnp.asarray(img, jnp.float32), 0, -1)
            lab_hwd = jnp.moveaxis(jnp.asarray(lab, jnp.float32), 0, -1)
            images.append(resize(img_hwd))
            labels.append(resize(lab_hwd).astype(jnp.int32))
        device_put = (
            (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
        )
        self.images = device_put(jnp.stack(images))
        self.labels = device_put(jnp.stack(labels))
        self.indicators = device_put(
            jnp.asarray(np.stack(dataset.indicators), jnp.float32)
        )

    def num_batches(self) -> int:
        return self.size // self.batch_size

    def epoch(self, key: Optional[jax.Array] = None) -> Iterator:
        from ctseg_tpu.data.pipeline import epoch_batches

        return epoch_batches(
            self.images, self.labels, self.indicators,
            self.size, self.batch_size, key,
        )

    def padded_epoch(self, key: Optional[jax.Array] = None) -> Iterator:
        """Full-coverage evaluation epoch: the trailing partial batch is
        padded with masked rows instead of dropped (see DevicePipeline2D)."""
        from ctseg_tpu.data.pipeline import padded_epoch_batches

        return padded_epoch_batches(
            self.images, self.labels, self.indicators,
            self.size, self.batch_size, key,
        )


class PatchPipeline3D:
    """Random-patch pipeline (north star): native-resolution patches.

    Volumes are depth-padded to the max depth and stacked; each batch draws
    `batch_size` (volume, corner) pairs and gathers fixed-size patches on
    device. Patches that would cross the padded region are shifted inside
    the valid extent.
    """

    def __init__(
        self,
        dataset: PackedDataset3D,
        batch_size: int,
        patch_size: Tuple[int, int, int] = (128, 128, 48),  # (H, W, D)
        sharding: Optional[jax.sharding.Sharding] = None,
        steps_per_epoch: int = 100,
    ):
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.size = len(dataset)
        self.steps_per_epoch = steps_per_epoch

        shapes = np.array([img.shape for img in dataset.images])  # (N, 3) DHW
        self.max_d = int(shapes[:, 0].max())
        h, w = int(shapes[0, 1]), int(shapes[0, 2])
        assert (shapes[:, 1] == h).all() and (shapes[:, 2] == w).all(), (
            "patch mode expects uniform H, W across volumes (crop first)"
        )
        imgs = np.zeros((self.size, h, w, self.max_d), np.float32)
        labs = np.zeros((self.size, h, w, self.max_d), np.int32)
        depths = np.zeros(self.size, np.int32)
        for i, (img, lab) in enumerate(zip(dataset.images, dataset.labels)):
            d = img.shape[0]
            imgs[i, :, :, :d] = np.moveaxis(img, 0, -1)
            labs[i, :, :, :d] = np.moveaxis(lab, 0, -1)
            depths[i] = d

        device_put = (
            (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
        )
        self.images = device_put(jnp.asarray(imgs))
        self.labels = device_put(jnp.asarray(labs))
        self.depths = device_put(jnp.asarray(depths))
        self.indicators = device_put(
            jnp.asarray(np.stack(dataset.indicators), jnp.float32)
        )

        ph, pw, pd = patch_size
        assert ph <= h and pw <= w and pd <= self.max_d

        # The dataset arrays are jit ARGUMENTS, not closed-over values —
        # closures over large concrete arrays get baked into the program as
        # constants (gigabytes shipped to the compiler).
        def sample_batch(images, labels, depths, indicators, key):
            kv, kh, kw, kd = jax.random.split(key, 4)
            vol_idx = jax.random.randint(kv, (batch_size,), 0, self.size)
            top = jax.random.randint(kh, (batch_size,), 0, h - ph + 1)
            left = jax.random.randint(kw, (batch_size,), 0, w - pw + 1)
            dmax = jnp.maximum(jnp.take(depths, vol_idx) - pd, 0)
            front = (
                jax.random.uniform(kd, (batch_size,)) * (dmax + 1)
            ).astype(jnp.int32)

            # Patch extraction as a sequential loop of 4D dynamic_slice +
            # dynamic_update_slice pairs: each iteration is one DMA copy.
            # Measured on v5e at batch 128 x (128,128,16) from a
            # (4,280,280,120) stack (perf/probe_patch_gather.py,
            # patch_gather_v5e.json): 5.2 ms vs 38.2 ms for the vmapped
            # per-sample dynamic_slice (XLA lowers that to a gather at
            # ~14 GB/s effective) and 29 ms for one-hot selection matmuls
            # (pure data movement has no reuse for the MXU to exploit —
            # the counter-case to the selection-matmul rule). Bit-identical
            # output to the vmapped form.
            imgs_b = jnp.zeros((batch_size, ph, pw, pd), images.dtype)
            labs_b = jnp.zeros((batch_size, ph, pw, pd), labels.dtype)

            def copy_one(b, carry):
                oi, ol = carry
                start = (
                    vol_idx[b].astype(jnp.int32),
                    top[b].astype(jnp.int32),
                    left[b].astype(jnp.int32),
                    front[b].astype(jnp.int32),
                )
                img = jax.lax.dynamic_slice(images, start, (1, ph, pw, pd))
                lab = jax.lax.dynamic_slice(labels, start, (1, ph, pw, pd))
                oi = jax.lax.dynamic_update_slice(oi, img, (b, 0, 0, 0))
                ol = jax.lax.dynamic_update_slice(ol, lab, (b, 0, 0, 0))
                return oi, ol

            imgs_b, labs_b = jax.lax.fori_loop(
                0, batch_size, copy_one, (imgs_b, labs_b)
            )
            inds_b = jnp.take(indicators, vol_idx, axis=0)
            return imgs_b, labs_b, inds_b

        sample_jit = jax.jit(sample_batch)
        self._sample = lambda key: sample_jit(
            self.images, self.labels, self.depths, self.indicators, key
        )

    def num_batches(self, steps_per_epoch: Optional[int] = None) -> int:
        return steps_per_epoch or self.steps_per_epoch

    def epoch(
        self, key: Optional[jax.Array], steps: Optional[int] = None
    ) -> Iterator:
        key = key if key is not None else jax.random.key(0)
        for s in range(steps or self.steps_per_epoch):
            yield self._sample(jax.random.fold_in(key, s))

    def padded_epoch(
        self, key: Optional[jax.Array] = None, steps: Optional[int] = None
    ) -> Iterator:
        """Patch sampling has no notion of 'coverage'; every random patch is
        a real sample, so row_valid is all-ones (eval_epoch compatibility)."""
        valid = jnp.ones((self.batch_size,), bool)
        for batch in self.epoch(key, steps):
            yield (*batch, valid)
