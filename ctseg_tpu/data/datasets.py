"""Packed datasets: the TPU-native replacement for per-slice npz + DataLoader.

The reference stores one npz per slice and re-reads + re-augments each item in
CPU dataloader workers every epoch (capstone/data/datasets.py:37-55,
capstone/data/data_module.py:46-71). Here a whole split is packed into three
dense arrays — images (N, H, W) raw HU float32, labels (N, H, W) uint8
(structure masks pre-squashed to a label map, highest class id wins), and
mask indicators (N, 9) — that live in HBM for the entire run. Windowing,
resizing and augmentation all happen on device inside the jitted train step.

`pack_slices` consumes the same `{patient}_{index}.npz{image, masks,
mask_indicator}` files the conversion CLI writes (and that the reference
writes), in sorted order for cross-OS determinism (reference
capstone/data/datasets.py:29-32).
"""

import warnings
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

from ctseg_tpu.constants import NUM_CLASSES, NUM_STRUCTURES


def _squash_masks_np(masks: np.ndarray) -> np.ndarray:
    """(S, *spatial) binary masks -> (*spatial) uint8 label map."""
    class_ids = np.arange(1, NUM_CLASSES, dtype=np.uint8)
    shape = (NUM_STRUCTURES,) + (1,) * (masks.ndim - 1)
    return (masks.astype(np.uint8) * class_ids.reshape(shape)).max(axis=0)


class PackedDataset2D:
    """A split of 2D slices packed into dense host arrays.

    `spacings` is an optional (N, 2) float array of per-slice in-plane
    (row, col) voxel spacing in millimetres, carried from the NRRD header
    (z-first patient spacing sliced to (y, x); reference
    capstone/utils/miccai.py:77-82 — whose per-slice npz contract drops
    it). With spacing, 2D HD95 reports millimetres; None (legacy packed
    files) falls back to voxel units, same contract as PackedDataset3D.
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        indicators: np.ndarray,
        names: Optional[list] = None,
        spacings: Optional[np.ndarray] = None,
    ):
        assert images.ndim == 3 and labels.ndim == 3
        assert images.shape == labels.shape
        assert indicators.shape == (images.shape[0], NUM_STRUCTURES)
        assert spacings is None or (
            np.asarray(spacings).shape == (images.shape[0], 2)
        )
        self.images = images
        self.labels = labels
        self.indicators = indicators
        self.names = names or [str(i) for i in range(images.shape[0])]
        self.spacings = None if spacings is None else np.asarray(
            spacings, np.float32
        )

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def spatial_shape(self) -> Tuple[int, int]:
        return self.images.shape[1:]

    def save(self, path: Union[str, Path]) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        extra = {}
        if self.spacings is not None:
            extra["spacings"] = self.spacings
        np.savez_compressed(
            path,
            images=self.images,
            labels=self.labels,
            indicators=self.indicators,
            names=np.array(self.names),
            **extra,
        )

    @classmethod
    def load(cls, path: Union[str, Path]) -> "PackedDataset2D":
        with np.load(path, allow_pickle=False) as z:
            return cls(
                images=z["images"],
                labels=z["labels"],
                indicators=z["indicators"],
                names=[str(n) for n in z["names"]],
                spacings=z["spacings"] if "spacings" in z.files else None,
            )

    @classmethod
    def concatenate(cls, *datasets: "PackedDataset2D") -> "PackedDataset2D":
        """Train + valid concatenation (reference FullMiccaiDataModule2D,
        capstone/data/data_module.py:74-88). Spacing survives only when
        EVERY part carries it — mixing unit-less rows into a
        millimetre-labeled table is worse than falling back to voxels."""
        spacings = None
        if all(d.spacings is not None for d in datasets):
            spacings = np.concatenate([d.spacings for d in datasets])
        return cls(
            images=np.concatenate([d.images for d in datasets]),
            labels=np.concatenate([d.labels for d in datasets]),
            indicators=np.concatenate([d.indicators for d in datasets]),
            names=sum((d.names for d in datasets), []),
            spacings=spacings,
        )


def pack_slices(npz_dir: Union[str, Path]) -> PackedDataset2D:
    """Pack a directory of per-slice npz files into a PackedDataset2D.

    Reads the optional per-slice in-plane `spacing` the 2D converter
    writes. Same mixed-split rule as `pack_volumes`: if ANY slice lacks
    spacing the whole split packs without it (with a warning) — HD95 then
    reports voxel units rather than mixing units under a "mm" label.
    """
    paths = sorted(Path(npz_dir).glob("*.npz"))
    assert paths, f"no npz slices found in {npz_dir}"
    images, labels, indicators, names, spacings = [], [], [], [], []
    missing_spacing = []
    for p in paths:
        with np.load(p) as z:
            img = z["image"]  # (1, H, W)
            masks = z["masks"]  # (9, H, W)
            ind = z["mask_indicator"]  # (9,)
            if "spacing" in z.files:
                spacings.append(z["spacing"].astype(np.float32))
            else:
                missing_spacing.append(p.name)
        images.append(img[0].astype(np.float32))
        labels.append(_squash_masks_np(masks))
        indicators.append(ind.astype(np.float32))
        names.append(p.stem)
    if missing_spacing and len(missing_spacing) < len(paths):
        shown = missing_spacing[:5]
        warnings.warn(
            "pack_slices: no in-plane spacing for "
            f"{shown}{'...' if len(missing_spacing) > 5 else ''} while "
            "other slices carry it; packing the whole split WITHOUT "
            "spacing (HD95 falls back to voxel units) rather than mixing "
            "units under one label."
        )
    return PackedDataset2D(
        images=np.stack(images),
        labels=np.stack(labels),
        indicators=np.stack(indicators),
        names=names,
        spacings=np.stack(spacings) if not missing_spacing else None,
    )


class PackedDataset3D:
    """Whole volumes packed per patient (shapes vary -> list of arrays).

    Mirrors the reference volumetric dataset (capstone/volumetric/
    datasets.py:11-48): per patient a (D, H, W) image, a (D, H, W) uint8
    label map, and a (9,) indicator — plus, unlike the reference's npz
    contract (which drops the NRRD header), the per-patient voxel
    `spacings` ((3,) float, z-first like the volume layout; reference
    capstone/utils/miccai.py:77-82), so surface metrics can report
    millimetres. `spacings` is None for legacy packed files; callers fall
    back to voxel units then.
    """

    def __init__(self, images, labels, indicators, names=None, spacings=None):
        assert len(images) == len(labels) == len(indicators)
        assert spacings is None or len(spacings) == len(images)
        self.images = images
        self.labels = labels
        self.indicators = indicators
        self.names = names or [str(i) for i in range(len(images))]
        self.spacings = spacings

    def __len__(self) -> int:
        return len(self.images)

    def save(self, path: Union[str, Path]) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays: Dict[str, np.ndarray] = {}
        for i, (img, lab, ind) in enumerate(
            zip(self.images, self.labels, self.indicators)
        ):
            arrays[f"image_{i}"] = img
            arrays[f"label_{i}"] = lab
            arrays[f"indicator_{i}"] = ind
            if self.spacings is not None:
                arrays[f"spacing_{i}"] = np.asarray(
                    self.spacings[i], np.float32
                )
        arrays["names"] = np.array(self.names)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: Union[str, Path]) -> "PackedDataset3D":
        with np.load(path, allow_pickle=False) as z:
            names = [str(n) for n in z["names"]]
            n = len(names)
            spacings = None
            if n and "spacing_0" in z.files:
                spacings = [z[f"spacing_{i}"] for i in range(n)]
            return cls(
                images=[z[f"image_{i}"] for i in range(n)],
                labels=[z[f"label_{i}"] for i in range(n)],
                indicators=[z[f"indicator_{i}"] for i in range(n)],
                names=names,
                spacings=spacings,
            )


def pack_volumes(npz_dir: Union[str, Path]) -> PackedDataset3D:
    """Pack a directory of per-patient npz volumes into a PackedDataset3D.

    Reads the optional per-patient `spacing` the 3D converter writes. A
    split where no file carries spacing packs with spacings=None
    (voxel-unit metrics). A MIXED split (some files missing spacing, e.g.
    one NRRD without 'space directions') also packs with spacings=None and
    warns naming the offending files: back-filling unit spacing would let
    downstream HD95 silently average voxel-unit distances into a table
    labeled millimetres.
    """
    paths = sorted(Path(npz_dir).glob("*.npz"))
    assert paths, f"no npz volumes found in {npz_dir}"
    images, labels, indicators, names, spacings = [], [], [], [], []
    missing_spacing = []
    for p in paths:
        with np.load(p) as z:
            img = z["image"]  # (1, D, H, W)
            masks = z["masks"]  # (9, D, H, W)
            ind = z["mask_indicator"]
            if "spacing" in z.files:
                spacings.append(z["spacing"].astype(np.float32))
            else:
                # No placeholder: the spacings list is discarded whenever
                # ANY file lacks spacing (back-filling unit spacing would
                # silently mislabel HD95 mm numbers).
                missing_spacing.append(p.name)
        img0 = img[0]
        # Integer HU (PDDCA NRRDs are int16) stays integer: half the packed
        # bytes, half the host->device upload per eval chunk (measured
        # transfer-dominant on a tunneled chip, perf/probe_eval_inloop.py),
        # and bit-exact downstream — every jitted consumer casts to float32
        # on device, and int16 -> float32 is exact. Float inputs normalize
        # to float32 as before.
        if np.issubdtype(img0.dtype, np.floating):
            img0 = img0.astype(np.float32)
        images.append(img0)
        labels.append(_squash_masks_np(masks))
        indicators.append(ind.astype(np.float32))
        names.append(p.stem)
    if missing_spacing and len(missing_spacing) < len(paths):
        warnings.warn(
            "pack_volumes: no voxel spacing for "
            f"{missing_spacing} while other volumes carry it; packing the "
            "whole split WITHOUT spacing (surface metrics fall back to "
            "voxel units) rather than mixing units under one label. "
            "Re-convert those patients from NRRDs with 'space directions' "
            "to get millimetre metrics."
        )
    have_spacing = not missing_spacing
    return PackedDataset3D(
        images, labels, indicators, names,
        spacings=spacings if have_spacing else None,
    )
