"""Domain model for MICCAI 2015 PDDCA patients (numpy-native).

Capability parity with reference capstone/utils/miccai.py (Volume / Patient /
PatientCollection / load_nrrd), redesigned without torch: volumes are numpy
arrays in channel-first (C, D, H, W) layout on the host; device work happens
later in the jitted pipeline, not here.
"""

import functools
import math
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from ctseg_tpu.constants import (
    CROP_BOUNDARY_X,
    CROP_BOUNDARY_Y,
    CROP_BOUNDARY_Z,
    STRUCTURES,
)
from ctseg_tpu.utils import nrrd_io
from ctseg_tpu.utils.attrdict import AttrDict

LANDMARK_COLS: List[str] = [
    "id", "x", "y", "z", "ow", "ox", "oy", "oz",
    "vis", "sel", "lock", "label", "desc", "associatedNodeID",
]


def load_nrrd_as_array(path: Union[str, Path]) -> Tuple[np.ndarray, Dict]:
    """Load an NRRD volume as a (C, D, H, W) array plus its raw header.

    PDDCA files store (H, W, D); a missing channel axis is added, then axes are
    transposed to channel-first/z-first (reference miccai.py:286-296 contract).
    """
    img, headers = nrrd_io.read(path)
    if img.ndim == 3:
        img = img[:, :, :, np.newaxis]  # (H, W, D, C)
    array = np.transpose(img, (3, 2, 0, 1))  # (C, D, H, W)
    return array, headers


class Volume:
    """One NRRD volume (image or structure mask) as a (C, D, H, W) array."""

    def __init__(self, path: Optional[str] = None, data: Optional[np.ndarray] = None):
        if path is not None:
            self._path = str(path)
            self._data, self._headers = load_nrrd_as_array(path)
        else:
            assert data is not None, "Either one of path or data (array) is required"
            self._path = self._headers = None
            self._data = self._check_data(data)
        self._is_data_modified = False

    def __repr__(self):
        return f"Volume(path={self._path})"

    @property
    def data(self) -> np.ndarray:
        return self._data

    @data.setter
    def data(self, arr: np.ndarray) -> None:
        self._data = self._check_data(arr)
        self._is_data_modified = True

    @property
    def path(self) -> Optional[str]:
        return self._path

    @property
    def headers(self) -> Optional[Dict]:
        return self._headers

    @property
    def is_gray(self) -> bool:
        return self.data.shape[0] == 1

    @property
    def spacing(self) -> Optional[np.ndarray]:
        """Voxel spacing in z-first order (matching the (C, D, H, W) layout)."""
        if self._headers is not None and "space directions" in self._headers:
            return np.asarray(self._headers["space directions"]).diagonal()[::-1]
        return None

    @staticmethod
    def _check_data(data: np.ndarray) -> np.ndarray:
        assert data.ndim == 4, "Expected data to be of shape: (C, D, H, W)"
        assert data.shape[0] == 1, "Expected data to be in channel first format"
        return np.asarray(data)

    def _crop_data(self, min_z, max_z, min_x, max_x, min_y, max_y) -> None:
        """Crop in place; integer coordinates, no validation (internal use)."""
        self.data = self.data[:, min_z:max_z, min_x:max_x, min_y:max_y]

    def as_numpy(self, reverse_dims: bool = False) -> np.ndarray:
        arr = self.data
        if reverse_dims:
            arr = np.transpose(arr, (2, 3, 1, 0))  # back to (H, W, D, C)
        return arr

    def as_grid(
        self, nrow: int = 4, pad_value: float = 1.0, reverse_dims: bool = True
    ) -> np.ndarray:
        """Tile the D slices into a (nH, nW[, C]) gallery image
        (reference miccai.py:111-123, sans torchvision)."""
        data = np.asarray(self.data, dtype=np.float64)  # (1, D, H, W)
        d, h, w = data.shape[1], data.shape[2], data.shape[3]
        ncol = nrow
        nrows = -(-d // ncol)
        pad = 2
        grid = np.full(
            (nrows * (h + pad) + pad, ncol * (w + pad) + pad), pad_value
        )
        for i in range(d):
            r, c = divmod(i, ncol)
            y = r * (h + pad) + pad
            x = c * (w + pad) + pad
            grid[y : y + h, x : x + w] = data[0, i]
        if reverse_dims:
            return grid[..., None]  # (nH, nW, C=1)
        return grid[None]  # (C=1, nH, nW)


class Patient:
    """One PDDCA patient directory: img.nrrd + structures/*.nrrd + *.fcsv."""

    def __init__(self, patient_dir: Union[str, Path]):
        self._patient_dir = str(patient_dir)
        self.meta_data = self._store_meta_data()
        self._image = Volume(self.meta_data["image"])
        self._structures = self._load_structures()
        self._landmarks = self._load_landmarks()
        self._is_cropped = False

    def __repr__(self):
        return f"Patient(patient_dir={self.patient_dir})"

    @property
    def image(self) -> Volume:
        return self._image

    @property
    def structures(self) -> AttrDict:
        return self._structures

    @property
    def num_slides(self) -> int:
        return self.image.data.shape[1]

    @property
    def landmarks(self) -> Optional[List[Dict]]:
        return self._landmarks

    @property
    def patient_dir(self) -> str:
        return self._patient_dir

    def _store_meta_data(self) -> Dict:
        directory = Path(self.patient_dir)
        meta: Dict = {
            "image": (directory / "img.nrrd").as_posix(),
            "structures": {s: None for s in STRUCTURES},
            "landmarks": None,
        }
        fcsv = sorted(directory.glob("*.fcsv"))
        if fcsv:  # no landmarks for test patients
            meta["landmarks"] = fcsv[0].as_posix()
        structures_dir = directory / "structures"
        if structures_dir.is_dir():
            for structure_path in structures_dir.iterdir():
                meta["structures"][structure_path.stem] = structure_path.as_posix()
        return meta

    def _load_structures(self) -> AttrDict:
        temp = AttrDict()
        for structure, path in self.meta_data["structures"].items():
            temp[structure] = Volume(path) if path is not None else None
        return temp

    def _load_landmarks(self) -> Optional[List[Dict]]:
        path = self.meta_data["landmarks"]
        if path is None:
            return None
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                values = line.split(",")
                rows.append(dict(zip(LANDMARK_COLS, values)))
        return rows

    def crop_data(
        self,
        boundary_x: Tuple[int, int] = CROP_BOUNDARY_X,
        boundary_y: Tuple[int, int] = CROP_BOUNDARY_Y,
        boundary_z: Tuple[float, float] = CROP_BOUNDARY_Z,
    ) -> None:
        """Crop image + all structures to the anatomically relevant box.

        x/y are absolute pixel bounds, z is a fraction of the slide count
        (ceil-rounded), matching the reference contract (miccai.py:193-227).
        """
        min_x, max_x = boundary_x
        min_y, max_y = boundary_y
        min_z = math.ceil(boundary_z[0] * self.num_slides)
        max_z = math.ceil(boundary_z[1] * self.num_slides)

        assert min_x < max_x, "Invalid x-axis boundaries"
        assert min_y < max_y, "Invalid y-axis boundaries"
        assert min_z < max_z, "Invalid z-axis boundaries"

        self.image._crop_data(min_z, max_z, min_x, max_x, min_y, max_y)
        for structure in STRUCTURES:
            if self.structures[structure] is not None:
                self.structures[structure]._crop_data(
                    min_z, max_z, min_x, max_x, min_y, max_y
                )
        self._is_cropped = True

    def combine_segmentation_masks(self, structure_list: List[str]) -> np.ndarray:
        """Logical-OR overlay of several structure masks, shape (C, D, H, W)."""
        assert len(structure_list) > 1, "A minimum of 2 structures are required"
        arrays = []
        for structure in structure_list:
            assert structure in STRUCTURES, f"Invalid structure argument: {structure}"
            vol = self.structures[structure]
            if vol is not None:
                arrays.append(vol.as_numpy())
        return functools.reduce(np.logical_or, arrays).astype("uint8")


class PatientCollection:
    """All `0522c*` patient directories under a path, with a map helper."""

    def __init__(self, path: Union[str, Path]):
        self._path = str(path)
        self._patient_paths = {
            directory.name: directory.as_posix()
            for directory in sorted(Path(path).glob("0522c*"))
        }
        assert len(self._patient_paths) > 0, (
            f"No patients found at the specified location: {path}"
        )

    @property
    def patient_paths(self) -> Dict[str, str]:
        return self._patient_paths

    def apply_function(
        self, func: Callable, disable_progress: bool = False, **kwargs
    ) -> Dict:
        """Apply ``func(Patient, **kwargs)`` to every patient; collect results."""
        try:
            from tqdm import tqdm

            iterator = tqdm(self.patient_paths.items(), disable=disable_progress)
        except ImportError:
            iterator = self.patient_paths.items()
        return {name: func(Patient(path), **kwargs) for name, path in iterator}
