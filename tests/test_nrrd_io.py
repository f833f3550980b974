"""NRRD reader/writer round trips and header parsing."""

import numpy as np
import pytest

from ctseg_tpu.utils import nrrd_io


@pytest.mark.parametrize("encoding", ["raw", "gzip"])
@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float32])
def test_round_trip(tmp_path, rng, encoding, dtype):
    if np.issubdtype(dtype, np.floating):
        arr = rng.random((7, 9, 5)).astype(dtype)
    else:
        arr = rng.integers(-100 if dtype == np.int16 else 0, 100, size=(7, 9, 5)).astype(dtype)
    path = tmp_path / "vol.nrrd"
    nrrd_io.write(path, arr, encoding=encoding)
    back, header = nrrd_io.read(path)
    np.testing.assert_array_equal(back, arr)
    assert tuple(header["sizes"]) == arr.shape
    assert header["dimension"] == 3


def test_space_directions_round_trip(tmp_path, rng):
    arr = rng.integers(0, 2, size=(4, 4, 4)).astype(np.uint8)
    sd = np.diag([1.27, 1.27, 3.0])
    path = tmp_path / "vol.nrrd"
    nrrd_io.write(path, arr, header={"space directions": sd, "space origin": [1, 2, 3]})
    back, header = nrrd_io.read(path)
    np.testing.assert_allclose(header["space directions"], sd)
    np.testing.assert_allclose(header["space origin"], [1, 2, 3])


def test_fortran_index_order(tmp_path):
    """NRRD stores first-axis-fastest; verify our reader honors it."""
    arr = np.arange(24).reshape(2, 3, 4)
    path = tmp_path / "vol.nrrd"
    nrrd_io.write(path, arr, encoding="raw")
    back, _ = nrrd_io.read(path)
    np.testing.assert_array_equal(back, arr)
    # The on-disk byte stream must be Fortran-ordered.
    raw = path.read_bytes().split(b"\n\n", 1)[1]
    flat = np.frombuffer(raw, dtype=arr.dtype)
    np.testing.assert_array_equal(flat, arr.flatten(order="F"))


def test_rejects_non_nrrd(tmp_path):
    p = tmp_path / "x.nrrd"
    p.write_bytes(b"not an nrrd file")
    with pytest.raises(ValueError):
        nrrd_io.read(p)
