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


# ------------------------------------------------------- malformed inputs
# The codec replaces pynrrd everywhere, so a malformed real-world header is
# the most likely first-contact failure with real data (reference reads via
# pynrrd, capstone/utils/miccai.py:286-296). Every failure mode gets a
# specific, actionable error.


def _nrrd_bytes(headers, payload=b""):
    return ("\n".join(["NRRD0004", *headers]) + "\n\n").encode() + payload


@pytest.mark.parametrize("dtype", [np.int8, np.uint16, np.int32, np.uint32,
                                   np.int64, np.float64])
@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_round_trip_all_dtypes(tmp_path, rng, dtype, encoding):
    """Property: write->read is the identity for every supported dtype and
    encoding, across 1D/2D/4D shapes."""
    for shape in [(11,), (5, 3), (2, 3, 2, 4)]:
        if np.issubdtype(dtype, np.floating):
            arr = rng.standard_normal(shape).astype(dtype)
        else:
            info = np.iinfo(dtype)
            arr = rng.integers(
                max(info.min, -1000), min(info.max, 1000), size=shape
            ).astype(dtype)
        p = tmp_path / "v.nrrd"
        nrrd_io.write(p, arr, encoding=encoding)
        back, header = nrrd_io.read(p)
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype


def test_crlf_header_lines(tmp_path, rng):
    """Windows-written NRRDs use CRLF line endings everywhere."""
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p = tmp_path / "crlf.nrrd"
    body = (
        b"NRRD0004\r\n"
        b"type: uint8\r\n"
        b"dimension: 2\r\n"
        b"sizes: 2 3\r\n"
        b"encoding: raw\r\n"
        b"\r\n" + arr.tobytes(order="F")
    )
    p.write_bytes(body)
    back, header = nrrd_io.read(p)
    np.testing.assert_array_equal(back, arr)


def test_unknown_fields_preserved(tmp_path):
    arr = np.zeros((2, 2), np.uint8)
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "dimension: 2", "sizes: 2 2", "encoding: raw",
         "content: synthetic", "custom:=some value"],
        arr.tobytes(order="F"),
    ))
    _, header = nrrd_io.read(p)
    assert header["content"] == "synthetic"
    assert header["custom"] == "some value"


def test_truncated_payload_clear_error(tmp_path):
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint16", "dimension: 2", "sizes: 4 4", "encoding: raw",
         "endian: little"],
        b"\x00" * 10,  # needs 32
    ))
    with pytest.raises(ValueError, match="truncated.*32 bytes.*has 10"):
        nrrd_io.read(p)


def test_truncated_gzip_clear_error(tmp_path, rng):
    arr = rng.integers(0, 255, size=(16, 16)).astype(np.uint8)
    p = tmp_path / "v.nrrd"
    nrrd_io.write(p, arr, encoding="gzip")
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 8])  # chop the gzip tail
    with pytest.raises(ValueError, match="gzip|truncated"):
        nrrd_io.read(p)


def test_missing_required_fields(tmp_path):
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(["type: uint8", "encoding: raw"]))
    with pytest.raises(ValueError, match="missing 'sizes'"):
        nrrd_io.read(p)
    p.write_bytes(_nrrd_bytes(["sizes: 2 2", "encoding: raw"]))
    with pytest.raises(ValueError, match="missing 'type'"):
        nrrd_io.read(p)


def test_bad_sizes(tmp_path):
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "sizes: 2 banana", "encoding: raw"]))
    with pytest.raises(ValueError, match="unparseable sizes"):
        nrrd_io.read(p)
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "sizes: 2 0", "encoding: raw"]))
    with pytest.raises(ValueError, match="non-positive"):
        nrrd_io.read(p)
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "dimension: 3", "sizes: 2 2", "encoding: raw"],
        b"\x00" * 4))
    with pytest.raises(ValueError, match="dimension 3 does not match"):
        nrrd_io.read(p)


def test_unknown_type_and_encoding(tmp_path):
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: quaternion", "sizes: 2 2", "encoding: raw"], b"\x00" * 4))
    with pytest.raises(ValueError, match="unsupported NRRD element type"):
        nrrd_io.read(p)
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "sizes: 2 2", "encoding: bzip2"], b"\x00" * 4))
    with pytest.raises(NotImplementedError, match="bzip2"):
        nrrd_io.read(p)


def test_detached_data_file_clear_error(tmp_path):
    p = tmp_path / "v.nhdr"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "sizes: 2 2", "encoding: raw",
         "data file: v.raw"]))
    with pytest.raises(NotImplementedError, match="detached"):
        nrrd_io.read(p)


def test_bad_vector_fields(tmp_path):
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "sizes: 2 2", "encoding: raw",
         "space origin: 1,2"], b"\x00" * 4))
    with pytest.raises(ValueError, match="bad NRRD vector"):
        nrrd_io.read(p)


def test_write_unsupported_dtype(tmp_path):
    with pytest.raises(ValueError, match="cannot write dtype"):
        nrrd_io.write(tmp_path / "v.nrrd", np.zeros((2, 2), np.float16))


def test_big_endian_payload(tmp_path):
    """endian: big headers decode correctly (PDDCA is little, but the
    format allows both)."""
    arr = np.array([[1, 2], [300, 4]], dtype=">u2")
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint16", "dimension: 2", "sizes: 2 2", "encoding: raw",
         "endian: big"],
        arr.tobytes(order="F"),
    ))
    back, _ = nrrd_io.read(p)
    np.testing.assert_array_equal(back.astype(np.uint16), arr.astype(np.uint16))


def test_extra_trailing_bytes_tolerated(tmp_path):
    """Some writers pad the payload; extra bytes beyond sizes are ignored."""
    arr = np.arange(4, dtype=np.uint8).reshape(2, 2)
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "dimension: 2", "sizes: 2 2", "encoding: raw"],
        arr.tobytes(order="F") + b"\x99\x99",
    ))
    back, _ = nrrd_io.read(p)
    np.testing.assert_array_equal(back, arr)


def test_malformed_dimension_value_raises_nrrd_error(tmp_path):
    """A non-integer 'dimension' value gets the hardened NrrdError with the
    file path, not a bare int() ValueError."""
    arr = np.arange(4, dtype=np.uint8).reshape(2, 2)
    p = tmp_path / "v.nrrd"
    p.write_bytes(_nrrd_bytes(
        ["type: uint8", "dimension: two", "sizes: 2 2", "encoding: raw"],
        arr.tobytes(order="F"),
    ))
    with pytest.raises(nrrd_io.NrrdError, match="dimension"):
        nrrd_io.read(p)
