"""MetaImage (.mha) codec + registration-overlay transform loading.

Reference behavior being matched: the viewer accepts ``.npy``/``.mha``
transform files as overlays and re-reads the slide through them
(reference ``visualization/tileserver.py:512-592``).
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.utils.metaimage import load_transform, read_mha, write_mha


class TestMhaRoundtrip:
    def test_scalar_2d(self, tmp_path) -> None:
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        path = write_mha(tmp_path / "a.mha", arr)
        out = read_mha(path)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, arr)

    def test_vector_field(self, tmp_path) -> None:
        rng = np.random.default_rng(0)
        field = rng.normal(size=(16, 24, 2)).astype(np.float64)
        path = write_mha(tmp_path / "f.mha", field)
        out = read_mha(path)
        assert out.shape == (16, 24, 2)
        np.testing.assert_array_equal(out, field)

    def test_compressed(self, tmp_path) -> None:
        field = np.ones((8, 8, 2), dtype=np.float32) * 3.5
        path = write_mha(tmp_path / "c.mha", field, compressed=True)
        raw_sz = write_mha(tmp_path / "r.mha", field).stat().st_size
        assert path.stat().st_size < raw_sz
        np.testing.assert_array_equal(read_mha(path), field)

    def test_integer_types(self, tmp_path) -> None:
        for dtype in (np.uint8, np.int16, np.uint32, np.int64):
            arr = np.arange(6, dtype=dtype).reshape(2, 3)
            np.testing.assert_array_equal(
                read_mha(write_mha(tmp_path / "i.mha", arr)), arr
            )

    def test_3d_scalar(self, tmp_path) -> None:
        arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        path = write_mha(tmp_path / "v.mha", arr, vector=False)
        np.testing.assert_array_equal(read_mha(path), arr)

    def test_big_endian_payload(self, tmp_path) -> None:
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        header = (
            "ObjectType = Image\nNDims = 2\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = True\nCompressedData = False\n"
            "DimSize = 3 2\nElementType = MET_FLOAT\n"
            "ElementDataFile = LOCAL\n"
        ).encode()
        path = tmp_path / "be.mha"
        path.write_bytes(header + arr.astype(">f4").tobytes())
        np.testing.assert_array_equal(read_mha(path), arr)

    def test_truncated_data_raises(self, tmp_path) -> None:
        arr = np.zeros((4, 4), dtype=np.float64)
        path = write_mha(tmp_path / "t.mha", arr)
        data = path.read_bytes()
        path.write_bytes(data[:-16])
        with pytest.raises(ValueError, match="truncated"):
            read_mha(path)

    def test_missing_terminator_raises(self, tmp_path) -> None:
        path = tmp_path / "h.mha"
        path.write_bytes(b"ObjectType = Image\nNDims = 2\n")
        with pytest.raises(ValueError, match="Truncated MetaImage header"):
            read_mha(path)

    def test_corrupt_compressed_payload_raises_valueerror(self, tmp_path) -> None:
        field = np.ones((8, 8, 2), dtype=np.float32)
        path = write_mha(tmp_path / "c.mha", field, compressed=True)
        data = path.read_bytes()
        # flip bytes inside the zlib stream (past the header)
        corrupt = bytearray(data)
        corrupt[-4:] = b"\x00\x00\x00\x00"
        corrupt[-12:-8] = b"\xff\xff\xff\xff"
        path.write_bytes(bytes(corrupt))
        with pytest.raises(ValueError, match="corrupt|truncated"):
            read_mha(path)

    def test_truncated_compressed_payload_raises_valueerror(self, tmp_path) -> None:
        field = np.arange(256, dtype=np.float64).reshape(8, 16, 2)
        path = write_mha(tmp_path / "tc.mha", field, compressed=True)
        data = path.read_bytes()
        path.write_bytes(data[:-8])
        with pytest.raises(ValueError, match="corrupt|truncated"):
            read_mha(path)

    def test_3d_scalar_small_last_dim_ambiguous(self, tmp_path) -> None:
        # (D, H, W=4) volumes are ambiguous: require explicit vector arg
        arr = np.zeros((5, 6, 4), dtype=np.float32)
        path = write_mha(tmp_path / "s.mha", arr, vector=False)
        np.testing.assert_array_equal(read_mha(path), arr)
        # 4-D with small trailing axis is ambiguous without vector=
        with pytest.raises(ValueError, match="[Aa]mbiguous"):
            write_mha(tmp_path / "amb.mha", np.zeros((2, 5, 6, 4), np.float32))

    def test_displacement_field_auto_vector(self, tmp_path) -> None:
        # (H, W, 2) auto-detects as a 2-D vector image
        field = np.zeros((6, 7, 2), dtype=np.float64)
        path = write_mha(tmp_path / "d.mha", field)
        out = read_mha(path)
        assert out.shape == (6, 7, 2)

    def test_external_datafile_rejected(self, tmp_path) -> None:
        path = tmp_path / "x.mha"
        path.write_bytes(
            b"ObjectType = Image\nNDims = 2\nDimSize = 1 1\n"
            b"ElementType = MET_UCHAR\nElementDataFile = x.raw\n"
        )
        with pytest.raises(ValueError, match="LOCAL"):
            read_mha(path)


class TestLoadTransform:
    def test_npy_affine(self, tmp_path) -> None:
        affine = np.array([[1.0, 0, 5], [0, 1.0, -3], [0, 0, 1]])
        path = tmp_path / "a.npy"
        np.save(path, affine)
        np.testing.assert_array_equal(load_transform(path), affine)

    def test_npy_2x3_affine_promoted(self, tmp_path) -> None:
        path = tmp_path / "a.npy"
        np.save(path, np.array([[2.0, 0, 1], [0, 2.0, 2]]))
        out = load_transform(path)
        assert out.shape == (3, 3)
        np.testing.assert_array_equal(out[2], [0, 0, 1])

    def test_mha_field(self, tmp_path) -> None:
        field = np.zeros((10, 12, 2), dtype=np.float64)
        field[..., 0] = 4.0
        path = write_mha(tmp_path / "f.mha", field)
        out = load_transform(path)
        assert out.shape == (10, 12, 2)

    def test_bad_shape_raises(self, tmp_path) -> None:
        path = tmp_path / "b.npy"
        np.save(path, np.zeros((5, 5)))
        with pytest.raises(ValueError, match="shape"):
            load_transform(path)

    def test_bad_suffix_raises(self, tmp_path) -> None:
        with pytest.raises(ValueError, match="file type"):
            load_transform(tmp_path / "t.json")
