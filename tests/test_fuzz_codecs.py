"""Randomized round-trip + malformed-input fuzzing for the first-party
codecs (WKB/WKT geometry, TIFF, DICOM, JP2, zarrlite).

The reference outsources all of these to hardened C libraries
(GEOS/Shapely, tifffile, pydicom/wsidicom, glymur, zarr); this build
owns the parsers, so the robustness contract is checked directly:
structured-random inputs round-trip exactly, and corrupted/truncated
inputs either decode (possibly to garbage pixels — mutations can land
in payload bytes) or raise a clean Python exception promptly. They
must never hang, recurse unboundedly, or kill the process; the whole
module runs under the suite's normal timeout.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import (
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    wkb_to_geometry,
    wkt_to_geometry,
)

N_FUZZ = 50


def random_geometry(rng: np.random.Generator, *, allow_collection: bool = True):
    from tiatoolbox_tpu.annotation.geometry import GeometryCollection

    kind = int(rng.integers(0, 7 if allow_collection else 6))
    if kind == 6:
        return GeometryCollection([
            random_geometry(rng, allow_collection=False)
            for _ in range(int(rng.integers(1, 4)))
        ])

    def ring(n):
        pts = rng.normal(0, 100, (n, 2)).round(3)
        return [tuple(p) for p in np.vstack([pts, pts[:1]])]

    if kind == 0:
        return Point(*rng.normal(0, 1e6, 2).round(6))
    if kind == 1:
        return LineString(
            [tuple(p) for p in rng.normal(0, 1e3, (int(rng.integers(2, 20)), 2))]
        )
    if kind == 2:
        return Polygon(ring(int(rng.integers(3, 30))))
    if kind == 3:
        return MultiPoint(
            [Point(*p) for p in rng.normal(0, 50, (int(rng.integers(1, 8)), 2))]
        )
    if kind == 4:
        return MultiLineString(
            [
                LineString([tuple(p) for p in rng.normal(0, 50, (3, 2))])
                for _ in range(int(rng.integers(1, 5)))
            ]
        )
    return MultiPolygon(
        [Polygon(ring(5)) for _ in range(int(rng.integers(1, 5)))]
    )


class TestGeometryFuzz:
    def test_wkb_roundtrip_random(self) -> None:
        rng = np.random.default_rng(0)
        for _ in range(N_FUZZ):
            geom = random_geometry(rng)
            back = wkb_to_geometry(geom.to_wkb())
            assert type(back) is type(geom)
            assert back.to_wkb() == geom.to_wkb()

    def test_wkt_roundtrip_random(self) -> None:
        rng = np.random.default_rng(1)
        for _ in range(N_FUZZ):
            geom = random_geometry(rng)
            back = wkt_to_geometry(geom.to_wkt())
            assert type(back) is type(geom)
            np.testing.assert_allclose(
                np.asarray(back.bounds), np.asarray(geom.bounds), rtol=1e-6
            )

    def test_wkb_truncation_raises_cleanly(self) -> None:
        rng = np.random.default_rng(2)
        geom = random_geometry(rng)
        wkb = geom.to_wkb()
        for cut in range(0, len(wkb) - 1, max(1, len(wkb) // 17)):
            with pytest.raises(Exception):  # noqa: B017 - clean raise, no hang
                wkb_to_geometry(wkb[:cut])

    def test_wkb_bitflips_never_hang(self) -> None:
        rng = np.random.default_rng(3)
        geom = Polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
        wkb = bytearray(geom.to_wkb())
        for _ in range(N_FUZZ):
            mutated = bytearray(wkb)
            for _ in range(int(rng.integers(1, 4))):
                mutated[int(rng.integers(0, len(mutated)))] = int(
                    rng.integers(0, 256)
                )
            try:
                wkb_to_geometry(bytes(mutated))
            except Exception:  # noqa: BLE001, S110 - clean failure is the contract
                pass

    def test_wkt_garbage_raises_cleanly(self) -> None:
        for bad in ("", "POLYGON", "POINT ()", "POINT (1", "LINESTRING (a b)",
                    "POLYGON ((1 2, 3 4", "MULTIPOLYGON (((",
                    "GEOMETRYBLOB (1 2)"):
            with pytest.raises(Exception):  # noqa: B017
                wkt_to_geometry(bad)


class TestTiffFuzz:
    @pytest.fixture(scope="class")
    def tiff_bytes(self, tmp_path_factory) -> bytes:
        from tiatoolbox_tpu.data.synth import make_synthetic_slide

        path = tmp_path_factory.mktemp("tfz") / "s.tiff"
        make_synthetic_slide(path, size=(512, 384), mpp=0.5)
        return path.read_bytes()

    def test_truncations_raise_cleanly(self, tiff_bytes, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.tiffio import TiffFile

        for frac in (0.01, 0.1, 0.5, 0.9):
            p = tmp_path / f"t{frac}.tiff"
            p.write_bytes(tiff_bytes[: int(len(tiff_bytes) * frac)])
            try:
                tf = TiffFile(str(p))
                # header-complete cuts may open; reads must then return
                # or fail cleanly (the region reader pads missing area)
                tf.read_region(0, (0, 0), (64, 64))
            except Exception:  # noqa: BLE001, S110
                pass

    def test_bitflipped_header_raises_cleanly(self, tiff_bytes, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.tiffio import TiffFile

        rng = np.random.default_rng(4)
        for i in range(N_FUZZ):
            data = bytearray(tiff_bytes)
            # concentrate mutations in the header/IFD region
            for _ in range(3):
                data[int(rng.integers(0, min(4096, len(data))))] = int(
                    rng.integers(0, 256)
                )
            p = tmp_path / f"b{i}.tiff"
            p.write_bytes(bytes(data))
            try:
                tf = TiffFile(str(p))
                tf.read_region(0, (0, 0), (64, 64))
            except Exception:  # noqa: BLE001, S110
                pass


class TestDicomFuzz:
    @pytest.fixture(scope="class")
    def dcm_bytes(self, tmp_path_factory) -> bytes:
        from tiatoolbox_tpu.data.synth import make_synthetic_dicom

        path = tmp_path_factory.mktemp("dfz") / "s.dcm"
        make_synthetic_dicom(path, size=(256, 192), frame_size=64, mpp=0.5)
        return path.read_bytes()

    def test_truncations_raise_cleanly(self, dcm_bytes, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.dicom import DicomSlide

        for frac in (0.05, 0.3, 0.7, 0.95):
            p = tmp_path / f"t{frac}.dcm"
            p.write_bytes(dcm_bytes[: int(len(dcm_bytes) * frac)])
            try:
                DicomSlide(p).read_region(0, (0, 0), (64, 64))
            except Exception:  # noqa: BLE001, S110
                pass

    def test_bitflips_never_hang(self, dcm_bytes, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.dicom import DicomSlide

        rng = np.random.default_rng(5)
        for i in range(N_FUZZ):
            data = bytearray(dcm_bytes)
            for _ in range(4):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
            p = tmp_path / f"b{i}.dcm"
            p.write_bytes(bytes(data))
            try:
                DicomSlide(p).read_region(0, (0, 0), (64, 64))
            except Exception:  # noqa: BLE001, S110
                pass


class TestJp2Fuzz:
    def test_truncated_and_garbage_raise_cleanly(self, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.jp2 import J2KCodestream

        candidates = [
            b"",
            b"\x00" * 64,
            bytes.fromhex("ff4fff51") + b"\x00" * 16,  # SOC+SIZ cut short
            bytes.fromhex("0000000c6a5020200d0a870a") + b"\x01" * 8,  # jp2 sig
            bytes.fromhex("ff4fff51002f") + b"\xff" * 64,  # bogus SIZ body
        ]
        for data in candidates:
            try:
                J2KCodestream(data)
            except Exception:  # noqa: BLE001, S110
                pass

    def test_truncated_real_codestream(self, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import synthetic_he_patch
        from tiatoolbox_tpu.wsicore.jp2 import J2KCodestream, encode_tiled_j2k

        data = encode_tiled_j2k(synthetic_he_patch((128, 128), seed=1), 64)
        for frac in (0.1, 0.4, 0.8):
            try:
                cs = J2KCodestream(data[: int(len(data) * frac)])
                cs.decode_tile(0)
            except Exception:  # noqa: BLE001, S110
                pass


class TestZarrliteFuzz:
    def test_corrupt_chunk_and_meta_raise_cleanly(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.zarrlite import ZarrArray

        arr = ZarrArray.create(
            tmp_path / "z", shape=(64, 64), chunks=(32, 32), dtype=np.uint8
        )
        arr[:, :] = 7
        chunk_files = [
            f for f in sorted((tmp_path / "z").iterdir())
            if not f.name.startswith(".")
        ]
        assert chunk_files
        chunk_files[0].write_bytes(b"\x00\x01garbage")
        try:
            np.asarray(ZarrArray(tmp_path / "z")[:, :])
        except Exception:  # noqa: BLE001, S110
            pass
        (tmp_path / "z" / ".zarray").write_text("{not json")
        with pytest.raises(Exception):  # noqa: B017
            ZarrArray(tmp_path / "z")
