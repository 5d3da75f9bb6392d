"""Adversarial/edge-format fixtures for the TIFF/MIRAX readers.

VERDICT r1 gap: readers were validated only on friendly synthetic
containers. These fixtures exercise the hostile corners real files
hit: BigTIFF 64-bit layout, JPEG tiles with restart markers, NDPI
private tags, and malformed streams (truncated, bad magic, lying
byte counts) which must fail cleanly, not crash or hang.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import cv2
import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.wsicore.tiffio import TiffFile, TiffPyramidWriter


def build_tiff(
    path: Path,
    image: np.ndarray,
    *,
    bigtiff: bool = False,
    tile: int = 64,
    extra_tags: dict | None = None,
    compression: int = 1,
) -> Path:
    """Hand-craft a minimal single-page tiled TIFF (classic or BigTIFF).

    Tiles are uncompressed (1) or deflate (8). ``extra_tags`` maps
    tag id -> (type, count, packed_bytes) for ASCII/rational extras.
    """
    h, w = image.shape[:2]
    tiles = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = np.zeros((tile, tile, 3), image.dtype)
            sub = image[ty : ty + tile, tx : tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            raw = block.tobytes()
            tiles.append(zlib.compress(raw) if compression == 8 else raw)

    if bigtiff:
        header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
        entry_fmt, count_fmt = "<HHQQ", "<Q"
        offset_type = 16  # LONG8
    else:
        header = struct.pack("<2sHI", b"II", 42, 8)
        entry_fmt, count_fmt = "<HHII", "<H"
        offset_type = 4  # LONG

    extra_tags = extra_tags or {}
    out = bytearray(header)
    # data area first: tile bytes, then arrays, then the IFD
    tile_offsets = []
    for t in tiles:
        tile_offsets.append(len(out))
        out += t

    inline_size = 8 if bigtiff else 4
    type_sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 11: 4, 16: 8}
    fmt_chars = {3: "H", 4: "I", 16: "Q"}

    entries = []  # (tag, ttype, cnt, payload_bytes)

    def entry_values(tag, ttype, values):
        payload = struct.pack(f"<{len(values)}{fmt_chars[ttype]}", *values)
        entries.append((tag, ttype, len(values), payload))

    n_tiles = len(tiles)
    entry_values(256, 3, [w])
    entry_values(257, 3, [h])
    entry_values(258, 3, [8, 8, 8])
    entry_values(259, 3, [compression])
    entry_values(262, 3, [2])  # RGB
    entry_values(277, 3, [3])
    entry_values(322, 3, [tile])
    entry_values(323, 3, [tile])
    entry_values(324, offset_type, tile_offsets)
    entry_values(325, offset_type, [len(t) for t in tiles])
    for tag, (ttype, cnt, payload) in extra_tags.items():
        entries.append((tag, ttype, cnt, payload))
    entries.sort()

    # out-of-line payloads first, remembering their offsets
    resolved = []
    for tag, ttype, cnt, payload in entries:
        if len(payload) <= inline_size:
            value = int.from_bytes(payload.ljust(inline_size, b"\0"), "little")
        else:
            value = len(out)
            out.extend(payload)
        resolved.append((tag, ttype, cnt, value))

    ifd_off = len(out)
    out += struct.pack(count_fmt, len(resolved))
    for tag, ttype, cnt, value in resolved:
        out += struct.pack(entry_fmt, tag, ttype, cnt, value)
    out += struct.pack("<Q" if bigtiff else "<I", 0)  # next IFD
    # patch the header's first-IFD offset
    if bigtiff:
        struct.pack_into("<Q", out, 8, ifd_off)
    else:
        struct.pack_into("<I", out, 4, ifd_off)
    path.write_bytes(bytes(out))
    return path


class TestBigTiff:
    def test_bigtiff_roundtrip(self, tmp_path) -> None:
        img = synthetic_he_patch((192, 128), seed=1)
        path = build_tiff(tmp_path / "big.tiff", img, bigtiff=True)
        tf = TiffFile(path)
        assert tf.bigtiff
        page = tf.pages[0]
        assert (page.width, page.height) == (192, 128)
        region = tf.read_region(0, (0, 0), (192, 128))
        assert np.array_equal(region, img)

    def test_bigtiff_deflate_tiles(self, tmp_path) -> None:
        img = synthetic_he_patch((128, 128), seed=2)
        path = build_tiff(tmp_path / "bigd.tiff", img, bigtiff=True, compression=8)
        region = TiffFile(path).read_region(0, (32, 32), (64, 64))
        assert np.array_equal(region, img[32:96, 32:96])

    def test_classic_and_bigtiff_agree(self, tmp_path) -> None:
        img = synthetic_he_patch((160, 96), seed=3)
        classic = build_tiff(tmp_path / "c.tiff", img)
        big = build_tiff(tmp_path / "b.tiff", img, bigtiff=True)
        a = TiffFile(classic).read_region(0, (10, 10), (80, 70))
        b = TiffFile(big).read_region(0, (10, 10), (80, 70))
        assert np.array_equal(a, b)


class TestJpegRestartMarkers:
    def test_restart_marker_tiles_decode(self, tmp_path) -> None:
        """JPEG streams with RST markers (NDPI-style) must decode."""

        class RstWriter(TiffPyramidWriter):
            def _encode_tile(self, tile):
                bgr = cv2.cvtColor(tile, cv2.COLOR_RGB2BGR)
                ok, buf = cv2.imencode(
                    ".jpg", bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 92,
                     cv2.IMWRITE_JPEG_RST_INTERVAL, 2],
                )
                assert ok
                return buf.tobytes()

        img = synthetic_he_patch((512, 384), seed=4)
        path = tmp_path / "rst.tiff"
        RstWriter(path, tile_size=256).write([img])
        # confirm the fixture really contains restart markers
        data = path.read_bytes()
        assert b"\xff\xd0" in data or b"\xff\xd1" in data
        region = TiffFile(path).read_region(0, (100, 100), (200, 200))
        ref = cv2.cvtColor(
            cv2.imdecode(
                np.frombuffer(
                    cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                                 [cv2.IMWRITE_JPEG_QUALITY, 92,
                                  cv2.IMWRITE_JPEG_RST_INTERVAL, 2])[1],
                    np.uint8,
                ),
                cv2.IMREAD_COLOR,
            ),
            cv2.COLOR_BGR2RGB,
        )
        # decoded content must be JPEG-close to the source
        assert np.abs(
            region.astype(int) - img[100:300, 100:300].astype(int)
        ).mean() < 12


class TestNdpiPrivateTags:
    def test_hamamatsu_vendor_and_sourcelens(self, tmp_path) -> None:
        img = synthetic_he_patch((128, 128), seed=5)
        make = b"Hamamatsu\0"
        # SourceLens (65421): FLOAT (11), one value 40.0
        source_lens = struct.pack("<f", 40.0)
        # XResolution/YResolution (282/283): RATIONAL (5) 20000/1 per cm
        xres = struct.pack("<II", 20000, 1)
        path = build_tiff(
            tmp_path / "n.ndpi", img,
            extra_tags={
                271: (2, len(make), make),
                282: (5, 1, xres),
                283: (5, 1, xres),
                296: (3, 1, struct.pack("<H", 3)),  # unit = cm
                65421: (11, 1, source_lens),
            },
        )
        tf = TiffFile(path)
        meta = tf.svs_metadata()
        assert meta["vendor"] == "hamamatsu"
        assert meta["objective_power"] == pytest.approx(40.0)
        assert meta["mpp"][0] == pytest.approx(10000.0 / 20000, rel=1e-3)

    def test_unknown_private_tags_ignored(self, tmp_path) -> None:
        img = synthetic_he_patch((64, 64), seed=6)
        path = build_tiff(
            tmp_path / "p.tiff", img,
            extra_tags={65420: (4, 1, struct.pack("<I", 12345))},
        )
        region = TiffFile(path).read_region(0, (0, 0), (64, 64))
        assert np.array_equal(region, img)


class TestMalformed:
    def test_bad_magic_rejected(self, tmp_path) -> None:
        path = tmp_path / "junk.tiff"
        path.write_bytes(b"NOTATIFF" * 64)
        with pytest.raises(Exception):  # noqa: B017 - any clean error
            TiffFile(path)

    def test_truncated_ifd_rejected(self, tmp_path) -> None:
        img = synthetic_he_patch((128, 128), seed=7)
        full = build_tiff(tmp_path / "full.tiff", img)
        data = full.read_bytes()
        trunc = tmp_path / "trunc.tiff"
        trunc.write_bytes(data[: len(data) - 40])  # cut into the IFD
        with pytest.raises(Exception):  # noqa: B017
            TiffFile(trunc).read_region(0, (0, 0), (128, 128))

    def test_lying_byte_counts(self, tmp_path) -> None:
        """Tile byte counts pointing past EOF must error, not hang."""
        img = synthetic_he_patch((64, 64), seed=8)
        path = build_tiff(tmp_path / "lie.tiff", img)
        data = bytearray(path.read_bytes())
        # tile data starts right after the 8-byte header; zero it out and
        # truncate so offsets/counts point past EOF
        path2 = tmp_path / "lie2.tiff"
        path2.write_bytes(bytes(data[:2000]))
        with pytest.raises(Exception):  # noqa: B017
            TiffFile(path2).read_region(0, (0, 0), (64, 64))

    def test_zero_byte_file(self, tmp_path) -> None:
        path = tmp_path / "empty.tiff"
        path.write_bytes(b"")
        with pytest.raises(Exception):  # noqa: B017
            TiffFile(path)


class TestMiraxOverlap:
    def test_overlap_changes_geometry(self, tmp_path) -> None:
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from mirax_synth import write_synthetic_mrxs

        from tiatoolbox_tpu.wsicore.mirax import MiraxFile

        plain = write_synthetic_mrxs(tmp_path / "a" / "s", grid_nx=3, grid_ny=2)
        mrx = MiraxFile(plain)
        level0 = mrx.levels[0]
        # overlap: step between tiles = tile - overlap
        assert level0.overlap_xy == (0.0, 0.0)

    def test_nonzero_overlap_geometry(self, tmp_path) -> None:
        """Tiles step by (tile - overlap): slide dims and reads shrink."""
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from mirax_synth import write_synthetic_mrxs

        from tiatoolbox_tpu.wsicore.mirax import MiraxFile

        tile, overlap, nx, ny = 64, 8, 3, 2
        mrxs = write_synthetic_mrxs(
            tmp_path / "o" / "s", grid_nx=nx, grid_ny=ny, tile=tile,
            n_levels=1, overlap=overlap,
        )
        mrx = MiraxFile(mrxs)
        assert mrx.levels[0].overlap_xy == (float(overlap), float(overlap))
        w, h = mrx.level_dimensions(0)
        step = tile - overlap
        assert (w, h) == ((nx - 1) * step + tile, (ny - 1) * step + tile)
        region = mrx.read_region(0, (0, 0), (w, h))
        assert region.shape[:2] == (h, w)
        # the second tile's left edge lands at x=step, overwriting the
        # first tile's overlap strip — content must come from tile 1
        from mirax_synth import tile_pixels

        t1 = tile_pixels(0, 1, 0, tile)
        seam = region[tile // 2, step + 2]
        # JPEG-lossy: compare loosely against tile 1's column 2 pixel
        assert np.abs(seam.astype(int) - t1[tile // 2, 2].astype(int)).max() < 30
