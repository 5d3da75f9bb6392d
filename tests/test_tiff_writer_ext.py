"""Extended TiffPyramidWriter coverage: tile sizes, compression modes,
metadata tags, pyramid structure, reader roundtrips."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.wsicore.tiffio import TiffFile, TiffPyramidWriter
from tiatoolbox_tpu.wsicore.wsireader import WSIReader


def make_levels(w=640, h=480, n=3, seed=4):
    import cv2

    levels = [synthetic_he_patch((w, h), seed=seed)]
    for _ in range(n - 1):
        prev = levels[-1]
        levels.append(
            cv2.resize(prev, (prev.shape[1] // 2, prev.shape[0] // 2))
        )
    return levels


class TestWriterOptions:
    @pytest.mark.parametrize("tile_size", [128, 256])
    def test_tile_size(self, tmp_path, tile_size) -> None:
        path = tmp_path / f"t{tile_size}.tiff"
        TiffPyramidWriter(path, tile_size=tile_size, compression="deflate").write(
            make_levels()
        )
        tf = TiffFile(path)
        assert tf.pages[0].tile_width == tile_size
        assert tf.pages[0].tile_length == tile_size

    def test_deflate_lossless(self, tmp_path) -> None:
        levels = make_levels()
        path = tmp_path / "d.tiff"
        TiffPyramidWriter(path, compression="deflate").write(levels)
        tf = TiffFile(path)
        out = tf.read_region(0, (0, 0), (640, 480))
        assert np.array_equal(out, levels[0])

    def test_jpeg_quality_affects_size(self, tmp_path) -> None:
        levels = make_levels()
        lo = tmp_path / "lo.tiff"
        hi = tmp_path / "hi.tiff"
        TiffPyramidWriter(lo, jpeg_quality=30).write(levels)
        TiffPyramidWriter(hi, jpeg_quality=95).write(levels)
        assert hi.stat().st_size > lo.stat().st_size

    def test_description_and_mpp_tags(self, tmp_path) -> None:
        path = tmp_path / "m.tiff"
        TiffPyramidWriter(
            path, description="Aperio Fake |MPP = 0.2500|AppMag = 40",
            mpp=(0.25, 0.25),
        ).write(make_levels())
        tf = TiffFile(path)
        meta = tf.svs_metadata()
        assert meta["mpp"] == (0.25, 0.25)
        assert meta["objective_power"] == 40.0

    def test_pyramid_page_structure(self, tmp_path) -> None:
        path = tmp_path / "p.tiff"
        TiffPyramidWriter(path, compression="deflate").write(make_levels(n=3))
        tf = TiffFile(path)
        assert len(tf.pages) == 3
        widths = [p.width for p in tf.pages]
        assert widths == [640, 320, 160]
        assert tf.pyramid_pages() == [0, 1, 2]

    def test_single_level_write(self, tmp_path) -> None:
        path = tmp_path / "s.tiff"
        TiffPyramidWriter(path, compression="deflate").write(
            [synthetic_he_patch((300, 200), seed=1)]
        )
        tf = TiffFile(path)
        assert len(tf.pages) == 1
        assert (tf.pages[0].width, tf.pages[0].height) == (300, 200)

    def test_non_tile_multiple_dims(self, tmp_path) -> None:
        # 300x200 with 256 tiles: single partial tile per edge
        path = tmp_path / "odd.tiff"
        img = synthetic_he_patch((300, 200), seed=2)
        TiffPyramidWriter(path, compression="deflate").write([img])
        tf = TiffFile(path)
        out = tf.read_region(0, (0, 0), (300, 200))
        assert np.array_equal(out, img)


class TestReaderRoundtrip:
    def test_wsireader_opens_written_pyramid(self, tmp_path) -> None:
        path = tmp_path / "r.tiff"
        TiffPyramidWriter(
            path, mpp=(0.5, 0.5), compression="deflate"
        ).write(make_levels())
        reader = WSIReader.open(path)
        assert reader.info.slide_dimensions == (640, 480)
        assert len(reader.info.level_dimensions) == 3
        assert np.allclose(reader.info.mpp, [0.5, 0.5])
        region = reader.read_rect((64, 64), (128, 128))
        assert region.shape == (128, 128, 3)

    def test_jpeg_written_read_close(self, tmp_path) -> None:
        path = tmp_path / "j.tiff"
        levels = make_levels()
        TiffPyramidWriter(path, jpeg_quality=95).write(levels)
        reader = WSIReader.open(path)
        region = reader.read_rect((0, 0), (256, 256), resolution=0, units="level")
        assert (
            np.abs(region.astype(int) - levels[0][:256, :256].astype(int)).mean()
            < 4.0
        )
