"""Adversarial MIRAX containers (r02 verdict item 9).

The reference reads MRXS via OpenSlide; no real slides ship in this
environment, so robustness is pinned with synthetic containers
exercising the failure modes OpenSlide tolerates: camera overlap,
nonzero fill colours, tiles spread over several data files, MISSING
data files, and corrupt tile payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from mirax_synth import tile_pixels, write_synthetic_mrxs

from tiatoolbox_tpu.wsicore.mirax import MiraxFile

TILE = 64


class TestOverlap:
    @pytest.fixture(scope="class")
    def overlapped(self, tmp_path_factory):
        return MiraxFile(write_synthetic_mrxs(
            tmp_path_factory.mktemp("mov") / "o", grid_nx=4, grid_ny=3,
            tile=TILE, n_levels=1, overlap=8,
        ))

    def test_level_dimensions_shrink_by_overlap(self, overlapped) -> None:
        # 4 tiles of 64 with 8 px overlap: 3*(64-8) + 64 = 232
        assert overlapped.level_dimensions(0) == (232, 176)

    def test_seam_takes_last_tile(self, overlapped) -> None:
        """Overlapping strips take the later (right/bottom) tile's
        pixels — the raster order the loop defines. Compared against
        the DECODED tiles (JPEG round-trip noise is part of the data)."""
        region = overlapped.read_region(0, (0, 0), (232, 176))
        t1 = overlapped.decode_tile(0, 1, 0)
        # tile 1 starts at x = 56; its first 8 columns overlap tile 0
        np.testing.assert_array_equal(region[:56, 56:64], t1[:56, :8])

    def test_window_across_seam(self, overlapped) -> None:
        region = overlapped.read_region(0, (50, 0), (20, 32))
        t0 = overlapped.decode_tile(0, 0, 0)
        t1 = overlapped.decode_tile(0, 1, 0)
        np.testing.assert_array_equal(region[:, :6], t0[:32, 50:56])
        np.testing.assert_array_equal(region[:, 6:], t1[:32, :14])


class TestFillColor:
    def test_nonzero_fill_for_missing_tiles(self, tmp_path) -> None:
        mx = MiraxFile(write_synthetic_mrxs(
            tmp_path / "f", grid_nx=3, grid_ny=2, tile=TILE, n_levels=1,
            missing_tiles=((0, 1, 0),), fill_bgr=0x112233,
        ))
        assert mx.fill_rgb(0) == (0x33, 0x22, 0x11)
        region = mx.read_region(0, (TILE, 0), (TILE, TILE))
        assert np.all(region == np.array([0x33, 0x22, 0x11], np.uint8))
        # neighbours still decode
        np.testing.assert_array_equal(
            mx.read_region(0, (0, 0), (TILE, TILE)),
            mx.decode_tile(0, 0, 0),
        )


class TestMultiDataFile:
    def test_tiles_spread_across_files(self, tmp_path) -> None:
        mx = MiraxFile(write_synthetic_mrxs(
            tmp_path / "m", grid_nx=4, grid_ny=3, tile=TILE, n_levels=2,
            n_data_files=3,
        ))
        assert len(mx.data_files) == 3
        filenos = {e[0] for lv in mx.levels for e in lv.tiles.values()}
        assert filenos == {0, 1, 2}
        for ty in range(3):
            for tx in range(4):
                got = mx.decode_tile(0, tx, ty)
                want = tile_pixels(0, tx, ty, TILE)
                assert np.abs(got.astype(int) - want.astype(int)).mean() < 4

    def test_missing_data_file_reads_as_fill(self, tmp_path) -> None:
        path = write_synthetic_mrxs(
            tmp_path / "mm", grid_nx=4, grid_ny=3, tile=TILE, n_levels=1,
            n_data_files=2,
        )
        (path.parent / path.stem / "Data0001.dat").unlink()
        mx = MiraxFile(path)
        region = mx.read_region(0, (0, 0), (4 * TILE, 3 * TILE))
        fill = np.array(mx.fill_rgb(0), np.uint8)
        hit_fill = hit_data = 0
        for ty in range(3):
            for tx in range(4):
                block = region[
                    ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE
                ]
                if np.all(block == fill):
                    hit_fill += 1
                else:
                    want = tile_pixels(0, tx, ty, TILE)
                    assert np.abs(block.astype(int) - want.astype(int)).mean() < 4
                    hit_data += 1
        assert hit_fill == 6 and hit_data == 6  # round-robin halves


class TestCorruptPayload:
    def test_corrupt_tile_reads_as_fill(self, tmp_path) -> None:
        mx = MiraxFile(write_synthetic_mrxs(
            tmp_path / "c", grid_nx=3, grid_ny=2, tile=TILE, n_levels=1,
            corrupt_tiles=((0, 1, 1),),
        ))
        assert mx.decode_tile(0, 1, 1) is None
        region = mx.read_region(0, (TILE, TILE), (TILE, TILE))
        assert np.all(region == np.array(mx.fill_rgb(0), np.uint8))
        good = mx.decode_tile(0, 0, 0)
        want = tile_pixels(0, 0, 0, TILE)
        assert np.abs(good.astype(int) - want.astype(int)).mean() < 4


class TestReaderIntegrationOverlap:
    def test_wsireader_dims_respect_overlap(self, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        path = write_synthetic_mrxs(
            tmp_path / "ri", grid_nx=4, grid_ny=3, tile=TILE, n_levels=2,
            overlap=8,
        )
        reader = WSIReader.open(path)
        assert tuple(reader.info.slide_dimensions) == (232, 176)
        region = reader.read_rect((0, 0), (64, 64), resolution=0, units="level")
        # the seam rows/cols (>=56) belong to the overlapping neighbours
        want = tile_pixels(0, 0, 0, TILE)[:56, :56]
        assert np.abs(region[:56, :56].astype(int) - want.astype(int)).mean() < 4
