"""Tile pyramid generator suite.

Scenario set modeled on the reference's ``tests/test_tile_pyramid_gen.py``
behaviours for deep-zoom/Zoomify layouts, dumps, and annotation tiles.
"""

from __future__ import annotations

import tarfile
import zipfile

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, DictionaryStore
from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.pyramid import (
    AnnotationTileGenerator,
    TilePyramidGenerator,
    ZoomifyGenerator,
)
from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta
from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader

W, H = 1024, 768


@pytest.fixture(scope="module")
def wsi():
    img = synthetic_he_patch((W, H), seed=3)
    info = WSIMeta(
        slide_dimensions=(W, H),
        axes="YXS",
        level_dimensions=[(W, H)],
        level_downsamples=[1.0],
        mpp=(0.5, 0.5),
        objective_power=20,
        raw={},
    )
    return VirtualWSIReader(img, info=info)


@pytest.fixture(scope="module")
def gen(wsi):
    return TilePyramidGenerator(wsi, tile_size=256)


class TestGeometry:
    def test_level_count(self, gen) -> None:
        # 1024/256 = 4 tiles across -> log2(4)+1 = 3 levels
        assert gen.level_count == 3

    def test_level_dimensions_baseline(self, gen) -> None:
        assert gen.level_dimensions(gen.level_count - 1) == (W, H)

    def test_level_dimensions_shrink(self, gen) -> None:
        assert gen.level_dimensions(gen.level_count - 2) == (W // 2, H // 2)

    def test_tile_grid_size(self, gen) -> None:
        assert gen.tile_grid_size(gen.level_count - 1) == (4, 3)
        assert gen.tile_grid_size(0) == (1, 1)

    def test_tile_grid_size_bad_level(self, gen) -> None:
        with pytest.raises(IndexError):
            gen.tile_grid_size(99)
        with pytest.raises(IndexError):
            gen.tile_grid_size(-1)

    def test_level_downsample(self, gen) -> None:
        assert gen.level_downsample(gen.level_count - 1) == 1.0
        assert gen.level_downsample(0) == 4.0

    def test_output_tile_size_with_overlap(self, wsi) -> None:
        g = TilePyramidGenerator(wsi, tile_size=256, overlap=8)
        assert g.output_tile_size == 272


class TestGetTile:
    def test_baseline_tile_content(self, gen, wsi) -> None:
        tile = gen.get_tile(gen.level_count - 1, 0, 0)
        assert tile.shape == (256, 256, 3)
        direct = wsi.read_bounds((0, 0, 256, 256), resolution=0, units="level")
        assert np.array_equal(tile, direct)

    def test_downsampled_tile_shape(self, gen) -> None:
        tile = gen.get_tile(0, 0, 0)
        assert tile.shape == (256, 256, 3)

    def test_edge_tile_padded(self, gen) -> None:
        # bottom-right baseline tile exceeds the slide; must be padded
        tile = gen.get_tile(gen.level_count - 1, 3, 2)
        assert tile.shape == (256, 256, 3)

    def test_invalid_level_raises(self, gen) -> None:
        with pytest.raises(IndexError):
            gen.get_tile(99, 0, 0)

    def test_negative_coord_raises(self, gen) -> None:
        with pytest.raises(IndexError):
            gen.get_tile(0, -1, 0)

    def test_out_of_range_coord_raises(self, gen) -> None:
        with pytest.raises(IndexError):
            gen.get_tile(gen.level_count - 1, 9, 0)

    def test_res_doubles_output(self, gen) -> None:
        tile = gen.get_tile(gen.level_count - 1, 0, 0, res=2)
        assert tile.shape == (512, 512, 3)

    def test_overlap_tile(self, wsi) -> None:
        g = TilePyramidGenerator(wsi, tile_size=256, overlap=8)
        tile = g.get_tile(g.level_count - 1, 1, 1)
        assert tile.shape == (272, 272, 3)
        # interior of the overlap tile matches the non-overlap tile
        direct = wsi.read_bounds(
            (256 - 8, 256 - 8, 256 + 264, 256 + 264), resolution=0, units="level"
        )
        assert np.array_equal(tile, direct)

    def test_thumb_tile(self, gen) -> None:
        thumb = gen.get_thumb_tile()
        assert max(thumb.shape[:2]) == 256


class TestDump:
    def test_dump_directory(self, gen, tmp_path) -> None:
        out = tmp_path / "dz"
        gen.dump(out)
        # every level/tile present
        for level in range(gen.level_count):
            gw, gh = gen.tile_grid_size(level)
            for y in range(gh):
                for x in range(gw):
                    assert (out / str(level) / f"{x}_{y}.jpg").exists()

    def test_dump_zip(self, gen, tmp_path) -> None:
        out = tmp_path / "p.zip"
        gen.dump(out, container="zip")
        with zipfile.ZipFile(out) as zf:
            names = zf.namelist()
        n_expected = sum(
            int(np.prod(gen.tile_grid_size(lv))) for lv in range(gen.level_count)
        )
        assert len(names) == n_expected

    def test_dump_tar(self, gen, tmp_path) -> None:
        out = tmp_path / "p.tar"
        gen.dump(out, container="tar")
        with tarfile.open(out) as tf:
            members = tf.getnames()
        assert any(m.endswith("0-0.jpg") or m.endswith("0_0.jpg") for m in members)

    def test_dump_bad_container(self, gen, tmp_path) -> None:
        with pytest.raises(ValueError, match="container"):
            gen.dump(tmp_path / "x", container="7z")


class TestZoomify:
    @pytest.fixture(scope="class")
    def zgen(self, wsi):
        return ZoomifyGenerator(wsi, tile_size=256)

    def test_tile_group_first(self, zgen) -> None:
        assert zgen.tile_group(0, 0, 0) == 0

    def test_tile_group_monotonic(self, zgen) -> None:
        last = zgen.level_count - 1
        gw, gh = zgen.tile_grid_size(last)
        groups = [
            zgen.tile_group(last, x, y) for y in range(gh) for x in range(gw)
        ]
        assert groups == sorted(groups)

    def test_tile_group_out_of_range(self, zgen) -> None:
        with pytest.raises(IndexError):
            zgen.tile_group(0, 5, 5)

    def test_tile_path_layout(self, zgen) -> None:
        p = zgen.tile_path(1, 1, 0)
        assert p.parts[0].startswith("TileGroup")
        assert p.parts[1] == "1-1-0.jpg"

    def test_get_tile_still_works(self, zgen) -> None:
        assert zgen.get_tile(0, 0, 0).shape == (256, 256, 3)


class TestAnnotationTiles:
    @pytest.fixture(scope="class")
    def atg(self, wsi):
        store = DictionaryStore()
        store.append(
            Annotation(Polygon([(10, 10), (200, 10), (200, 200), (10, 200)]),
                       {"type": "tumour"}),
            key="sq",
        )
        store.append(Annotation(Point(500, 400).buffer(40), {"type": "cell"}),
                     key="pt")
        return AnnotationTileGenerator(wsi.info, store)

    def test_level_count_from_info(self, atg) -> None:
        assert atg.level_count == 3

    def test_tile_rgba(self, atg) -> None:
        tile = atg.get_tile(atg.level_count - 1, 0, 0)
        assert tile.shape[0] == 256
        assert tile.shape[2] in (3, 4)

    def test_annotated_tile_nonempty(self, atg) -> None:
        tile = atg.get_tile(atg.level_count - 1, 0, 0)
        assert tile[..., -1].sum() > 0  # square annotation drawn

    def test_unannotated_tile_empty(self, atg) -> None:
        tile = atg.get_tile(atg.level_count - 1, 3, 0)
        assert tile[..., -1].sum() == 0

    def test_invalid_level_raises(self, atg) -> None:
        with pytest.raises(IndexError):
            atg.get_tile(42, 0, 0)

    def test_zoomed_out_tile_covers_all(self, atg) -> None:
        tile = atg.get_tile(0, 0, 0)
        assert tile[..., -1].sum() > 0
