"""MIRAX (.mrxs) reader tests on synthetic containers."""

from __future__ import annotations

import numpy as np
import pytest

from mirax_synth import tile_pixels, write_synthetic_mrxs

from tiatoolbox_tpu.wsicore.mirax import MiraxFile
from tiatoolbox_tpu.wsicore.wsireader import MIRAXWSIReader, WSIReader


@pytest.fixture(scope="module")
def mrxs_path(tmp_path_factory):
    return write_synthetic_mrxs(
        tmp_path_factory.mktemp("mrxs") / "slide",
        grid_nx=4,
        grid_ny=3,
        tile=64,
        n_levels=2,
        mpp=0.5,
        missing_tiles=((0, 3, 2),),  # bottom-right tile absent at level 0
    )


def test_container_parse(mrxs_path) -> None:
    mx = MiraxFile(mrxs_path)
    assert mx.grid_nx == 4 and mx.grid_ny == 3
    assert len(mx.levels) == 2
    assert mx.levels[0].tile_wh == (64, 64)
    assert mx.level_dimensions(0) == (256, 192)
    assert mx.level_dimensions(1) == (128, 128)  # ceil(4/2)=2, ceil(3/2)=2 tiles
    assert len(mx.levels[0].tiles) == 11  # 12 minus the missing one
    assert len(mx.levels[1].tiles) == 4


def test_tile_pixel_roundtrip(mrxs_path) -> None:
    mx = MiraxFile(mrxs_path)
    tile = mx.decode_tile(0, 1, 2)
    expected = tile_pixels(0, 1, 2, 64)
    # JPEG quality 95: close but lossy
    assert tile.shape == (64, 64, 3)
    assert np.abs(tile.astype(int) - expected.astype(int)).mean() < 3


def test_read_region_and_fill(mrxs_path) -> None:
    mx = MiraxFile(mrxs_path)
    region = mx.read_region(0, (60, 60), (72, 72))  # spans 4 tiles
    assert region.shape == (72, 72, 3)
    # missing tile area reads as fill color (white)
    missing = mx.read_region(0, (3 * 64 + 10, 2 * 64 + 10), (16, 16))
    assert (missing == 255).all()


def test_wsireader_open_dispatch(mrxs_path) -> None:
    wsi = WSIReader.open(mrxs_path)
    assert isinstance(wsi, MIRAXWSIReader)
    info = wsi.info
    assert info.slide_dimensions == (256, 192)
    assert info.level_count == 2
    assert np.allclose(info.mpp, (0.5, 0.5))
    assert info.vendor == "3DHISTECH"
    region = wsi.read_rect((0, 0), (64, 64), resolution=0, units="level")
    expected = tile_pixels(0, 0, 0, 64)
    assert np.abs(region.astype(int) - expected.astype(int)).mean() < 3
    # level 1 read via resolution algebra (baseline 256x192 / downsample 2)
    thumb = wsi.slide_thumbnail(resolution=1, units="level")
    assert thumb.shape == (96, 128, 3)


def test_associated_image(mrxs_path) -> None:
    import cv2

    mx = MiraxFile(mrxs_path)
    payload = mx.read_associated(0)
    img = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (32, 32, 3)


def test_missing_data_dir(tmp_path) -> None:
    bogus = tmp_path / "x.mrxs"
    bogus.write_bytes(b"stub")
    with pytest.raises(FileNotFoundError, match="data directory"):
        MiraxFile(bogus)
