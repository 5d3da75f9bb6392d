"""Tiled-JP2 windowed reads (tile-extraction transcoding, no glymur).

Capability parity target: the reference's glymur-backed JP2 reader
decodes arbitrary windows without materialising the full image
(``/root/reference/tiatoolbox/wsicore/wsireader.py:2516-3120``).
"""

from __future__ import annotations

import numpy as np
import cv2
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.wsicore.jp2 import (
    J2KCodestream,
    encode_tiled_j2k,
    write_tiled_jp2,
)
from tiatoolbox_tpu.wsicore.wsireader import JP2WSIReader, WSIReader


@pytest.fixture(scope="module")
def tiled_jp2(tmp_path_factory):
    img = synthetic_he_patch((1024, 768), seed=7)
    path = tmp_path_factory.mktemp("jp2") / "tiled.jp2"
    write_tiled_jp2(path, img, tile_size=256)
    data = path.read_bytes()
    whole = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB,
    )
    return {"path": path, "img": img, "whole": whole}


class TestCodestream:
    def test_parse_grid(self, tiled_jp2) -> None:
        cs = J2KCodestream.from_bytes(tiled_jp2["path"].read_bytes())
        assert cs.image_size == (1024, 768)
        assert cs.grid_shape == (4, 3)
        assert sorted(cs.tiles) == list(range(12))

    def test_tile_bounds_clip_to_image(self) -> None:
        img = synthetic_he_patch((600, 300), seed=1)
        cs = J2KCodestream.from_bytes(encode_tiled_j2k(img, tile_size=256))
        assert cs.tile_bounds(2) == (512, 0, 600, 256)  # edge tile clipped

    def test_window_bit_exact_vs_whole_decode(self, tiled_jp2) -> None:
        cs = J2KCodestream.from_bytes(tiled_jp2["path"].read_bytes())
        for loc, size in [
            ((0, 0), (256, 256)),        # single tile
            ((100, 60), (400, 300)),     # interior straddling 4 tiles
            ((900, 640), (124, 128)),    # bottom-right edge
            ((250, 250), (20, 20)),      # tiny window across a seam
        ]:
            win = cs.read_region(loc, size)
            ref = tiled_jp2["whole"][
                loc[1] : loc[1] + size[1], loc[0] : loc[0] + size[0]
            ]
            assert np.array_equal(win, ref), (loc, size)

    def test_reduced_window(self, tiled_jp2) -> None:
        cs = J2KCodestream.from_bytes(tiled_jp2["path"].read_bytes())
        win = cs.read_region((0, 0), (512, 512), reduce=4)
        assert win.shape == (128, 128, 3)

    def test_windowed_read_decodes_only_needed_tiles(self, tiled_jp2, monkeypatch) -> None:
        cs = J2KCodestream.from_bytes(tiled_jp2["path"].read_bytes())
        decoded = []
        orig = J2KCodestream._decode_tile_uncached

        def spy(self, index, reduce):
            decoded.append(index)
            return orig(self, index, reduce)

        monkeypatch.setattr(J2KCodestream, "_decode_tile_uncached", spy)
        cs.read_region((10, 10), (100, 100))
        assert decoded == [0]  # one tile, not twelve

    def test_misaligned_origin_raises(self) -> None:
        img = synthetic_he_patch((256, 256), seed=2)
        cs = J2KCodestream.from_bytes(encode_tiled_j2k(img, tile_size=128))
        # fake a misaligned grid: pretend tiles are 40px (not 2^levels-aligned)
        cs.xtsiz = cs.ytsiz = 40
        with pytest.raises((ValueError, KeyError)):
            cs.extract_tile_codestream(1)

    def test_single_tile_encode_roundtrip(self) -> None:
        """Stitcher output must decode identically to the source pixels
        (within cv2's default lossy tolerance)."""
        img = synthetic_he_patch((320, 256), seed=3)
        data = encode_tiled_j2k(img, tile_size=256)
        whole = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        assert np.abs(whole.astype(int) - img.astype(int)).max() <= 16

    def test_tile_size_must_align(self) -> None:
        with pytest.raises(ValueError, match="64"):
            encode_tiled_j2k(np.zeros((128, 128, 3), np.uint8), tile_size=100)


class TestReaderIntegration:
    def test_open_dispatches_to_jp2(self, tiled_jp2) -> None:
        reader = WSIReader.open(tiled_jp2["path"])
        assert isinstance(reader, JP2WSIReader)
        assert reader.info.slide_dimensions == (1024, 768)

    def test_read_rect_uses_windowed_path(self, tiled_jp2, monkeypatch) -> None:
        reader = WSIReader.open(tiled_jp2["path"])
        assert reader._codestream is not None
        calls = []
        monkeypatch.setattr(
            JP2WSIReader,
            "_decode_plane",
            lambda self, scale: calls.append(scale) or pytest.fail(
                "full-image decode hit on a tiled jp2"
            ),
        )
        region = reader.read_rect((300, 200), (224, 224), resolution=0, units="level")
        assert region.shape == (224, 224, 3)
        ref = tiled_jp2["whole"][200:424, 300:524]
        assert np.array_equal(region, ref)

    def test_thumbnail_from_tiles(self, tiled_jp2) -> None:
        reader = WSIReader.open(tiled_jp2["path"])
        thumb = reader.slide_thumbnail(resolution=1, units="level")
        assert thumb.ndim == 3 and thumb.shape[2] == 3

    def test_read_bounds_matches_whole(self, tiled_jp2) -> None:
        reader = WSIReader.open(tiled_jp2["path"])
        region = reader.read_bounds((256, 256, 512, 512), resolution=0, units="level")
        assert np.array_equal(region, tiled_jp2["whole"][256:512, 256:512])

    def test_untiled_jp2_still_reads(self, tmp_path) -> None:
        """Single-tile files keep the reduced-plane fallback path."""
        img = synthetic_he_patch((300, 200), seed=4)
        path = tmp_path / "plain.jp2"
        cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        reader = WSIReader.open(path)
        assert reader._codestream is None  # single tile → fallback
        region = reader.read_rect((50, 50), (64, 64), resolution=0, units="level")
        assert region.shape == (64, 64, 3)
