"""Extended cross-reader contract suite.

Adds behaviours from the reference's parametrized reader matrix
(``/root/reference/tests/test_wsireader.py``) not yet covered by
``tests/test_wsireader.py``: unit conversions, reflect padding,
fully-outside reads, upsampled reads, determinism, level consistency,
save_tiles, and thumbnail geometry — each run over every reader kind.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.utils.zarrlite import ZarrGroup
from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta
from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader, WSIReader

SLIDE_W, SLIDE_H = 1024, 768


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("mext") / "slide.tiff"
    make_synthetic_slide(path, size=(SLIDE_W, SLIDE_H), mpp=0.5, objective_power=20)
    return path


@pytest.fixture(scope="module")
def ngff_path(tmp_path_factory):
    import cv2

    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    root = tmp_path_factory.mktemp("mext") / "slide.zarr"
    grp = ZarrGroup.create(root)
    levels = [img]
    for _ in range(2):
        prev = levels[-1]
        levels.append(cv2.resize(prev, (prev.shape[1] // 2, prev.shape[0] // 2)))
    datasets = []
    for i, lv in enumerate(levels):
        grp.from_array(str(i), lv)
        scale = 2.0**i
        datasets.append(
            {
                "path": str(i),
                "coordinateTransformations": [
                    {"type": "scale", "scale": [0.5 * scale, 0.5 * scale, 1.0]}
                ],
            }
        )
    grp.attrs = {
        "multiscales": [
            {
                "version": "0.4",
                "axes": [
                    {"name": "y", "type": "space", "unit": "micrometer"},
                    {"name": "x", "type": "space", "unit": "micrometer"},
                    {"name": "c", "type": "channel"},
                ],
                "datasets": datasets,
            }
        ]
    }
    return root


@pytest.fixture(scope="module")
def dicom_path(tmp_path_factory):
    from tiatoolbox_tpu.data.synth import make_synthetic_dicom

    path = tmp_path_factory.mktemp("mext") / "d.dcm"
    make_synthetic_dicom(path, size=(SLIDE_W, SLIDE_H), frame_size=128, mpp=0.5)
    return path


@pytest.fixture(scope="module")
def jp2_path(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("mext") / "j.jp2"
    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return path


@pytest.fixture(scope="module")
def mrxs_path(tmp_path_factory):
    from mirax_synth import write_synthetic_mrxs

    return write_synthetic_mrxs(
        tmp_path_factory.mktemp("mext") / "m",
        grid_nx=SLIDE_W // 64,
        grid_ny=SLIDE_H // 64,
        tile=64,
        n_levels=2,
        mpp=0.5,
    )


@pytest.fixture()
def reader(request, slide_path, ngff_path, dicom_path, jp2_path, mrxs_path):
    kind = request.param
    if kind == "tiff":
        return WSIReader.open(slide_path)
    if kind == "ngff":
        return WSIReader.open(ngff_path)
    if kind == "dicom":
        return WSIReader.open(dicom_path)
    if kind == "jp2":
        # codestream has no capture-resolution box; supply both overrides
        return WSIReader.open(jp2_path, mpp=(0.5, 0.5), power=20)
    if kind == "mirax":
        return WSIReader.open(mrxs_path)
    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    info = WSIMeta(
        slide_dimensions=(SLIDE_W, SLIDE_H),
        axes="YXS",
        level_dimensions=[(SLIDE_W, SLIDE_H)],
        level_downsamples=[1.0],
        mpp=(0.5, 0.5),
        objective_power=20,
        raw={},
    )
    return VirtualWSIReader(img, info=info)


ALL_READERS = pytest.mark.parametrize(
    "reader",
    ["tiff", "ngff", "virtual", "dicom", "jp2", "mirax"],
    indirect=True,
)

POWERED_READERS = pytest.mark.parametrize(
    "reader", ["tiff", "virtual", "jp2"], indirect=True
)


class TestUnitAlgebra:
    @POWERED_READERS
    def test_read_rect_power_units(self, reader) -> None:
        # native power 20; half power = 2x downsample.
        region = reader.read_rect((0, 0), (128, 128), resolution=10, units="power")
        assert region.shape == (128, 128, 3)

    @ALL_READERS
    def test_read_rect_mpp_units(self, reader) -> None:
        # native mpp 0.5; 1.0 mpp = 2x downsample.
        region = reader.read_rect((0, 0), (128, 128), resolution=1.0, units="mpp")
        assert region.shape == (128, 128, 3)

    @ALL_READERS
    def test_read_rect_native_mpp_equals_level0(self, reader) -> None:
        at_mpp = reader.read_rect(
            (64, 64), (96, 96), resolution=0.5, units="mpp"
        )
        at_level = reader.read_rect((64, 64), (96, 96), resolution=0, units="level")
        assert np.array_equal(at_mpp, at_level)

    @ALL_READERS
    def test_invalid_units_raise(self, reader) -> None:
        with pytest.raises(ValueError, match="[Ii]nvalid|[Uu]nsupported|units"):
            reader.read_rect((0, 0), (32, 32), resolution=1.0, units="parsec")

    @ALL_READERS
    def test_convert_resolution_units_roundtrip(self, reader) -> None:
        as_mpp = reader.convert_resolution_units(0.25, "baseline", "mpp")
        back = reader.convert_resolution_units(as_mpp, "mpp", "baseline")
        assert np.allclose(np.asarray(back, float), 0.25, rtol=1e-6)

    @ALL_READERS
    def test_slide_dimensions_mpp_units(self, reader) -> None:
        dims = reader.slide_dimensions(1.0, "mpp")  # 2x downsample of 0.5
        assert abs(dims[0] - SLIDE_W / 2) <= 1
        assert abs(dims[1] - SLIDE_H / 2) <= 1

    @ALL_READERS
    def test_relative_level_scales_baseline(self, reader) -> None:
        scales = reader.info.relative_level_scales(0.5, "baseline")
        # level 0 scale for a 2x-downsampled read is 0.5
        assert np.allclose(scales[0], [0.5, 0.5])


class TestPaddingAndBounds:
    @ALL_READERS
    def test_pad_mode_reflect(self, reader) -> None:
        region = reader.read_rect(
            (-32, 0), (64, 64), resolution=0, units="level", pad_mode="reflect"
        )
        assert region.shape == (64, 64, 3)
        # np.pad 'reflect': column 31 mirrors column 33 about edge col 32.
        assert np.array_equal(region[:, 31], region[:, 33])
        assert np.array_equal(region[:, 30], region[:, 34])

    @ALL_READERS
    def test_fully_outside_read_is_constant(self, reader) -> None:
        region = reader.read_rect(
            (SLIDE_W + 512, SLIDE_H + 512),
            (64, 64),
            resolution=0,
            units="level",
            pad_mode="constant",
            pad_constant_values=7,
        )
        assert (region == 7).all()

    @ALL_READERS
    def test_nonsquare_read(self, reader) -> None:
        region = reader.read_rect((16, 16), (200, 56), resolution=0, units="level")
        # size is (width, height) -> array is (height, width, 3)
        assert region.shape == (56, 200, 3)

    @ALL_READERS
    def test_read_bounds_nonsquare(self, reader) -> None:
        region = reader.read_bounds((0, 0, 320, 128), resolution=0, units="level")
        assert region.shape == (128, 320, 3)


class TestReadConsistency:
    @ALL_READERS
    def test_read_rect_contiguous_uint8(self, reader) -> None:
        region = reader.read_rect((32, 32), (64, 64))
        assert region.dtype == np.uint8
        assert region.flags["C_CONTIGUOUS"]

    @ALL_READERS
    def test_repeated_reads_deterministic(self, reader) -> None:
        a = reader.read_rect((128, 128), (96, 96), resolution=0, units="level")
        b = reader.read_rect((128, 128), (96, 96), resolution=0, units="level")
        assert np.array_equal(a, b)

    @ALL_READERS
    def test_upsampled_read_above_baseline(self, reader) -> None:
        # resolution 2.0 baseline = 2x upsampling of level-0 pixels.
        up = reader.read_rect((64, 64), (64, 64), resolution=2.0, units="baseline")
        assert up.shape == (64, 64, 3)
        base = reader.read_rect((64, 64), (32, 32), resolution=0, units="level")
        # coarse content agreement after downscaling back
        import cv2

        down = cv2.resize(up, (32, 32), interpolation=cv2.INTER_AREA)
        assert np.abs(down.astype(int) - base.astype(int)).mean() < 40

    @ALL_READERS
    def test_level1_dimensions_consistent(self, reader) -> None:
        info = reader.info
        if len(info.level_dimensions) < 2:
            assert info.level_downsamples == [1.0]
            return
        dims0 = info.level_dimensions[0]
        dims1 = info.level_dimensions[1]
        ds = info.level_downsamples[1]
        assert abs(dims1[0] - dims0[0] / ds) <= 1
        assert abs(dims1[1] - dims0[1] / ds) <= 1
        region = reader.read_rect((0, 0), (64, 64), resolution=1, units="level")
        assert region.shape == (64, 64, 3)

    # mirax excluded: the synthetic MRXS encodes the level index into
    # tile content (levels intentionally differ, testing level selection)
    @pytest.mark.parametrize(
        "reader", ["tiff", "ngff", "virtual", "dicom", "jp2"], indirect=True
    )
    def test_level1_read_matches_downsampled_level0(self, reader) -> None:
        info = reader.info
        if len(info.level_dimensions) < 2:
            return
        import cv2

        lvl1 = reader.read_rect((0, 0), (128, 128), resolution=1, units="level")
        ds = info.level_downsamples[1]
        size0 = int(round(128 * ds))
        lvl0 = reader.read_rect((0, 0), (size0, size0), resolution=0, units="level")
        down = cv2.resize(lvl0, (128, 128), interpolation=cv2.INTER_AREA)
        # lossy codecs + decimation filters differ; coarse agreement only
        assert np.abs(down.astype(int) - lvl1.astype(int)).mean() < 40


class TestThumbsAndTiles:
    @ALL_READERS
    def test_thumbnail_geometry(self, reader) -> None:
        # baseline-units resolution is a scale factor: 1/16 = 16x smaller
        thumb = reader.slide_thumbnail(resolution=1 / 16, units="baseline")
        assert abs(thumb.shape[1] - SLIDE_W / 16) <= 1
        assert abs(thumb.shape[0] - SLIDE_H / 16) <= 1

    @ALL_READERS
    def test_thumbnail_matches_read_bounds(self, reader) -> None:
        thumb = reader.slide_thumbnail(resolution=1 / 8, units="baseline")
        full = reader.read_bounds(
            (0, 0, SLIDE_W, SLIDE_H), resolution=1 / 8, units="baseline"
        )
        assert thumb.shape == full.shape
        assert np.abs(thumb.astype(int) - full.astype(int)).mean() < 10

    @POWERED_READERS
    def test_save_tiles(self, reader, tmp_path) -> None:
        reader.save_tiles(
            tmp_path, tile_objective_value=5, tile_read_size=(512, 512)
        )
        produced = list(tmp_path.rglob("*.jpg"))
        assert produced
        import cv2

        tile = cv2.imread(str(produced[0]))
        assert tile is not None
        assert tile.shape[2] == 3

    @ALL_READERS
    def test_tissue_mask_morphological_matrix(self, reader) -> None:
        mask = reader.tissue_mask(
            method="morphological", resolution=8.0, units="baseline"
        )
        assert mask.img.ndim == 2
        assert mask.img.sum() > 0
