"""Tests for registration, graph construction, and extended readers."""

from __future__ import annotations

import cv2
import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch


@pytest.fixture(scope="module")
def fixed_moving():
    fixed = synthetic_he_patch((256, 256), seed=7)
    rotation = cv2.getRotationMatrix2D((128, 128), 40, 1.0)
    moving = cv2.warpAffine(fixed, rotation, (256, 256), borderValue=(255, 255, 255))
    grey_f = cv2.cvtColor(fixed, cv2.COLOR_RGB2GRAY)
    grey_m = cv2.cvtColor(moving, cv2.COLOR_RGB2GRAY)
    return fixed, moving, (grey_f < 220).astype(np.uint8), (grey_m < 220).astype(np.uint8)


class TestRegistration:
    def test_prealignment_recovers_rotation(self, fixed_moving) -> None:
        from tiatoolbox_tpu.tools.registration import prealignment

        fixed, moving, fmask, mmask = fixed_moving
        transform, _, _, dice_val = prealignment(fixed, moving, fmask, mmask)
        assert dice_val > 0.7
        assert not np.allclose(transform, np.eye(3))

    def test_prealignment_validation(self, fixed_moving) -> None:
        from tiatoolbox_tpu.tools.registration import prealignment

        fixed, moving, fmask, mmask = fixed_moving
        with pytest.raises(ValueError, match="rotation step"):
            prealignment(fixed, moving, fmask, mmask, rotation_step=5)
        with pytest.raises(ValueError, match="dice_overlap"):
            prealignment(fixed, moving, fmask, mmask, dice_overlap=2)

    def test_bspline_improves_alignment(self) -> None:
        from tiatoolbox_tpu.tools.registration import (
            apply_bspline_transform,
            estimate_bspline_transform,
        )

        fixed = cv2.resize(synthetic_he_patch((128, 128), seed=3), (96, 96))
        shift = np.float32([[1, 0, 4], [0, 1, 3]])
        moving = cv2.warpAffine(fixed, shift, (96, 96), borderValue=(255, 255, 255))
        field = estimate_bspline_transform(
            fixed, moving, n_iterations=80, grid_space=24
        )
        assert field.shape == (96, 96, 2)
        grey_fixed = cv2.cvtColor(fixed, cv2.COLOR_RGB2GRAY).astype(float)
        grey_moving = cv2.cvtColor(moving, cv2.COLOR_RGB2GRAY).astype(float)
        warped = apply_bspline_transform(fixed, grey_moving, field).astype(float)
        assert np.abs(warped - grey_fixed).mean() < np.abs(grey_moving - grey_fixed).mean()

    def test_match_histograms(self, fixed_moving) -> None:
        from tiatoolbox_tpu.tools.registration import match_histograms

        fixed, moving, *_ = fixed_moving
        a, b = match_histograms(
            cv2.cvtColor(fixed, cv2.COLOR_RGB2GRAY),
            cv2.cvtColor(moving, cv2.COLOR_RGB2GRAY),
        )
        assert a.shape == b.shape

    def test_affine_transformer(self, fixed_moving) -> None:
        from tiatoolbox_tpu.tools.registration import AffineWSITransformer
        from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader

        fixed, moving, *_ = fixed_moving
        rotation = cv2.getRotationMatrix2D((128, 128), 40, 1.0)
        transform = np.linalg.inv(np.vstack([rotation, [0, 0, 1]]))
        tfm = AffineWSITransformer(VirtualWSIReader(moving), transform)
        region = tfm.read_rect((64, 64), (64, 64))
        mae = np.abs(
            region.astype(float) - fixed[64:128, 64:128].astype(float)
        ).mean()
        assert mae < 10


class TestGraph:
    def test_build_graph(self) -> None:
        from tiatoolbox_tpu.tools.graph import SlideGraphConstructor

        rng = np.random.default_rng(0)
        points = rng.random((60, 2)) * 1000
        # index-scaled features (reference docstring example) so that
        # clustering yields multiple clusters
        features = np.array([rng.random(16) * n for n in range(60)])
        graph = SlideGraphConstructor.build(points, features, lambda_h=0.3)
        assert set(graph.keys()) == {"x", "edge_index", "coordinates"}
        assert graph["edge_index"].shape[0] == 2
        assert len(graph["x"]) == len(graph["coordinates"])

    def test_delaunay_adjacency(self) -> None:
        from tiatoolbox_tpu.tools.graph import delaunay_adjacency

        rng = np.random.default_rng(1)
        points = rng.random((30, 2)) * 100
        adj = delaunay_adjacency(points, dthresh=50)
        assert adj.shape == (30, 30)
        assert np.array_equal(adj, adj.T)
        with pytest.raises(ValueError, match=">= 4"):
            delaunay_adjacency(points[:3], 50)

    def test_affinity_to_edge_index(self) -> None:
        from tiatoolbox_tpu.tools.graph import affinity_to_edge_index

        affinity = np.array([[0, 1], [1, 0]])
        edges = affinity_to_edge_index(affinity)
        assert edges.shape == (2, 2)
        with pytest.raises(ValueError, match="square"):
            affinity_to_edge_index(np.zeros((2, 3)))


class TestExtendedReaders:
    def test_annotation_store_reader(self, tmp_path) -> None:
        from tiatoolbox_tpu.annotation.geometry import Polygon
        from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
        from tiatoolbox_tpu.wsicore.store_reader import AnnotationStoreReader
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        store_path = tmp_path / "a.db"
        store = SQLiteStore(store_path)
        store.append(
            Annotation(Polygon.from_bounds(50, 50, 200, 200), {"type": "x"})
        )
        store.commit()
        store.close()
        reader = WSIReader.open(store_path)
        assert isinstance(reader, AnnotationStoreReader)
        region = reader.read_rect((0, 0), (64, 64))
        assert region.shape == (64, 64, 3)

    def test_transformed_reader_affine(self) -> None:
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader

        img = synthetic_he_patch((128, 128), seed=2)
        reader = TransformedWSIReader(img, np.eye(3))
        region = reader.read_rect((10, 10), (32, 32))
        assert np.array_equal(region, img[10:42, 10:42])

    def test_transformed_reader_field(self) -> None:
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader

        img = synthetic_he_patch((128, 128), seed=2)
        field = np.zeros((128, 128, 2), np.float32)
        field[..., 0] = 5.0
        reader = TransformedWSIReader(img, field)
        region = reader.read_rect((40, 40), (32, 32))
        assert np.abs(
            region.astype(float) - img[40:72, 45:77].astype(float)
        ).mean() < 2

    def test_transformed_reader_field_mismatched_fixed_frame(self) -> None:
        """Fixed frame larger than the moving slide: the field scales to
        the max(moving, fixed) frame and the moving slide is centered via
        (fixed - moving)//2 pads (reference ``wsireader.py:6934-6948``).
        """
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader
        from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta

        img = synthetic_he_patch((128, 128), seed=2)
        fixed_info = WSIMeta(
            slide_dimensions=(168, 148),  # pads = (20, 10)
            level_dimensions=[(168, 148)],
            level_downsamples=[1.0],
            axes="YXS",
        )
        field = np.zeros((148, 168, 2), np.float32)  # identity warp
        reader = TransformedWSIReader(img, field, fixed_info=fixed_info)
        assert reader.info.slide_dimensions == (168, 148)
        # fixed-frame coords (20+x, 10+y) hit moving-frame pixel (x, y)
        region = reader.read_rect((20 + 30, 10 + 40), (32, 32))
        assert np.abs(
            region.astype(float) - img[40:72, 30:62].astype(float)
        ).mean() < 2


class TestOmeTiff:
    def test_heatmap_roundtrip(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import write_probability_heatmap_as_ome_tiff
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        heat = np.random.default_rng(0).random((300, 400))
        path = write_probability_heatmap_as_ome_tiff(
            tmp_path / "h.ome.tiff", heat, mpp=(2.0, 2.0)
        )
        wsi = WSIReader.open(path)
        assert wsi.info.slide_dimensions == (400, 300)
        assert "OME" in wsi.info.raw["description"]


def test_multichannel_to_rgb() -> None:
    import pytest

    from tiatoolbox_tpu.utils.postproc_defs import MultichannelToRGB

    img = np.random.default_rng(0).integers(0, 255, (32, 32, 5)).astype(np.uint8)
    converter = MultichannelToRGB()
    out = converter(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
    converter.set_active_channels([0, 1])
    out2 = converter(img)
    assert out2.shape == (32, 32, 3)
    # <5 channels pass through unchanged (assumed RGB(A))
    rgb = np.zeros((4, 4, 3), np.uint8)
    assert MultichannelToRGB()(rgb) is rgb
    # color_dict drives colors; n == colors - 1 drops background channel
    conv = MultichannelToRGB(
        color_dict={f"c{i}": (1.0, 0.0, 0.0) for i in range(6)}
    )
    with pytest.warns(UserWarning, match="background"):
        out3 = conv(img)
    assert out3.shape == (32, 32, 3)
    assert len(conv.colors) == 5
    # uint16 images are scaled to uint8 range first
    img16 = (img.astype(np.uint16) * 256).astype(np.uint16)
    conv2 = MultichannelToRGB({f"c{i}": (0.0, 1.0, 0.0) for i in range(5)})
    out16 = conv2(img16)
    assert out16.dtype == np.uint8
    # mismatched color count raises
    conv3 = MultichannelToRGB({"a": (1, 0, 0), "b": (0, 1, 0)})
    with pytest.raises(ValueError, match="does not match"):
        conv3(img)


def test_tiff_color_table_parsers() -> None:
    from xml.etree import ElementTree

    from tiatoolbox_tpu.wsicore.wsireader import TIFFWSIReader

    qptiff_xml = """<PerkinElmer>
      <ScanColorTable>
        <ScanColorTable-k>DAPI_filt</ScanColorTable-k>
        <ScanColorTable-v>0, 0, 255</ScanColorTable-v>
        <ScanColorTable-k>FITC_filt</ScanColorTable-k>
        <ScanColorTable-v>Lime</ScanColorTable-v>
      </ScanColorTable>
    </PerkinElmer>"""
    colors = TIFFWSIReader._parse_scancolortable(
        ElementTree.fromstring(qptiff_xml)
    )
    assert colors["DAPI"] == (0.0, 0.0, 1.0)
    assert colors["FITC"] == (0.0, 1.0, 0.0)

    ome_xml = """<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">
      <Image><Pixels>
        <Channel ID="Channel:0" Name="DAPI" Color="65535"/>
        <Channel ID="Channel:1" Name="CD8" Color="-16776961"/>
      </Pixels></Image>
      <StructuredAnnotations>
        <XMLAnnotation><Value>
          <ChannelPriv ID="Channel:0" FluorescenceChannel="DAPI-dye"/>
        </Value></XMLAnnotation>
      </StructuredAnnotations>
    </OME>"""
    colors = TIFFWSIReader._parse_ome_metadata_mapping(
        ElementTree.fromstring(ome_xml)
    )
    # Color=65535 -> 0x00FFFF (cyan); dye annotation goes into the label
    assert colors["DAPI (DAPI-dye)"] == (0.0, 1.0, 1.0)
    # negative ints wrap to uint32; low 3 bytes read as RGB
    # (reference wsireader.py:4015-4031 semantics)
    assert colors["CD8"] == (0.0, 0.0, 1.0)

    filt_xml = """<Scan>
      <FilterColors>
        <FilterColors-k>EM123/EX456</FilterColors-k>
        <FilterColors-v>255, 0, 0</FilterColors-v>
      </FilterColors>
      <ScanBands>
        <ScanBands-i>
          <Bands-i><Name>OPAL520</Name></Bands-i>
          <FilterPair>
            <EmissionFilter><FixedFilter><PartNumber>EM123</PartNumber></FixedFilter></EmissionFilter>
            <ExcitationFilter><FixedFilter><PartNumber>EX456</PartNumber></FixedFilter></ExcitationFilter>
          </FilterPair>
        </ScanBands-i>
      </ScanBands>
    </Scan>"""
    colors = TIFFWSIReader._parse_filtercolor_metadata(
        ElementTree.fromstring(filt_xml)
    )
    assert colors["OPAL520"] == (1.0, 0.0, 0.0)


def test_multichannel_tiff_rgb_reads(tmp_path) -> None:
    """End-to-end: 6-channel OME TIFF reads as RGB via parsed colors."""
    from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    channels = ["DAPI", "CD4", "CD8", "FOXP3", "PanCK", "AF"]
    # channel i color = pure R/G/B rotation
    rgb_ints = [0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF, 0xFF00FF]
    chan_xml = "".join(
        f'<Channel ID="Channel:{i}" Name="{n}" Color="{c}"/>'
        for i, (n, c) in enumerate(zip(channels, rgb_ints))
    )
    ome = (
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        f"<Image><Pixels>{chan_xml}</Pixels></Image></OME>"
    )
    img = np.zeros((64, 64, 6), np.uint8)
    img[:, :, 0] = 200  # DAPI everywhere
    img[:32, :, 2] = 100  # CD8 top half
    path = tmp_path / "multi.ome.tiff"
    TiffPyramidWriter(
        path, tile_size=32, description=ome, compression="deflate"
    ).write([img])

    wsi = WSIReader.open(path)
    assert wsi.post_proc is not None
    assert list(wsi.post_proc.color_dict) == channels
    region = wsi.read_rect((0, 0), (64, 64), resolution=0, units="level")
    assert region.shape == (64, 64, 3)
    assert region.dtype == np.uint8
    # DAPI=200 red everywhere; CD8=100 blue in top half
    assert region[40, 10, 0] == 200 and region[40, 10, 2] == 0
    assert region[10, 10, 2] == 100
    # post_proc=None returns the raw channels
    raw = WSIReader.open(path, post_proc=None).read_rect(
        (0, 0), (64, 64), resolution=0, units="level"
    )
    assert raw.shape == (64, 64, 6)
    assert raw[10, 10, 0] == 200
