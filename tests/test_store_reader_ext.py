"""Extended AnnotationStoreReader coverage (reference
``wsicore/wsireader.py:6268-6846`` behaviours): store-derived geometry,
base-slide compositing, alpha, renderer filters, dispatch from .db."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.utils.visualization import AnnotationRenderer
from tiatoolbox_tpu.wsicore.store_reader import AnnotationStoreReader
from tiatoolbox_tpu.wsicore.wsireader import WSIReader


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("sr") / "a.db"
    store = SQLiteStore(path)
    store.append(
        Annotation(
            Polygon([(100, 100), (400, 100), (400, 300), (100, 300)]),
            {"type": "tumour", "prob": 0.8},
        ),
        key="rect",
    )
    store.append(
        Annotation(Point(600, 500).buffer(40), {"type": "cell", "prob": 0.2}),
        key="dot",
    )
    store.commit()
    return path


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("sr") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return path


class TestStandalone:
    def test_info_from_store_bounds(self, db_path) -> None:
        reader = AnnotationStoreReader(str(db_path))
        w, h = reader.info.slide_dimensions
        assert w >= 640  # max annotation x extent
        assert h >= 540
        assert reader.info.vendor == "annotation-store"

    def test_read_rect_renders_annotation(self, db_path) -> None:
        reader = AnnotationStoreReader(str(db_path))
        region = reader.read_rect((100, 100), (128, 128))
        assert region.shape == (128, 128, 3)
        # annotation drawn: not the plain white background everywhere
        assert (region < 250).any()
        empty = reader.read_rect((0, 0), (64, 64))
        assert (empty == 255).all()  # background composited to white

    def test_where_filter_renderer(self, db_path) -> None:
        renderer = AnnotationRenderer(where='props["type"] == "cell"')
        reader = AnnotationStoreReader(str(db_path), renderer=renderer)
        region = reader.read_rect((100, 100), (128, 128))
        assert (region == 255).all()  # tumour rect filtered out

    def test_open_dispatches_db(self, db_path) -> None:
        reader = WSIReader.open(db_path)
        assert isinstance(reader, AnnotationStoreReader)

    def test_store_instance_input(self, db_path) -> None:
        store = SQLiteStore(db_path)
        reader = AnnotationStoreReader(store)
        assert reader.read_rect((100, 100), (64, 64)).shape == (64, 64, 3)


class TestWithBaseSlide:
    def test_info_follows_base(self, db_path, slide_path) -> None:
        reader = AnnotationStoreReader(str(db_path), base_wsi=slide_path)
        assert reader.info.slide_dimensions == (1024, 768)
        assert reader.info.mpp is not None

    def test_composite_blends_annotation(self, db_path, slide_path) -> None:
        base = WSIReader.open(slide_path)
        reader = AnnotationStoreReader(
            str(db_path), base_wsi=slide_path, alpha=1.0
        )
        inside = reader.read_rect((150, 150), (64, 64))
        base_inside = base.read_rect((150, 150), (64, 64))
        assert not np.array_equal(inside, base_inside)  # annotation on top
        outside = reader.read_rect((700, 100), (64, 64))
        base_outside = base.read_rect((700, 100), (64, 64))
        assert np.abs(
            outside.astype(int) - base_outside.astype(int)
        ).max() <= 1  # untouched where no annotation

    def test_alpha_zero_shows_base_only(self, db_path, slide_path) -> None:
        base = WSIReader.open(slide_path)
        reader = AnnotationStoreReader(
            str(db_path), base_wsi=slide_path, alpha=0.0
        )
        region = reader.read_rect((150, 150), (64, 64))
        expected = base.read_rect((150, 150), (64, 64))
        assert np.abs(region.astype(int) - expected.astype(int)).max() <= 1

    def test_downsampled_read(self, db_path, slide_path) -> None:
        reader = AnnotationStoreReader(str(db_path), base_wsi=slide_path)
        region = reader.read_bounds(
            (0, 0, 1024, 768), resolution=0.25, units="baseline"
        )
        assert region.shape == (192, 256, 3)

    def test_thumbnail(self, db_path, slide_path) -> None:
        reader = AnnotationStoreReader(str(db_path), base_wsi=slide_path)
        thumb = reader.slide_thumbnail(resolution=1 / 8, units="baseline")
        assert thumb.shape == (96, 128, 3)
