"""GeometryType enum (reference ``tests/test_enums.py`` behaviours)."""

from __future__ import annotations

import pytest

from tiatoolbox_tpu.enums import GeometryType


class TestInit:
    @pytest.mark.parametrize(
        ("value", "member"),
        [
            ("Point", GeometryType.POINT),
            ("LineString", GeometryType.LINE_STRING),
            ("Polygon", GeometryType.POLYGON),
            ("MultiPoint", GeometryType.MULTI_POINT),
            ("MultiLineString", GeometryType.MULTI_LINE_STRING),
            ("MultiPolygon", GeometryType.MULTI_POLYGON),
            ("GeometryCollection", GeometryType.GEOMETRY_COLLECTION),
        ],
    )
    def test_from_string(self, value, member) -> None:
        assert GeometryType(value) == member

    @pytest.mark.parametrize("code", range(1, 8))
    def test_from_wkb_code(self, code) -> None:
        assert GeometryType(code).value == code

    def test_missing_raises(self) -> None:
        with pytest.raises(ValueError, match="not a valid GeometryType"):
            GeometryType(None)
        with pytest.raises(ValueError, match="not a valid GeometryType"):
            GeometryType("NotAShape")

    def test_str_and_camel(self) -> None:
        assert str(GeometryType.MULTI_POLYGON) == "Multi Polygon"
        assert GeometryType.MULTI_POLYGON.camel_name == "MultiPolygon"
        assert str(GeometryType.POINT) == "Point"


class TestAnnotationIntegration:
    def test_annotation_geometry_type(self) -> None:
        from tiatoolbox_tpu.annotation.geometry import (
            LineString,
            Point,
            Polygon,
        )
        from tiatoolbox_tpu.annotation.storage import Annotation

        sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
        assert Annotation(Point(0, 0)).geometry_type == GeometryType.POINT
        assert (
            Annotation(LineString([(0, 0), (1, 1)])).geometry_type
            == GeometryType.LINE_STRING
        )
        assert Annotation(Polygon(sq)).geometry_type == GeometryType.POLYGON

    def test_wkb_code_matches_codec(self) -> None:
        """Enum values are the WKB type codes our codec writes."""
        import struct

        from tiatoolbox_tpu.annotation.geometry import Point

        wkb = Point(3.0, 4.0).to_wkb()
        code = struct.unpack_from("<I", wkb, 1)[0]
        assert GeometryType(code) == GeometryType.POINT
