"""Geometry library suite (``annotation/geometry.py``).

The in-house replacement for Shapely/GEOS: constructors, measures,
predicates, distance, buffering, and the WKB/WKT/GeoJSON codecs.
Expected values cross-checked against Shapely semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import (
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    geojson_to_geometry,
    geometry_contains,
    geometry_distance,
    geometry_intersects,
    wkb_to_geometry,
    wkt_to_geometry,
)

SQUARE = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
DONUT = Polygon(
    [(0, 0), (12, 0), (12, 12), (0, 12)],
    holes=[[(4, 4), (8, 4), (8, 8), (4, 8)]],
)


class TestMeasures:
    def test_point_basics(self) -> None:
        p = Point(3, 4)
        assert (p.x, p.y) == (3, 4)
        assert p.bounds == (3, 4, 3, 4)
        assert p.area == 0
        c = p.centroid
        assert (c.x, c.y) == (3, 4)

    def test_point_from_pair(self) -> None:
        p = Point((1.5, 2.5))
        assert (p.x, p.y) == (1.5, 2.5)

    def test_linestring_length(self) -> None:
        line = LineString([(0, 0), (3, 0), (3, 4)])
        assert line.length == pytest.approx(7.0)
        assert line.bounds == (0, 0, 3, 4)

    def test_linestring_centroid_is_arc_midpoint(self) -> None:
        line = LineString([(0, 0), (10, 0)])
        c = line.centroid
        assert (c.x, c.y) == pytest.approx((5, 0))

    def test_polygon_area_and_perimeter(self) -> None:
        assert SQUARE.area == pytest.approx(100.0)
        assert SQUARE.length == pytest.approx(40.0)

    def test_polygon_orientation_invariant_area(self) -> None:
        cw = Polygon([(0, 0), (0, 10), (10, 10), (10, 0)])
        assert cw.area == pytest.approx(100.0)

    def test_donut_area_subtracts_hole(self) -> None:
        assert DONUT.area == pytest.approx(12 * 12 - 4 * 4)

    def test_polygon_centroid(self) -> None:
        c = SQUARE.centroid
        assert (c.x, c.y) == pytest.approx((5, 5))

    def test_multi_aggregates(self) -> None:
        mp = MultiPolygon([SQUARE, Polygon.from_bounds(20, 0, 30, 10)])
        assert mp.area == pytest.approx(200.0)
        assert mp.bounds == (0, 0, 30, 10)

    def test_from_bounds(self) -> None:
        poly = Polygon.from_bounds(1, 2, 5, 7)
        assert poly.bounds == (1, 2, 5, 7)
        assert poly.area == pytest.approx(20.0)

    def test_buffer_approximates_circle(self) -> None:
        circle = Point(0, 0).buffer(5, resolution=64)
        assert circle.area == pytest.approx(np.pi * 25, rel=0.01)
        assert circle.bounds == pytest.approx((-5, -5, 5, 5), abs=0.02)


class TestPredicates:
    def test_point_in_polygon(self) -> None:
        assert SQUARE.contains_point(5, 5)
        assert not SQUARE.contains_point(15, 5)

    def test_point_in_hole_not_contained(self) -> None:
        assert DONUT.contains_point(2, 2)
        assert not DONUT.contains_point(6, 6)  # inside the hole

    def test_polygon_polygon_overlap(self) -> None:
        other = Polygon.from_bounds(5, 5, 15, 15)
        assert geometry_intersects(SQUARE, other)
        assert geometry_intersects(other, SQUARE)

    def test_disjoint_polygons(self) -> None:
        far = Polygon.from_bounds(100, 100, 110, 110)
        assert not geometry_intersects(SQUARE, far)

    def test_nested_polygon_intersects_and_contains(self) -> None:
        inner = Polygon.from_bounds(2, 2, 8, 8)
        assert geometry_intersects(SQUARE, inner)
        assert geometry_contains(SQUARE, inner)
        assert not geometry_contains(inner, SQUARE)

    def test_line_crosses_polygon(self) -> None:
        line = LineString([(-5, 5), (15, 5)])
        assert geometry_intersects(SQUARE, line)
        assert geometry_intersects(line, SQUARE)

    def test_line_inside_polygon(self) -> None:
        line = LineString([(2, 2), (8, 8)])
        assert geometry_intersects(SQUARE, line)
        assert geometry_contains(SQUARE, line)

    def test_point_on_line(self) -> None:
        line = LineString([(0, 0), (10, 0)])
        assert geometry_intersects(line, Point(5, 0))
        assert not geometry_intersects(line, Point(5, 1))

    def test_point_point(self) -> None:
        assert geometry_intersects(Point(1, 1), Point(1, 1))
        assert not geometry_intersects(Point(1, 1), Point(1, 2))

    def test_contains_only_for_polygons(self) -> None:
        assert not geometry_contains(Point(0, 0), Point(0, 0))
        assert not geometry_contains(LineString([(0, 0), (1, 1)]), Point(0.5, 0.5))

    def test_multi_intersects_any_part(self) -> None:
        mp = MultiPoint([Point(100, 100), Point(5, 5)])
        assert geometry_intersects(SQUARE, mp)

    def test_bbox_intersects_fast_reject(self) -> None:
        assert not SQUARE.bbox_intersects(Polygon.from_bounds(11, 11, 20, 20))
        assert SQUARE.bbox_intersects(Polygon.from_bounds(9, 9, 20, 20))


class TestDistance:
    def test_distance_zero_when_intersecting(self) -> None:
        assert geometry_distance(SQUARE, Point(5, 5)) == 0.0

    def test_point_to_polygon_edge(self) -> None:
        assert geometry_distance(SQUARE, Point(13, 5)) == pytest.approx(3.0)

    def test_point_to_point(self) -> None:
        assert geometry_distance(Point(0, 0), Point(3, 4)) == pytest.approx(5.0)

    def test_polygon_to_polygon_gap(self) -> None:
        other = Polygon.from_bounds(14, 0, 20, 10)
        assert geometry_distance(SQUARE, other) == pytest.approx(4.0)

    def test_distance_method_matches_function(self) -> None:
        a, b = Point(0, 0), Point(6, 8)
        assert a.distance(b) == pytest.approx(10.0)


class TestCodecs:
    GEOMS = [
        Point(1.5, -2.25),
        LineString([(0, 0), (3, 1), (4, -2)]),
        SQUARE,
        DONUT,
        MultiPoint([Point(0, 0), Point(2, 2)]),
        MultiLineString(
            [LineString([(0, 0), (1, 1)]), LineString([(2, 2), (3, 3)])]
        ),
        MultiPolygon([SQUARE, Polygon.from_bounds(20, 20, 25, 25)]),
    ]

    @pytest.mark.parametrize("geom", GEOMS, ids=lambda g: type(g).__name__)
    def test_wkb_roundtrip(self, geom) -> None:
        back = wkb_to_geometry(geom.to_wkb())
        assert type(back) is type(geom)
        assert np.allclose(back.coords, geom.coords)
        assert back.bounds == pytest.approx(geom.bounds)

    @pytest.mark.parametrize("geom", GEOMS, ids=lambda g: type(g).__name__)
    def test_wkt_roundtrip(self, geom) -> None:
        back = wkt_to_geometry(geom.to_wkt())
        assert type(back) is type(geom)
        assert np.allclose(back.coords, geom.coords)

    @pytest.mark.parametrize("geom", GEOMS, ids=lambda g: type(g).__name__)
    def test_geojson_roundtrip(self, geom) -> None:
        back = geojson_to_geometry(geom.to_geojson_dict())
        assert type(back) is type(geom)
        assert np.allclose(back.coords, geom.coords)

    def test_wkt_shapely_style_strings(self) -> None:
        assert wkt_to_geometry("POINT (1 2)").coords.tolist() == [[1, 2]]
        line = wkt_to_geometry("LINESTRING (0 0, 1 1)")
        assert isinstance(line, LineString)
        poly = wkt_to_geometry("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        assert isinstance(poly, Polygon)
        assert poly.area == pytest.approx(16.0)

    def test_wkb_big_endian_decodes(self) -> None:
        import struct

        # hand-built big-endian WKB point
        data = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 7.0, -3.0)
        p = wkb_to_geometry(data)
        assert isinstance(p, Point)
        assert (p.x, p.y) == (7.0, -3.0)

    def test_hole_preserved_in_codecs(self) -> None:
        for codec in ("wkb", "wkt", "geojson"):
            if codec == "wkb":
                back = wkb_to_geometry(DONUT.to_wkb())
            elif codec == "wkt":
                back = wkt_to_geometry(DONUT.to_wkt())
            else:
                back = geojson_to_geometry(DONUT.to_geojson_dict())
            assert back.area == pytest.approx(DONUT.area)
            assert not back.contains_point(6, 6)

    def test_eq_and_hash_by_wkb(self) -> None:
        a = Polygon.from_bounds(0, 0, 2, 2)
        b = Polygon.from_bounds(0, 0, 2, 2)
        assert a == b
        assert hash(a) == hash(b)
        assert a != Polygon.from_bounds(0, 0, 3, 3)


class TestGeometryCollection:
    """Heterogeneous WKB type-7 collections (Shapely stores can hold
    them, e.g. persisted intersection results)."""

    def _sample(self):
        from tiatoolbox_tpu.annotation.geometry import (
            GeometryCollection,
            LineString,
            Point,
            Polygon,
        )

        return GeometryCollection([
            Point(1.5, 2.5),
            LineString([(0, 0), (3, 4)]),
            Polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]),
        ])

    def test_wkb_roundtrip(self) -> None:
        from tiatoolbox_tpu.annotation.geometry import (
            GeometryCollection,
            wkb_to_geometry,
        )

        gc = self._sample()
        back = wkb_to_geometry(gc.to_wkb())
        assert isinstance(back, GeometryCollection)
        assert [g.geom_type for g in back.geoms] == [
            "Point", "LineString", "Polygon",
        ]
        assert back.to_wkb() == gc.to_wkb()

    def test_wkt_roundtrip_with_typed_members(self) -> None:
        from tiatoolbox_tpu.annotation.geometry import wkt_to_geometry

        gc = self._sample()
        wkt = gc.to_wkt()
        assert wkt.startswith("GEOMETRYCOLLECTION (POINT")
        back = wkt_to_geometry(wkt)
        assert back.to_wkt() == wkt
        empty = wkt_to_geometry("GEOMETRYCOLLECTION EMPTY")
        assert empty.geoms == []

    def test_geojson_roundtrip(self) -> None:
        from tiatoolbox_tpu.annotation.geometry import geojson_to_geometry

        gc = self._sample()
        d = gc.to_geojson_dict()
        assert d["type"] == "GeometryCollection"
        assert len(d["geometries"]) == 3
        back = geojson_to_geometry(d)
        assert back.to_wkb() == gc.to_wkb()

    def test_measures_and_enum(self) -> None:
        from tiatoolbox_tpu.enums import GeometryType

        gc = self._sample()
        assert gc.area == pytest.approx(16.0)
        assert gc.bounds == (0, 0, 4, 4)
        assert GeometryType(gc.geom_type) == GeometryType.GEOMETRY_COLLECTION

    def test_store_roundtrip_both_backends(self) -> None:
        from tiatoolbox_tpu.annotation.storage import (
            Annotation,
            DictionaryStore,
            SQLiteStore,
        )

        for cls in (SQLiteStore, DictionaryStore):
            store = cls(":memory:")
            store["gc"] = Annotation(self._sample(), {"kind": "mixed"})
            ann = store["gc"]
            assert ann.geometry.to_wkb() == self._sample().to_wkb()
            assert "gc" in store.query((0, 0, 5, 5))

    def test_rejects_non_geometry_members(self) -> None:
        from tiatoolbox_tpu.annotation.geometry import GeometryCollection

        with pytest.raises(TypeError, match="Geometry instances"):
            GeometryCollection([(0, 0), (1, 1)])
