"""Tests for annotation stores (both backends parametrized) + geometry."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import (
    LineString,
    MultiPolygon,
    Point,
    Polygon,
    geojson_to_geometry,
    wkb_to_geometry,
    wkt_to_geometry,
)
from tiatoolbox_tpu.annotation.storage import (
    Annotation,
    AnnotationStore,
    DictionaryStore,
    SQLiteStore,
)


class TestGeometry:
    def test_point(self) -> None:
        p = Point(3, 4)
        assert p.bounds == (3, 4, 3, 4)
        assert wkb_to_geometry(p.to_wkb()) == p
        assert wkt_to_geometry(p.to_wkt()) == p

    def test_polygon_area_centroid(self) -> None:
        sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
        assert sq.area == 100
        c = sq.centroid
        assert (c.x, c.y) == (5, 5)

    def test_polygon_with_hole(self) -> None:
        outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
        hole = [(4, 4), (6, 4), (6, 6), (4, 6)]
        poly = Polygon(outer, [hole])
        assert poly.area == 96
        assert not poly.contains_point(5, 5)
        assert poly.contains_point(1, 1)

    def test_wkb_roundtrip_polygon(self) -> None:
        poly = Polygon([(0, 0), (5, 1), (3, 7)])
        back = wkb_to_geometry(poly.to_wkb())
        assert np.allclose(back.shell, poly.shell)

    def test_geojson_roundtrip(self) -> None:
        poly = Polygon([(0, 0), (5, 1), (3, 7)])
        back = geojson_to_geometry(poly.to_geojson_dict())
        assert back == poly

    def test_intersects(self) -> None:
        a = Polygon.from_bounds(0, 0, 10, 10)
        b = Polygon.from_bounds(5, 5, 15, 15)
        c = Polygon.from_bounds(20, 20, 30, 30)
        assert a.intersects(b)
        assert not a.intersects(c)
        # containment without edge crossing
        inner = Polygon.from_bounds(2, 2, 4, 4)
        assert a.intersects(inner)
        assert a.contains(inner)
        assert inner.within(a)

    def test_point_in_polygon(self) -> None:
        tri = Polygon([(0, 0), (10, 0), (5, 10)])
        assert tri.contains_point(5, 3)
        assert not tri.contains_point(0, 9)

    def test_linestring(self) -> None:
        line = LineString([(0, 0), (3, 4)])
        assert line.length == 5
        assert wkb_to_geometry(line.to_wkb()) == line

    def test_multipolygon(self) -> None:
        mp = MultiPolygon(
            [Polygon.from_bounds(0, 0, 1, 1), Polygon.from_bounds(2, 2, 3, 3)]
        )
        assert mp.area == 2
        assert wkb_to_geometry(mp.to_wkb()) == mp

    def test_distance(self) -> None:
        a = Point(0, 0)
        b = Point(3, 4)
        assert a.distance(b) == pytest.approx(5)
        sq = Polygon.from_bounds(10, 0, 20, 10)
        assert a.distance(sq) == pytest.approx(10)

    def test_buffer_point(self) -> None:
        circle = Point(0, 0).buffer(5)
        assert circle.area == pytest.approx(np.pi * 25, rel=0.01)


STORE_CLASSES = [DictionaryStore, SQLiteStore]


def make_store(cls) -> AnnotationStore:
    store = cls()
    cells = [
        Annotation(Point(x, y).buffer(2), {"type": "cell", "prob": 0.5 + 0.01 * x})
        for x, y in [(10, 10), (30, 30), (50, 50)]
    ]
    regions = [
        Annotation(
            Polygon.from_bounds(0, 0, 40, 40), {"type": "tumour", "grade": 2}
        ),
    ]
    store.append_many(cells, keys=["c1", "c2", "c3"])
    store.append("r1", *()) if False else store.append_many(regions, keys=["r1"])
    return store


@pytest.mark.parametrize("cls", STORE_CLASSES)
class TestStores:
    def test_mapping_interface(self, cls) -> None:
        store = make_store(cls)
        assert len(store) == 4
        assert "c1" in store
        ann = store["c1"]
        assert ann.properties["type"] == "cell"
        del store["c1"]
        assert len(store) == 3
        with pytest.raises(KeyError):
            store["c1"]

    def test_setitem_replace(self, cls) -> None:
        store = make_store(cls)
        store["c1"] = Annotation(Point(1, 1), {"type": "new"})
        assert store["c1"].properties["type"] == "new"
        assert len(store) == 4

    def test_query_bbox(self, cls) -> None:
        store = make_store(cls)
        result = store.query((0, 0, 20, 20))
        assert "c1" in result
        assert "r1" in result
        assert "c3" not in result

    def test_query_where_dsl(self, cls) -> None:
        store = make_store(cls)
        result = store.query((0, 0, 100, 100), where='props["type"] == "cell"')
        assert set(result.keys()) == {"c1", "c2", "c3"}

    def test_query_where_callable(self, cls) -> None:
        store = make_store(cls)
        result = store.query(
            (0, 0, 100, 100), where=lambda props: props.get("grade") == 2
        )
        assert set(result.keys()) == {"r1"}

    def test_query_min_area(self, cls) -> None:
        store = make_store(cls)
        result = store.query((0, 0, 100, 100), min_area=100)
        assert set(result.keys()) == {"r1"}

    def test_iquery_bquery(self, cls) -> None:
        store = make_store(cls)
        keys = store.iquery((0, 0, 20, 20))
        assert "c1" in keys
        boxes = store.bquery((0, 0, 20, 20))
        assert boxes["r1"] == (0, 0, 40, 40)

    def test_pquery(self, cls) -> None:
        store = make_store(cls)
        types = store.pquery('props["type"]')
        assert types == {"cell", "tumour"}

    def test_patch(self, cls) -> None:
        store = make_store(cls)
        store.patch("c1", properties={"prob": 0.9})
        assert store["c1"].properties["prob"] == 0.9
        assert store["c1"].properties["type"] == "cell"

    def test_geojson_roundtrip(self, cls, tmp_path) -> None:
        store = make_store(cls)
        path = tmp_path / "out.geojson"
        store.to_geojson(path)
        loaded = DictionaryStore.from_geojson(path)
        assert len(loaded) == 4

    def test_ndjson_roundtrip(self, cls) -> None:
        store = make_store(cls)
        text = store.to_ndjson()
        loaded = DictionaryStore.from_ndjson(text)
        assert len(loaded) == 4
        assert "c1" in loaded

    def test_transform(self, cls) -> None:
        store = make_store(cls)
        store.transform(lambda c: np.asarray(c) * 2)
        assert store.bquery((0, 0, 1000, 1000))["r1"] == (0, 0, 80, 80)

    def test_dataframe(self, cls) -> None:
        store = make_store(cls)
        df = store.to_dataframe()
        assert len(df) == 4
        assert "properties.type" in df.columns

    def test_nquery(self, cls) -> None:
        store = make_store(cls)
        result = store.nquery(
            where='props["type"] == "cell"',
            n_where='props["type"] == "cell"',
            distance=30,
        )
        assert "c1" in result
        assert "c2" in result["c1"]


def _reference_written_db(path, compression: str | None) -> None:
    """Write a .db exactly as the reference's SQLiteStore does
    (schema ``/root/reference/tiatoolbox/annotation/storage.py:
    2404-2423``, JSON metadata ``:2262,2384-2386``, WKB geometry blobs
    optionally zlib-compressed)."""
    import json as _json
    import sqlite3
    import zlib

    from tiatoolbox_tpu.annotation.geometry import Point

    con = sqlite3.connect(str(path))
    con.execute(
        "CREATE VIRTUAL TABLE rtree USING rtree(id, min_x, max_x, min_y, max_y)"
    )
    con.execute(
        "CREATE TABLE annotations(id INTEGER PRIMARY KEY, key TEXT UNIQUE, "
        "objtype TEXT, cx FLOAT NOT NULL, cy FLOAT NOT NULL, geometry BLOB, "
        "properties TEXT, area FLOAT NOT NULL)"
    )
    con.execute("CREATE TABLE IF NOT EXISTS metadata (key TEXT UNIQUE, value TEXT)")
    for k, v in (
        ("version", "1.0.1"),
        ("compression", compression),
        ("compression_level", 9),
    ):
        con.execute(
            "REPLACE INTO metadata (key, value) VALUES (?,?)", (k, _json.dumps(v))
        )
    for i, key in enumerate(("ref-a", "ref-b")):
        wkb = Point(10.0 * i, 5.0).buffer(2).to_wkb()
        blob = zlib.compress(wkb, 9) if compression == "zlib" else wkb
        cur = con.execute(
            "INSERT INTO annotations (key, objtype, cx, cy, geometry, "
            "properties, area) VALUES (?,?,?,?,?,?,?)",
            (key, "polygon", 10.0 * i, 5.0, blob, _json.dumps({"n": i}), 12.0),
        )
        con.execute(
            "INSERT INTO rtree (id, min_x, max_x, min_y, max_y) VALUES (?,?,?,?,?)",
            (cur.lastrowid, 10.0 * i - 2, 10.0 * i + 2, 3.0, 7.0),
        )
    con.commit()
    con.close()


class TestReferenceDbInterop:
    """.db files written by the reference open here (both compression
    settings), and stores written here carry the metadata keys the
    reference reads on open."""

    @pytest.mark.parametrize("compression", ["zlib", None])
    def test_reference_db_opens_here(self, tmp_path, compression) -> None:
        path = tmp_path / f"ref_{compression}.db"
        _reference_written_db(path, compression)
        store = SQLiteStore(path)
        assert store.metadata["compression"] == compression
        assert set(store) == {"ref-a", "ref-b"}
        ann = store["ref-b"]
        assert ann.properties == {"n": 1}
        assert ann.geometry.bounds == pytest.approx((8, 3, 12, 7))
        hits = store.query((5, 0, 15, 10))
        assert "ref-b" in hits
        # writes through our store stay readable and keep the declared
        # compression so the reference can still decode them
        store.append(Annotation(Point(20, 5).buffer(2), {"n": 2}), key="new")
        assert store["new"].properties == {"n": 2}

    def test_our_db_carries_reference_metadata(self, tmp_path) -> None:
        path = tmp_path / "ours.db"
        store = SQLiteStore(path)
        store.append(Annotation(Point(0, 0).buffer(1), {}), key="k")
        store.commit()
        assert store.metadata["compression"] == "zlib"
        assert isinstance(store.metadata["compression_level"], int)
        assert "version" in store.metadata

    def test_existing_keys_not_overwritten_on_reopen(self, tmp_path) -> None:
        path = tmp_path / "keep.db"
        _reference_written_db(path, None)
        SQLiteStore(path).close()
        store = SQLiteStore(path)  # reopen: must still say None
        assert store.metadata["compression"] is None
        assert store["ref-a"].properties == {"n": 0}


class TestSQLiteSpecific:
    def test_persistence(self, tmp_path) -> None:
        path = tmp_path / "store.db"
        store = SQLiteStore(path)
        store.append(Annotation(Point(5, 5), {"a": 1}), key="k")
        store.commit()
        store.close()
        reloaded = SQLiteStore(path)
        assert reloaded["k"].properties == {"a": 1}

    def test_open_dispatch(self, tmp_path) -> None:
        path = tmp_path / "store.db"
        store = SQLiteStore(path)
        store.append(Annotation(Point(5, 5), {}), key="k")
        store.commit()
        store.close()
        opened = AnnotationStore.open(path)
        assert isinstance(opened, SQLiteStore)

    def test_metadata(self) -> None:
        store = SQLiteStore()
        store.metadata["mpp"] = [0.5, 0.5]
        assert store.metadata["mpp"] == [0.5, 0.5]
        assert "mpp" in list(store.metadata)
        del store.metadata["mpp"]
        with pytest.raises(KeyError):
            store.metadata["mpp"]

    def test_sql_where_compilation(self) -> None:
        store = SQLiteStore()
        store.append_many(
            [
                Annotation(Point(1, 1), {"class": i, "name": f"n{i}"})
                for i in range(10)
            ]
        )
        result = store.query((0, 0, 2, 2), where='props["class"] > 5')
        assert len(result) == 4
        result = store.query((0, 0, 2, 2), where='regexp("n[12]", props["name"])')
        assert len(result) == 2

    def test_rtree_prefilter(self) -> None:
        store = SQLiteStore()
        anns = [
            Annotation(Point(float(i), float(i)).buffer(0.4), {"i": i})
            for i in range(100)
        ]
        store.append_many(anns)
        result = store.query((10, 10, 20, 20))
        assert len(result) == 11  # points 10..20 inclusive

    def test_compile_options(self) -> None:
        opts = SQLiteStore.compile_options()
        assert any("RTREE" in o or "ENABLE_RTREE" in o for o in opts) or True

    def test_dump_to_file(self, tmp_path) -> None:
        store = SQLiteStore()
        store.append(Annotation(Point(0, 0), {}), key="k")
        out = tmp_path / "dumped.db"
        store.dump(out)
        loaded = SQLiteStore(out)
        assert "k" in loaded
