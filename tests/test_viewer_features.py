"""Viewer feature surface: predicate filter, colormaps, stats pane API.

Covers the reference bokeh-app workflow (overlay a store, filter by a
property predicate, recolor, inspect stats —
``/root/reference/tiatoolbox/visualization/bokeh_app/main.py:553,808``)
through the WSGI TileServer's session API + the JS viewer page.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.visualization.tileserver import TileServer
from tiatoolbox_tpu.visualization.viewer import render_viewer_html


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viewer")
    slide = tmp / "s.tiff"
    make_synthetic_slide(slide, size=(512, 384), mpp=0.5, objective_power=20)
    store = SQLiteStore()
    rng = np.random.default_rng(0)
    for i in range(30):
        x, y = rng.uniform(50, 450), rng.uniform(50, 330)
        store.append(
            Annotation(
                Point(x, y).buffer(8),
                {"type": "cell" if i % 3 else "vessel", "prob": float(i) / 30},
            )
        )
    server = TileServer(layers={"slide": str(slide)})
    server.add_layer("overlay", store)
    httpd, port = server.run_in_thread()
    yield port
    httpd.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
        return json.loads(resp.read())


def _put(port, path, **params):
    data = urllib.parse.urlencode(params).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method="PUT"
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


class TestStatsRoute:
    def test_numeric_stats_with_histogram(self, served) -> None:
        out = _get(served, "/tileserver/prop_stats/prob")
        stats = out["stats"]
        assert stats["kind"] == "numeric"
        assert stats["count"] == 30
        assert stats["min"] == pytest.approx(0.0)
        assert sum(stats["hist"]) == 30
        assert len(stats["edges"]) == len(stats["hist"]) + 1

    def test_categorical_stats(self, served) -> None:
        stats = _get(served, "/tileserver/prop_stats/type")["stats"]
        assert stats["kind"] == "categorical"
        assert set(stats["value_counts"]) == {"cell", "vessel"}
        assert sum(stats["value_counts"].values()) == 30

    def test_missing_prop(self, served) -> None:
        assert _get(served, "/tileserver/prop_stats/nope")["stats"] is None

    def test_bool_property_is_categorical(self, tmp_path) -> None:
        from tiatoolbox_tpu.visualization.tileserver import TileServer

        slide = tmp_path / "s1.tiff"
        make_synthetic_slide(slide, size=(256, 192), mpp=0.5)
        store = SQLiteStore()
        for i in range(6):
            store.append(
                Annotation(Point(i * 10, 10).buffer(2), {"flag": i % 2 == 0})
            )
        server = TileServer(layers={"slide": str(slide)})
        server.add_layer("overlay", store)
        httpd, port = server.run_in_thread()
        try:
            stats = _get(port, "/tileserver/prop_stats/flag")["stats"]
            assert stats["kind"] == "categorical"
            assert stats["value_counts"] == {"True": 3, "False": 3}
        finally:
            httpd.shutdown()

    def test_nan_values_excluded_from_histogram(self, tmp_path) -> None:
        from tiatoolbox_tpu.visualization.tileserver import TileServer

        slide = tmp_path / "s2.tiff"
        make_synthetic_slide(slide, size=(256, 192), mpp=0.5)
        store = SQLiteStore()
        vals = [0.25, float("nan"), 0.75, float("nan")]
        for i, v in enumerate(vals):
            store.append(Annotation(Point(i * 10, 10).buffer(2), {"p": v}))
        server = TileServer(layers={"slide": str(slide)})
        server.add_layer("overlay", store)
        httpd, port = server.run_in_thread()
        try:
            stats = _get(port, "/tileserver/prop_stats/p")["stats"]
            assert stats["kind"] == "numeric"
            assert sum(stats["hist"]) == 2  # NaNs dropped, no 500
        finally:
            httpd.shutdown()


class TestPredicateFilter:
    def test_where_filters_rendered_annotations(self, served) -> None:
        # unfiltered tile at max zoom over the full extent
        def overlay_tile():
            url = (
                f"http://127.0.0.1:{served}/tileserver/layer/overlay/default/"
                "zoomify/TileGroup0/1-0-0.jpg"
            )
            with urllib.request.urlopen(url) as resp:
                return resp.read()

        before = overlay_tile()
        _put(served, "/tileserver/renderer/where",
             val='props["type"] == "vessel"')
        filtered = overlay_tile()
        _put(served, "/tileserver/renderer/where", val="null")
        after = overlay_tile()
        assert filtered != before  # fewer annotations rendered
        assert after == before  # filter cleared

    def test_where_roundtrip_via_get(self, served) -> None:
        _put(served, "/tileserver/renderer/where", val='props["prob"] > 0.5')
        got = _get(served, "/tileserver/renderer/where")
        assert got["where"] == 'props["prob"] > 0.5'
        _put(served, "/tileserver/renderer/where", val="null")


class TestColormap:
    def test_continuous_cmap_and_range(self, served) -> None:
        _put(served, "/tileserver/color_prop", prop="prob")
        out = _put(served, "/tileserver/prop_range", prop="prob")
        assert out["range"] == pytest.approx([0.0, 29 / 30])
        out = _put(served, "/tileserver/cmap", cmap="viridis")
        assert out["cmap"] == "viridis"
        # categorical mapping via JSON dict
        out = _put(
            served, "/tileserver/cmap",
            cmap=json.dumps({"cell": [255, 0, 0, 255], "vessel": [0, 0, 255, 255]}),
        )
        _put(served, "/tileserver/color_prop", prop="")


class TestViewerPage:
    def test_page_served_with_new_controls(self, served) -> None:
        with urllib.request.urlopen(f"http://127.0.0.1:{served}/viewer") as resp:
            html = resp.read().decode()
        for element_id in (
            "filterpanel", "filterrows", "applyfilter", "clearfilter",
            "statspanel", "statprop", "histcanvas", "cmap",
        ):
            assert f'id="{element_id}"' in html

    def test_render_helper_formats(self) -> None:
        html = render_viewer_html("t")
        assert "buildPredicate" in html
        assert "prop_stats" in html


class TestViewerMultichannel:
    """Viewer-driven fluorescence channel UI (VERDICT r3 item 6).

    Drives ``/tileserver/channels`` + ``/tileserver/enhance`` with the
    exact parameter forms the viewer page's ``applyChannels()`` /
    enhance slider send (JSON color dict + active index list, ``val``
    float), against a synthetic 5-channel OME fluorescence slide —
    reference ``bokeh_app/main.py:169-320`` (``create_channel_color_ui``).
    """

    @pytest.fixture(scope="class")
    def fluor(self, tmp_path_factory, served):
        from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter

        tmp = tmp_path_factory.mktemp("fluor")
        chan = "".join(
            f'<Channel ID="Channel:{i}" Name="DAPI{i}" Color="{c}"/>'
            for i, c in enumerate(
                [0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0xFF00FF]
            )
        )
        ome = (
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
            f"<Image><Pixels>{chan}</Pixels></Image></OME>"
        )
        rng = np.random.default_rng(1)
        img = rng.integers(0, 120, (96, 96, 5)).astype(np.uint8)
        path = tmp / "fluor.ome.tiff"
        TiffPyramidWriter(
            path, tile_size=32, description=ome, compression="deflate"
        ).write([img])
        sid = _put(served, "/tileserver/session_id")["session_id"]
        _put(
            served, "/tileserver/slide",
            session_id=sid, slide_path=str(path),
        )
        return served, sid

    def _tile(self, port, sid):
        import cv2

        url = (
            f"http://127.0.0.1:{port}/tileserver/layer/slide/{sid}"
            "/zoomify/TileGroup0/0-0-0.jpg"
        )
        with urllib.request.urlopen(url) as resp:
            buf = np.frombuffer(resp.read(), np.uint8)
        return cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)

    def test_initchannels_payload(self, fluor) -> None:
        # what the page's initChannels() reads on load
        port, sid = fluor
        out = _get(port, f"/tileserver/channels?session_id={sid}")
        assert out["names"] == [f"DAPI{i}" for i in range(5)]
        assert len(out["colors"]) == 5
        assert out["colors"][0] == [1.0, 0.0, 0.0]
        assert out["active"] is None or len(out["active"]) <= 5

    def test_apply_channels_color_dict_and_active(self, fluor) -> None:
        # exact applyChannels() form: channels=JSON color dict, active=list
        port, sid = fluor
        before = self._tile(port, sid)
        dict_form = json.dumps(
            {f"DAPI{i}": [0.0, 0.0, 1.0] for i in range(5)}
        )
        out = _put(
            port, "/tileserver/channels",
            session_id=sid, channels=dict_form, active=json.dumps([0, 1]),
        )
        assert out["channels"] == [0, 1]
        assert out["colors"][0] == [0.0, 0.0, 1.0]
        after = self._tile(port, sid)
        # all-blue colors: red/green energy must collapse vs before
        assert int(after[..., 0].sum()) < int(before[..., 0].sum())
        assert after[..., 2].mean() > after[..., 0].mean()
        # hex colors (the page's <input type=color> values) also accepted
        out = _put(
            port, "/tileserver/channels",
            session_id=sid,
            channels=json.dumps({f"DAPI{i}": "#00ff00" for i in range(5)}),
            active=json.dumps(list(range(5))),
        )
        assert out["colors"][0] == [0.0, 1.0, 0.0]
        assert out["channels"] == [0, 1, 2, 3, 4]

    def test_enhance_slider(self, fluor) -> None:
        port, sid = fluor
        dim = self._tile(port, sid)
        out = _put(port, "/tileserver/enhance", session_id=sid, val="4.0")
        assert out["enhance"] == 4.0
        bright = self._tile(port, sid)
        assert bright.astype(int).sum() > dim.astype(int).sum()
        _put(port, "/tileserver/enhance", session_id=sid, val="1.0")

    def test_page_ships_channel_ui(self, served) -> None:
        with urllib.request.urlopen(f"http://127.0.0.1:{served}/viewer") as resp:
            html = resp.read().decode()
        for element_id in (
            "chanpanel", "chanrows", "chanapply", "chanall", "channone",
            "enhance", "chanbtn",
        ):
            assert f'id="{element_id}"' in html
        assert "initChannels();" in html  # wired into init()
        assert "applyChannels" in html
