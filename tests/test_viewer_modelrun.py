"""Interactive model-run + graph overlays through the tile server.

Reference parity targets: the bokeh app's segment-on-box
(``bokeh_app/main.py:1443-1501``), SAM prompt segmentation
(``main.py:1503-1600``), and SlideGraph node/edge overlay layers with
per-feature node coloring (``main.py:682,1286-1297``).

segment_on_box runs END TO END: the registry loads the functional
HoVerNet checkpoint (scripts/make_bench_checkpoints.py), the engine
segments the drawn box, and the resulting instances land in a rendered
"segment" annotation layer.
"""

from __future__ import annotations

import json
import sys
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.visualization.tileserver import TileServer


@pytest.fixture(scope="module")
def bench_home(tmp_path_factory):
    """Isolated TIATOOLBOX_HOME holding the functional checkpoint."""
    from make_bench_checkpoints import ensure_hovernet_bench_checkpoint

    from tiatoolbox_tpu import rcParam

    home = tmp_path_factory.mktemp("home")
    old = rcParam["TIATOOLBOX_HOME"]
    rcParam["TIATOOLBOX_HOME"] = str(home)
    ensure_hovernet_bench_checkpoint()
    yield home
    rcParam["TIATOOLBOX_HOME"] = old


@pytest.fixture(scope="module")
def served(tmp_path_factory, bench_home):
    tmp = tmp_path_factory.mktemp("mr")
    slide = tmp / "s.tiff"
    # mpp 0.25 matches hovernet_fast-pannuke's working resolution
    make_synthetic_slide(slide, size=(760, 560), mpp=0.25, objective_power=40)
    server = TileServer(layers={"slide": str(slide)})
    httpd, port = server.run_in_thread()
    yield port, server, tmp
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


class TestSegmentOnBox:
    def test_end_to_end_segmentation(self, served) -> None:
        port, server, _tmp = served
        res = _put(
            port, "/tileserver/segment_on_box",
            x0=100, y0=80, x1=500, y1=420,
        )
        assert res["layer"] == "segment"
        assert res["count"] > 5  # real nuclei found in the box
        assert set(res["types"]) <= {0, 1}
        assert "segment" in _get(port, "/tileserver/layers")["layers"]
        # instances lie inside the drawn box (baseline coords)
        store = server.layers["segment"]
        for ann in store.values():
            x0b, y0b, x1b, y1b = ann.geometry.bounds
            assert 90 <= x0b and x1b <= 510
            assert 70 <= y0b and y1b <= 430
        # the overlay actually renders
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tileserver/layer/segment/default/"
            "zoomify/TileGroup0/2-0-0.jpg"
        ) as resp:
            assert resp.status == 200

    def test_missing_box_param_is_400(self, served) -> None:
        port, _server, _tmp = served
        with pytest.raises(urllib.error.HTTPError) as err:
            _put(port, "/tileserver/segment_on_box", x0=0, y0=0, x1=100)
        assert err.value.code == 400


class TestPromptSegment:
    def test_stub_prompt_segmentor(self, served) -> None:
        port, server, tmp = served

        class StubPromptSegmentor:
            scale = 1.0
            offset = np.array([0, 0])

            def run(self, images, point_coords=None, box_coords=None,
                    save_dir=None, device="cpu"):
                from tiatoolbox_tpu.utils.store_conversion import (
                    dict_to_store_semantic_segmentor,
                )

                mask = np.zeros(np.asarray(images[0]).shape[:2], np.uint8)
                mask[10:60, 10:60] = 1
                out = Path(save_dir) / "0.db"
                dict_to_store_semantic_segmentor(
                    {"predictions": mask},
                    scale_factor=(self.scale, self.scale),
                    offset=tuple(self.offset),
                    save_path=out,
                )
                return [out]

        server.prompt_segmentor = StubPromptSegmentor()
        res = _put(
            port, "/tileserver/prompt_segment",
            points=json.dumps([[300.0, 300.0]]),
        )
        assert res["layer"] == "prompt"
        assert res["count"] >= 1
        assert "prompt" in _get(port, "/tileserver/layers")["layers"]
        # the mask polygon is offset into slide coords (window origin
        # 300-256=44 -> mask at ~54..104)
        store = server.layers["prompt"]
        bounds = np.array([a.geometry.bounds for a in store.values()])
        assert bounds[:, 0].min() >= 44

    def test_no_prompts_is_400(self, served) -> None:
        port, _server, _tmp = served
        with pytest.raises(urllib.error.HTTPError) as err:
            _put(port, "/tileserver/prompt_segment")
        assert err.value.code == 400


class TestGraphOverlay:
    def test_graph_layers_from_json(self, served) -> None:
        port, server, tmp = served
        # SlideGraph-format dict (keys match SlideGraphConstructor.build:
        # coordinates / edge_index / x) hand-built at slide scale — the
        # constructor itself is covered by its own suite
        rng = np.random.default_rng(0)
        coords = rng.uniform(20, 640, (12, 2))
        edge_index = np.stack(
            [np.arange(11), np.arange(1, 12)]
        )
        feats = rng.random((12, 8))
        graph_path = tmp / "graph.json"
        graph_path.write_text(
            json.dumps(
                {
                    "coordinates": coords.tolist(),
                    "edge_index": edge_index.tolist(),
                    "x": feats.tolist(),
                }
            )
        )
        res = _put(port, "/tileserver/graph", graph_path=str(graph_path))
        assert res["nodes"] > 0
        assert res["edges"] > 0
        assert "feat_0" in res["node_props"]
        layers = _get(port, "/tileserver/layers")["layers"]
        assert "graph_nodes" in layers
        assert "graph_edges" in layers
        # per-feature node coloring via the standard renderer API
        _put(port, "/tileserver/color_prop", prop="feat_0")
        _put(port, "/tileserver/prop_range", prop="feat_0")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tileserver/layer/graph_nodes/default/"
            "zoomify/TileGroup0/2-0-0.jpg"
        ) as resp:
            assert resp.status == 200
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tileserver/layer/graph_edges/default/"
            "zoomify/TileGroup0/2-0-0.jpg"
        ) as resp:
            assert resp.status == 200

    def test_graph_npz_and_get(self, served) -> None:
        port, _server, tmp = served
        coords = np.array([[10.0, 10.0], [200.0, 200.0], [400.0, 120.0]])
        edges = np.array([[0, 1], [1, 2]]).T
        npz = tmp / "g.npz"
        np.savez(npz, coordinates=coords, edge_index=edges)
        res = _put(port, "/tileserver/graph", graph_path=str(npz))
        assert res["nodes"] == 3
        assert res["edges"] == 2
        assert _get(port, "/tileserver/graph")["nodes"] == 3


class TestViewerControls:
    def test_page_ships_modelrun_controls(self, served) -> None:
        port, _server, _tmp = served
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/viewer") as resp:
            html = resp.read().decode()
        for needle in (
            "segment_on_box", "prompt_segment", "/tileserver/graph",
            "segbox", "sammode", "graphload",
        ):
            assert needle in html
