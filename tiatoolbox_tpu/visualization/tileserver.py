"""WSGI tile server (reference ``visualization/tileserver.py:43-893``).

The reference uses Flask; this build serves the same Zoomify routes on
the stdlib ``wsgiref`` server (zero extra dependencies):

- ``/``                                       — minimal viewer page
- ``/tileserver/layers``                      — JSON layer listing
- ``/tileserver/layer/<layer>/<session>/zoomify/TileGroup<g>/<z>-<x>-<y>.jpg``
- ``/tileserver/info/<layer>``                — slide metadata JSON
- ``/tileserver/tap_query/<layer>/<x>/<y>``   — annotation hit query

Layers are WSIReaders (slides) or AnnotationStores (rendered via
AnnotationTileGenerator).
"""

from __future__ import annotations

import json
import re
import threading
from pathlib import Path
from wsgiref.simple_server import WSGIServer, make_server

import cv2
import numpy as np

from tiatoolbox_tpu import logger


class TileServer:
    """Multi-layer Zoomify tile server.

    Args:
        title: Display title.
        layers: Mapping name → path/ndarray/WSIReader/AnnotationStore.
        renderer: AnnotationRenderer for store layers.
    """

    def __init__(self, title: str = "tiatoolbox-tpu", layers=None, renderer=None) -> None:
        self.title = title
        self.renderer = renderer
        self.layers: dict[str, object] = {}
        self.pyramids: dict[str, object] = {}
        self._base_info = None
        for name, layer in (layers or {}).items():
            self.add_layer(name, layer)

    def add_layer(self, name: str, layer) -> None:
        """Register a slide or annotation-store layer."""
        from tiatoolbox_tpu.annotation.storage import AnnotationStore
        from tiatoolbox_tpu.tools.pyramid import (
            AnnotationTileGenerator,
            ZoomifyGenerator,
        )
        from tiatoolbox_tpu.utils import magic
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        if isinstance(layer, AnnotationStore):
            if self._base_info is None:
                msg = "Add a slide layer before annotation layers."
                raise ValueError(msg)
            self.layers[name] = layer
            self.pyramids[name] = AnnotationTileGenerator(
                self._base_info, layer, renderer=self.renderer
            )
            return
        if isinstance(layer, (str, Path)) and (
            magic.is_sqlite3(layer) or str(layer).endswith(".db")
        ):
            store = AnnotationStore.open(layer)
            self.add_layer(name, store)
            return
        reader = WSIReader.open(layer)
        self.layers[name] = reader
        self.pyramids[name] = ZoomifyGenerator(reader)
        if self._base_info is None:
            self._base_info = reader.info

    # -- request handling -------------------------------------------------------

    _TILE_RE = re.compile(
        r"^/tileserver/layer/(?P<layer>[^/]+)/(?P<session>[^/]+)/zoomify/"
        r"TileGroup\d+/(?P<z>\d+)-(?P<x>\d+)-(?P<y>\d+)\.jpg$"
    )

    def __call__(self, environ, start_response):
        """WSGI entry point."""
        path = environ.get("PATH_INFO", "/")
        try:
            if path == "/":
                return self._respond_html(start_response, self._index_html())
            if path == "/viewer":
                from tiatoolbox_tpu.visualization.viewer import render_viewer_html

                return self._respond_html(
                    start_response, render_viewer_html(self.title)
                )
            if path == "/tileserver/layers":
                return self._respond_json(
                    start_response, {"layers": list(self.layers.keys())}
                )
            match = self._TILE_RE.match(path)
            if match:
                return self._serve_tile(start_response, match)
            if path.startswith("/tileserver/info/"):
                return self._serve_info(start_response, path.rsplit("/", 1)[-1])
            if path.startswith("/tileserver/tap_query/"):
                parts = path.split("/")
                return self._serve_tap_query(
                    start_response, parts[-3], float(parts[-2]), float(parts[-1])
                )
            return self._respond_error(start_response, "404 Not Found", "not found")
        except Exception as exc:  # pragma: no cover - server robustness
            logger.warning("TileServer error for %s: %s", path, exc)
            return self._respond_error(
                start_response, "500 Internal Server Error", str(exc)
            )

    def _serve_tile(self, start_response, match):
        layer = match.group("layer")
        z, x, y = (int(match.group(k)) for k in ("z", "x", "y"))
        if layer not in self.pyramids:
            return self._respond_error(start_response, "404 Not Found", "no layer")
        try:
            tile = self.pyramids[layer].get_tile(z, x, y)
        except IndexError:
            return self._respond_error(start_response, "404 Not Found", "no tile")
        if tile.shape[-1] == 4:
            bgra = cv2.cvtColor(tile, cv2.COLOR_RGBA2BGRA)
            ok, buf = cv2.imencode(".png", bgra)
            content_type = "image/png"
        else:
            ok, buf = cv2.imencode(
                ".jpg", cv2.cvtColor(tile, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 85],
            )
            content_type = "image/jpeg"
        if not ok:
            return self._respond_error(
                start_response, "500 Internal Server Error", "encode failed"
            )
        data = buf.tobytes()
        start_response(
            "200 OK",
            [("Content-Type", content_type), ("Content-Length", str(len(data)))],
        )
        return [data]

    def _serve_info(self, start_response, layer: str):
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        if layer not in self.layers:
            return self._respond_error(start_response, "404 Not Found", "no layer")
        obj = self.layers[layer]
        if isinstance(obj, WSIReader):
            info = obj.info.as_dict()
            info = {
                k: (str(v) if isinstance(v, Path) else np.asarray(v).tolist()
                    if isinstance(v, (np.ndarray, tuple, list)) else v)
                for k, v in info.items()
            }
            return self._respond_json(start_response, info)
        return self._respond_json(start_response, {"type": "annotation", "count": len(obj)})

    def _serve_tap_query(self, start_response, layer: str, x: float, y: float):
        from tiatoolbox_tpu.annotation.storage import AnnotationStore

        obj = self.layers.get(layer)
        if not isinstance(obj, AnnotationStore):
            return self._respond_error(start_response, "404 Not Found", "no store")
        hits = obj.query((x - 2, y - 2, x + 2, y + 2))
        props = [ann.properties for ann in hits.values()]
        return self._respond_json(start_response, {"annotations": props})

    # -- responses ------------------------------------------------------------------

    @staticmethod
    def _respond_json(start_response, payload: dict):
        data = json.dumps(payload).encode()
        start_response(
            "200 OK",
            [("Content-Type", "application/json"), ("Content-Length", str(len(data)))],
        )
        return [data]

    @staticmethod
    def _respond_html(start_response, html: str):
        data = html.encode()
        start_response(
            "200 OK",
            [("Content-Type", "text/html"), ("Content-Length", str(len(data)))],
        )
        return [data]

    @staticmethod
    def _respond_error(start_response, status: str, message: str):
        data = json.dumps({"error": message}).encode()
        start_response(
            status,
            [("Content-Type", "application/json"), ("Content-Length", str(len(data)))],
        )
        return [data]

    def _index_html(self) -> str:
        layer_list = "".join(
            f"<li><a href='/tileserver/info/{name}'>{name}</a></li>"
            for name in self.layers
        )
        return (
            f"<html><head><title>{self.title}</title></head><body>"
            f"<h1>{self.title}</h1><ul>{layer_list}</ul>"
            "<p>Tiles at /tileserver/layer/&lt;layer&gt;/default/zoomify/"
            "TileGroup0/z-x-y.jpg</p></body></html>"
        )

    # -- running -------------------------------------------------------------------

    def run(self, host: str = "127.0.0.1", port: int = 5000) -> None:
        """Serve forever (blocking)."""
        server = make_server(host, port, self)
        server.serve_forever()

    def run_in_thread(self, host: str = "127.0.0.1", port: int = 0):
        """Start serving on a daemon thread; returns (server, port)."""
        server = make_server(host, port, self, server_class=WSGIServer)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        return server, server.server_address[1]
