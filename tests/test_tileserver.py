"""Tests for pyramid generators, renderer, tile server, and CLI."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore
from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.tools.pyramid import TilePyramidGenerator, ZoomifyGenerator
from tiatoolbox_tpu.visualization.tileserver import TileServer
from tiatoolbox_tpu.wsicore.wsireader import WSIReader


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("ts") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return path


class TestPyramid:
    def test_level_count_and_dims(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        gen = TilePyramidGenerator(wsi, tile_size=256)
        assert gen.level_count == 3  # 1024/256=4 tiles → log2(4)+1
        assert gen.level_dimensions(gen.level_count - 1) == (1024, 768)

    def test_get_tile(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        gen = TilePyramidGenerator(wsi, tile_size=256)
        tile = gen.get_tile(gen.level_count - 1, 0, 0)
        assert tile.shape == (256, 256, 3)
        with pytest.raises(IndexError):
            gen.get_tile(99, 0, 0)
        with pytest.raises(IndexError):
            gen.get_tile(0, 99, 99)

    def test_zoomify_paths(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        gen = ZoomifyGenerator(wsi, tile_size=256)
        path = gen.tile_path(0, 0, 0)
        assert str(path).startswith("TileGroup0")

    def test_dump_dir(self, slide_path, tmp_path) -> None:
        wsi = WSIReader.open(slide_path)
        gen = TilePyramidGenerator(wsi, tile_size=256)
        gen.dump(tmp_path / "tiles")
        assert (tmp_path / "tiles" / "0" / "0_0.jpg").exists()


class TestRenderer:
    def test_render_tile(self) -> None:
        from tiatoolbox_tpu.utils.visualization import AnnotationRenderer

        store = SQLiteStore()
        store.append_many(
            [
                Annotation(Polygon.from_bounds(10, 10, 100, 100), {"type": "a"}),
                Annotation(Point(150, 150).buffer(20), {"type": "b"}),
            ]
        )
        renderer = AnnotationRenderer()
        tile = renderer.render_annotations(store, (0, 0, 256, 256), output_size=256)
        assert tile.shape == (256, 256, 4)
        assert tile[:, :, 3].max() > 0  # something drawn

    def test_overlay_helpers(self) -> None:
        from tiatoolbox_tpu.utils.visualization import (
            overlay_prediction_mask,
            overlay_probability_map,
        )

        img = np.full((32, 32, 3), 200, np.uint8)
        pred = np.zeros((32, 32), np.uint8)
        pred[8:16, 8:16] = 1
        out = overlay_prediction_mask(img, pred)
        assert out.shape == img.shape
        probs = np.zeros((32, 32), np.float32)
        probs[:16] = 0.9
        out2 = overlay_probability_map(img, probs)
        assert out2.shape == img.shape
        with pytest.raises(ValueError, match="within"):
            overlay_probability_map(img, probs * 3)


class TestTileServer:
    @pytest.fixture(scope="class")
    def server_port(self, slide_path):
        store = SQLiteStore()
        store.append(
            Annotation(Polygon.from_bounds(100, 100, 400, 400), {"type": "tumour"})
        )
        server = TileServer(layers={"slide": str(slide_path)})
        server.add_layer("overlay", store)
        httpd, port = server.run_in_thread()
        yield port
        httpd.shutdown()

    def _get(self, port, path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()

    def test_layers_endpoint(self, server_port) -> None:
        status, ctype, body = self._get(server_port, "/tileserver/layers")
        assert status == 200
        assert json.loads(body)["layers"] == ["slide", "overlay"]

    def test_tile_endpoint(self, server_port) -> None:
        status, ctype, body = self._get(
            server_port,
            "/tileserver/layer/slide/default/zoomify/TileGroup0/0-0-0.jpg",
        )
        assert status == 200
        assert ctype == "image/jpeg"
        assert body[:2] == b"\xff\xd8"

    def test_annotation_tile(self, server_port) -> None:
        status, ctype, body = self._get(
            server_port,
            "/tileserver/layer/overlay/default/zoomify/TileGroup0/0-0-0.jpg",
        )
        assert status == 200
        assert ctype == "image/png"

    def test_info_endpoint(self, server_port) -> None:
        status, _, body = self._get(server_port, "/tileserver/info/slide")
        info = json.loads(body)
        assert info["slide_dimensions"] == [1024, 768]

    def test_tap_query(self, server_port) -> None:
        status, _, body = self._get(
            server_port, "/tileserver/tap_query/overlay/200/200"
        )
        hits = json.loads(body)["annotations"]
        assert hits[0]["type"] == "tumour"

    def test_missing_tile_404(self, server_port) -> None:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            self._get(
                server_port,
                "/tileserver/layer/slide/default/zoomify/TileGroup0/9-9-9.jpg",
            )
        assert err.value.code == 404


class TestCLI:
    def test_cli_commands_exist(self) -> None:
        from click.testing import CliRunner

        from tiatoolbox_tpu.cli import tiatoolbox_cli

        runner = CliRunner()
        result = runner.invoke(tiatoolbox_cli, ["--help"])
        assert result.exit_code == 0
        for cmd in (
            "slide-info",
            "slide-thumbnail",
            "read-bounds",
            "save-tiles",
            "tissue-mask",
            "stain-norm",
            "patch-predictor",
            "semantic-segmentor",
            "multitask-segmentor",
            "nucleus-instance-segment",
            "nucleus-detector",
            "deep-feature-extractor",
            "show-wsi",
            "visualize",
        ):
            assert cmd in result.output

    def test_slide_info_cli(self, slide_path) -> None:
        from click.testing import CliRunner

        from tiatoolbox_tpu.cli import tiatoolbox_cli

        runner = CliRunner()
        result = runner.invoke(
            tiatoolbox_cli,
            ["slide-info", "--img-input", str(slide_path), "--mode", "show"],
        )
        assert result.exit_code == 0, result.output
        assert "slide_dimensions" in result.output

    def test_stain_norm_cli(self, tmp_path) -> None:
        from click.testing import CliRunner

        from tiatoolbox_tpu.cli import tiatoolbox_cli
        from tiatoolbox_tpu.data.synth import synthetic_he_patch
        from tiatoolbox_tpu.utils.misc import imwrite

        src = tmp_path / "src.png"
        imwrite(src, synthetic_he_patch((128, 128), seed=5))
        runner = CliRunner()
        result = runner.invoke(
            tiatoolbox_cli,
            [
                "stain-norm",
                "--img-input",
                str(src),
                "--output-path",
                str(tmp_path / "out"),
                "--method",
                "macenko",
            ],
        )
        assert result.exit_code == 0, result.output
        assert (tmp_path / "out" / "src_normalized.png").exists()

    def test_thumbnail_cli(self, slide_path, tmp_path) -> None:
        from click.testing import CliRunner

        from tiatoolbox_tpu.cli import tiatoolbox_cli

        runner = CliRunner()
        result = runner.invoke(
            tiatoolbox_cli,
            [
                "slide-thumbnail",
                "--img-input",
                str(slide_path),
                "--output-path",
                str(tmp_path / "thumbs"),
            ],
        )
        assert result.exit_code == 0, result.output
        assert (tmp_path / "thumbs" / "s_thumb.png").exists()


class TestControlAPI:
    """Session-scoped control routes (reference tileserver API)."""

    @pytest.fixture(scope="class")
    def api(self, slide_path, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ctl")
        store_path = tmp / "anns.db"
        store = SQLiteStore(store_path)
        store.append_many(
            [
                Annotation(
                    Polygon.from_bounds(10, 10, 50, 50),
                    {"type": "tumour", "prob": 0.9},
                ),
                Annotation(
                    Polygon.from_bounds(60, 60, 90, 90),
                    {"type": "stroma", "prob": 0.4},
                ),
            ]
        )
        store.commit()
        store.close()
        server = TileServer(layers={"slide": str(slide_path)})
        httpd, port = server.run_in_thread()
        yield {"port": port, "store_path": store_path, "slide": slide_path,
               "server": server, "tmp": tmp}
        httpd.shutdown()

    @staticmethod
    def _call(port, path, method="GET", **params):
        import urllib.parse

        data = urllib.parse.urlencode(params).encode() if params else None
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data, method=method
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())

    def test_session_lifecycle(self, api) -> None:
        status, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        assert status == 200
        sid = out["session_id"]
        assert sid in api["server"].sessions
        status, out = self._call(
            api["port"], f"/tileserver/reset/{sid}", "PUT"
        )
        assert out["reset"] == sid
        assert sid not in api["server"].sessions

    def test_change_slide_and_overlay(self, api) -> None:
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        _, out = self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(api["slide"]),
        )
        assert out["slide"] == str(api["slide"])
        _, out = self._call(
            api["port"], "/tileserver/slide", "GET", session_id=sid
        )
        assert out["slide"] == str(api["slide"])
        # load annotations; returns the types present
        _, out = self._call(
            api["port"], "/tileserver/annotations", "PUT",
            session_id=sid, file_path=str(api["store_path"]),
        )
        assert out["types"] == ["stroma", "tumour"]
        # session tile for the overlay renders
        with urllib.request.urlopen(
            f"http://127.0.0.1:{api['port']}/tileserver/layer/overlay/{sid}"
            "/zoomify/TileGroup0/0-0-0.jpg"
        ) as resp:
            assert resp.status == 200
        # introspection
        _, out = self._call(
            api["port"], "/tileserver/prop_names/all", session_id=sid
        )
        assert out["prop_names"] == ["prob", "type"]
        _, out = self._call(
            api["port"], "/tileserver/prop_values/type/all", session_id=sid
        )
        assert out["prop_values"] == ["stroma", "tumour"]
        _, out = self._call(
            api["port"], "/tileserver/prop_range", "PUT",
            session_id=sid, prop="prob",
        )
        assert out["range"] == [0.4, 0.9]
        # renderer updates
        _, out = self._call(
            api["port"], "/tileserver/color_prop", "PUT",
            session_id=sid, prop="prob",
        )
        assert out["color_prop"] == "prob"
        _, out = self._call(
            api["port"], "/tileserver/renderer/edge_thickness", "PUT",
            session_id=sid, val="3",
        )
        assert out["edge_thickness"] == 3
        _, out = self._call(
            api["port"], "/tileserver/renderer/edge_thickness", "GET",
            session_id=sid,
        )
        assert out["edge_thickness"] == 3
        _, out = self._call(
            api["port"], "/tileserver/cmap", "PUT",
            session_id=sid, cmap='{"tumour": [255, 0, 0, 255]}',
        )
        assert out["cmap"].startswith("{")
        # commit to a new path
        save_path = api["tmp"] / "edited.db"
        _, out = self._call(
            api["port"], "/tileserver/commit", "POST",
            session_id=sid, save_path=str(save_path),
        )
        assert out["committed"] and save_path.exists()
        # clear overlays keeps the slide
        _, out = self._call(
            api["port"], "/tileserver/clear_overlays", "PUT", session_id=sid
        )
        assert out["removed"] == ["overlay"]
        _, out = self._call(
            api["port"], "/tileserver/slide", "GET", session_id=sid
        )
        assert out["slide"] == str(api["slide"])

    def test_unknown_control_route(self, api) -> None:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            self._call(api["port"], "/tileserver/nonsense", "PUT")
        assert err.value.code == 404

    def test_channels_on_rgb_slide(self, api) -> None:
        # RGB slides have no multichannel post_proc: channels is None
        _, out = self._call(api["port"], "/tileserver/channels", "GET")
        assert out["channels"] is None

    def test_channels_and_enhance_multichannel(self, api) -> None:
        import cv2

        from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter

        chan = "".join(
            f'<Channel ID="Channel:{i}" Name="C{i}" Color="{c}"/>'
            for i, c in enumerate(
                [0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF]
            )
        )
        ome = (
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
            f"<Image><Pixels>{chan}</Pixels></Image></OME>"
        )
        img = np.random.default_rng(0).integers(0, 100, (64, 64, 5)).astype(np.uint8)
        path = api["tmp"] / "multi.ome.tiff"
        TiffPyramidWriter(
            path, tile_size=32, description=ome, compression="deflate"
        ).write([img])
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(path),
        )
        _, out = self._call(
            api["port"], "/tileserver/channels", "GET", session_id=sid
        )
        assert out["names"] == [f"C{i}" for i in range(5)]
        _, out = self._call(
            api["port"], "/tileserver/channels", "PUT",
            session_id=sid, channels="[0, 2]",
        )
        assert out["channels"] == [0, 2]
        _, out = self._call(
            api["port"], "/tileserver/enhance", "PUT",
            session_id=sid, val="1.5",
        )
        assert out["enhance"] == 1.5
        # tiles still render after channel selection
        with urllib.request.urlopen(
            f"http://127.0.0.1:{api['port']}/tileserver/layer/slide/{sid}"
            "/zoomify/TileGroup0/0-0-0.jpg"
        ) as resp:
            assert resp.status == 200

    def test_healthcheck_and_sessions(self, api) -> None:
        status, out = self._call(api["port"], "/tileserver/healthcheck", "GET")
        assert status == 200
        assert out["status"] == "OK"
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(api["slide"]),
        )
        _, out = self._call(api["port"], "/tileserver/sessions", "GET")
        assert out["sessions"][sid] == str(api["slide"])

    def test_secondary_cmap_roundtrip(self, api) -> None:
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        _, out = self._call(
            api["port"], "/tileserver/secondary_cmap", "GET", session_id=sid
        )
        assert out["secondary_cmap"] is None
        _, out = self._call(
            api["port"], "/tileserver/secondary_cmap", "PUT",
            session_id=sid, type_id='"tumour"', prop="prob", cmap="viridis",
        )
        assert out["secondary_cmap"] == "done"
        _, out = self._call(
            api["port"], "/tileserver/secondary_cmap", "GET", session_id=sid
        )
        assert out["secondary_cmap"] == {
            "type": "tumour", "score_prop": "prob", "cmap": "viridis",
        }
        renderer = api["server"].sessions[sid]["renderer"]
        # tumour annotations now color via viridis(prob); stroma keeps primary
        tumour = renderer.get_color({"type": "tumour", "prob": 1.0})
        import matplotlib

        expected = tuple(int(255 * c) for c in matplotlib.colormaps["viridis"](1.0))
        assert tumour == expected
        stroma = renderer.get_color({"type": "stroma", "prob": 1.0})
        assert stroma != expected

    def test_registration_overlay_npy_affine(self, api, tmp_path) -> None:
        """A .npy affine overlay re-reads the slide through the transform.

        Mirrors reference ``tileserver.py:512-592`` (.npy/.mha overlay →
        TransformedWSIReader on the session's slide layer).
        """
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        affine = np.array([[1.0, 0.0, 64.0], [0.0, 1.0, 32.0], [0.0, 0.0, 1.0]])
        tf_path = tmp_path / "reg.npy"
        np.save(tf_path, affine)
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(api["slide"]),
        )
        _, out = self._call(
            api["port"], "/tileserver/overlay", "PUT",
            session_id=sid, overlay_path=str(tf_path),
        )
        assert out["layer"] == "slide"
        server_reader = api["server"].sessions[sid]["layers"]["slide"]
        assert isinstance(server_reader, TransformedWSIReader)
        expected = TransformedWSIReader(
            WSIReader.open(api["slide"]), affine
        ).read_rect((100, 100), (64, 64), resolution=0, units="level")
        got = server_reader.read_rect(
            (100, 100), (64, 64), resolution=0, units="level"
        )
        np.testing.assert_array_equal(got, expected)

    def test_registration_overlay_replaces_previous_transform(
        self, api, tmp_path
    ) -> None:
        """A second transform upload REPLACES the first (no composition).

        The reference rebuilds from the original slide path each time
        (``tileserver.py:544-592``); composing transforms would silently
        double-shift when a user refines a registration.
        """
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        affine = np.array([[1.0, 0.0, 64.0], [0.0, 1.0, 32.0], [0.0, 0.0, 1.0]])
        tf_path = tmp_path / "reg.npy"
        np.save(tf_path, affine)
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(api["slide"]),
        )
        for _ in range(2):  # upload the SAME transform twice
            _, out = self._call(
                api["port"], "/tileserver/overlay", "PUT",
                session_id=sid, overlay_path=str(tf_path),
            )
            assert out["layer"] == "slide"
        server_reader = api["server"].sessions[sid]["layers"]["slide"]
        assert isinstance(server_reader, TransformedWSIReader)
        # the wrapped reader is the BASE slide, not another transform
        assert not isinstance(server_reader.reader, TransformedWSIReader)
        expected = TransformedWSIReader(
            WSIReader.open(api["slide"]), affine
        ).read_rect((100, 100), (64, 64), resolution=0, units="level")
        got = server_reader.read_rect(
            (100, 100), (64, 64), resolution=0, units="level"
        )
        np.testing.assert_array_equal(got, expected)

    def test_registration_overlay_mha_field(self, api, tmp_path) -> None:
        """A SimpleITK-style .mha displacement field loads as an overlay."""
        from tiatoolbox_tpu.utils.metaimage import write_mha
        from tiatoolbox_tpu.wsicore.store_reader import TransformedWSIReader

        field = np.zeros((96, 128, 2), dtype=np.float64)  # identity warp
        tf_path = write_mha(tmp_path / "field.mha", field, compressed=True)
        _, out = self._call(api["port"], "/tileserver/session_id", "PUT")
        sid = out["session_id"]
        self._call(
            api["port"], "/tileserver/slide", "PUT",
            session_id=sid, slide_path=str(api["slide"]),
        )
        _, out = self._call(
            api["port"], "/tileserver/overlay", "PUT",
            session_id=sid, overlay_path=str(tf_path),
        )
        assert out["layer"] == "slide"
        assert isinstance(
            api["server"].sessions[sid]["layers"]["slide"], TransformedWSIReader
        )

    def test_shutdown_stops_server(self, slide_path) -> None:
        import time as _time
        import urllib.error

        server = TileServer(layers={"slide": str(slide_path)})
        httpd, port = server.run_in_thread()
        status, out = self._call(port, "/tileserver/shutdown", "POST")
        assert status == 200
        assert out["servers"] == 1
        deadline = _time.time() + 5
        while _time.time() < deadline:
            try:
                self._call(port, "/tileserver/healthcheck", "GET")
                _time.sleep(0.05)
            except (urllib.error.URLError, ConnectionError, OSError):
                break
        else:  # pragma: no cover - diagnostics
            pytest.fail("server still answering after shutdown")
        httpd.server_close()
