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
