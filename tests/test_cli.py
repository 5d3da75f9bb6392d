"""CLI command smoke tests (CliRunner over the real command surface)."""

from __future__ import annotations

import numpy as np
import pytest
from click.testing import CliRunner

from tiatoolbox_tpu.cli import tiatoolbox_cli
from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.utils.misc import imwrite


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    slide = tmp / "s.tiff"
    make_synthetic_slide(slide, size=(512, 384), mpp=0.5, objective_power=20)
    patch = tmp / "p.png"
    imwrite(patch, synthetic_he_patch((256, 256), seed=3))
    return {"tmp": tmp, "slide": str(slide), "patch": str(patch)}


def _run(*args):
    result = CliRunner().invoke(tiatoolbox_cli, list(args))
    assert result.exit_code == 0, (result.exception, result.output[-300:])
    return result


class TestBasicCommands:
    def test_version(self) -> None:
        _run("version")

    def test_slide_info(self, cli_data) -> None:
        out = _run("slide-info", "--img-input", cli_data["slide"], "--mode", "show")
        assert "slide_dimensions" in out.output

    def test_slide_thumbnail(self, cli_data) -> None:
        _run("slide-thumbnail", "--img-input", cli_data["slide"],
             "--output-path", str(cli_data["tmp"] / "thumbs"))

    def test_read_bounds_extensionless_output(self, cli_data) -> None:
        out_base = cli_data["tmp"] / "region_noext"
        _run("read-bounds", "--img-input", cli_data["slide"],
             "--region", "0,0,128,128", "--output-path", str(out_base))
        assert out_base.with_suffix(".jpg").exists()

    def test_stain_norm(self, cli_data) -> None:
        _run("stain-norm", "--img-input", cli_data["patch"],
             "--output-path", str(cli_data["tmp"] / "sn"), "--method", "macenko")

    def test_tissue_mask(self, cli_data) -> None:
        _run("tissue-mask", "--img-input", cli_data["slide"],
             "--output-path", str(cli_data["tmp"] / "tm"),
             "--method", "Otsu", "--mode", "save")

    def test_save_tiles(self, cli_data) -> None:
        _run("save-tiles", "--img-input", cli_data["slide"],
             "--output-path", str(cli_data["tmp"] / "tiles"),
             "--tile-objective-value", "10")


class TestEngineCommands:
    def test_patch_predictor_tile_mode(self, cli_data) -> None:
        """Plain images grid-process with a baseline-converted ioconfig."""
        out = _run("patch-predictor", "--img-input", cli_data["patch"],
                   "--output-path", str(cli_data["tmp"] / "ppt"),
                   "--pretrained-model", "resnet18-kather100k",
                   "--mode", "tile", "--batch-size", "4",
                   "--output-type", "dict", "--quiet")
        assert "p.png" in out.output

    def test_patch_predictor_wsi_zarr(self, cli_data) -> None:
        _run("patch-predictor", "--img-input", cli_data["slide"],
             "--output-path", str(cli_data["tmp"] / "ppw"),
             "--pretrained-model", "resnet18-kather100k",
             "--mode", "wsi", "--batch-size", "8",
             "--output-type", "zarr", "--quiet")
