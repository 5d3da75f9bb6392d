"""Extended CLI coverage: engine commands + error paths.

Reference CLI surface: ``/root/reference/tiatoolbox/cli/__init__.py``
(14 commands). Engine commands run registry models (random-init
offline) over tiny synthetic inputs; error-path tests assert non-zero
exits with no engine work.
"""

from __future__ import annotations

import numpy as np
import pytest
from click.testing import CliRunner

from tiatoolbox_tpu.cli import tiatoolbox_cli
from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.utils.misc import imwrite


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_ext")
    slide = tmp / "s.tiff"
    make_synthetic_slide(slide, size=(512, 384), mpp=0.5, objective_power=20)
    patch = tmp / "p.png"
    imwrite(patch, synthetic_he_patch((96, 96), seed=3))
    return {"tmp": tmp, "slide": str(slide), "patch": str(patch)}


def _run(*args, expect_exit: int = 0):
    result = CliRunner().invoke(tiatoolbox_cli, list(args))
    if expect_exit == 0:
        assert result.exit_code == 0, (result.exception, result.output[-400:])
    else:
        assert result.exit_code != 0
    return result


class TestEngineCommands:
    def test_deep_feature_extractor_tile(self, cli_data) -> None:
        out_dir = cli_data["tmp"] / "feats"
        _run(
            "deep-feature-extractor",
            "--img-input", cli_data["patch"],
            "--mode", "tile",
            "--pretrained-model", "resnet18-kather100k",
            "--batch-size", "2",
            "--output-path", str(out_dir),
            "--output-type", "zarr",
        )
        assert any(out_dir.rglob("*")), "no output written"

    def test_nucleus_detector_tile(self, cli_data) -> None:
        out_dir = cli_data["tmp"] / "dets"
        _run(
            "nucleus-detector",
            "--img-input", cli_data["patch"],
            "--mode", "tile",
            "--batch-size", "1",
            "--output-path", str(out_dir),
            "--output-type", "zarr",
        )

    def test_semantic_segmentor_tile(self, cli_data) -> None:
        out_dir = cli_data["tmp"] / "seg"
        _run(
            "semantic-segmentor",
            "--img-input", cli_data["patch"],
            "--mode", "tile",
            "--batch-size", "1",
            "--output-path", str(out_dir),
            "--output-type", "zarr",
        )

    def test_nucleus_instance_segment_is_alias(self) -> None:
        """Deprecated alias command exists and shows help."""
        result = CliRunner().invoke(
            tiatoolbox_cli, ["nucleus-instance-segment", "--help"]
        )
        assert result.exit_code == 0


class TestErrorPaths:
    def test_unknown_command(self) -> None:
        _run("frobnicate", expect_exit=2)

    def test_slide_info_missing_input(self) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli, ["slide-info", "--img-input", "/nonexistent/x.svs"]
        )
        assert result.exit_code != 0

    def test_read_bounds_bad_region(self, cli_data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            [
                "read-bounds",
                "--img-input", cli_data["slide"],
                "--region", "not,a,valid",
                "--output-path", str(cli_data["tmp"] / "rb.png"),
            ],
        )
        assert result.exit_code != 0

    def test_patch_predictor_unknown_model(self, cli_data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            [
                "patch-predictor",
                "--img-input", cli_data["patch"],
                "--mode", "tile",
                "--pretrained-model", "not-a-model",
                "--output-path", str(cli_data["tmp"] / "x"),
            ],
        )
        assert result.exit_code != 0

    def test_stain_norm_bad_method(self, cli_data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            [
                "stain-norm",
                "--img-input", cli_data["patch"],
                "--method", "nonsense",
                "--output-path", str(cli_data["tmp"] / "sn"),
            ],
        )
        assert result.exit_code != 0

    def test_tissue_mask_bad_method(self, cli_data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            [
                "tissue-mask",
                "--img-input", cli_data["slide"],
                "--method", "bogus",
                "--output-path", str(cli_data["tmp"] / "tm"),
            ],
        )
        assert result.exit_code != 0

    def test_mode_choice_validated(self, cli_data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            [
                "slide-info",
                "--img-input", cli_data["slide"],
                "--mode", "nonsense",
            ],
        )
        assert result.exit_code != 0

    def test_help_for_every_command(self) -> None:
        for cmd in (
            "slide-info", "slide-thumbnail", "read-bounds", "save-tiles",
            "tissue-mask", "stain-norm", "patch-predictor",
            "semantic-segmentor", "multitask-segmentor",
            "nucleus-instance-segment", "nucleus-detector",
            "deep-feature-extractor", "show-wsi", "visualize", "version",
        ):
            result = CliRunner().invoke(tiatoolbox_cli, [cmd, "--help"])
            assert result.exit_code == 0, cmd


class TestEngineOptionParity:
    """Reference engine-command flags (device, shapes, resolutions,
    return-probabilities, yaml IO config, detector thresholds) parse
    and drive real runs."""

    @pytest.fixture(scope="class")
    def data(self, tmp_path_factory):
        from tiatoolbox_tpu.data.synth import make_synthetic_slide

        tmp = tmp_path_factory.mktemp("cliopt")
        slide = tmp / "s.tiff"
        make_synthetic_slide(slide, size=(512, 384), mpp=0.5, objective_power=20)
        return {"tmp": tmp, "slide": str(slide)}

    def test_patch_predictor_shape_and_device_flags(self, data) -> None:
        out_dir = data["tmp"] / "pp_flags"
        _run(
            "patch-predictor", "--img-input", data["slide"],
            "--output-path", str(out_dir),
            "--pretrained-model", "resnet18-kather100k",
            "--patch-input-shape", "112", "112",
            "--stride-shape", "112", "112",
            "--input-resolutions", '[{"units": "mpp", "resolution": 0.5}]',
            "--device", "cpu", "--num-workers", "0",
            "--return-probabilities", "True",
            "--batch-size", "8", "--output-type", "zarr", "--quiet",
        )
        assert any(out_dir.rglob("*.zarr"))

    def test_yaml_config_path(self, data) -> None:
        import yaml

        cfg = data["tmp"] / "io.yaml"
        cfg.write_text(yaml.dump({
            "input_resolutions": [{"units": "mpp", "resolution": 0.5}],
            "patch_input_shape": [96, 96],
            "stride_shape": [96, 96],
        }))
        out_dir = data["tmp"] / "pp_yaml"
        _run(
            "patch-predictor", "--img-input", data["slide"],
            "--output-path", str(out_dir),
            "--pretrained-model", "resnet18-kather100k",
            "--yaml-config-path", str(cfg),
            "--batch-size", "8", "--output-type", "dict", "--quiet",
        )

    def test_detector_threshold_flags_parse(self, data) -> None:
        """Detector-specific flags exist and are in the engine's
        accepted run-param set (value effects are unit-tested in
        tests/engines/test_segmentors.py::test_run_param_overrides_
        reach_detect)."""
        from tiatoolbox_tpu.models.engine.nucleus_detector import (
            NucleusDetector,
        )

        result = CliRunner().invoke(
            tiatoolbox_cli,
            ["nucleus-detector", "--help"],
        )
        assert result.exit_code == 0
        for flag in ("--min-distance", "--threshold-abs", "--threshold-rel",
                     "--postproc-tile-shape", "--memory-threshold",
                     "--auto-get-mask", "--scale-factor", "--class-dict",
                     "--output-file", "--overwrite"):
            assert flag in result.output
        for param in ("min_distance", "threshold_abs", "threshold_rel",
                      "postproc_tile_shape"):
            assert param in NucleusDetector._RUN_PARAMS

    def test_stride_shape_alone_builds_ioconfig(self, data) -> None:
        """--stride-shape without --patch-input-shape must take effect
        (it used to be silently dropped)."""
        out_dir = data["tmp"] / "pp_stride"
        _run(
            "patch-predictor", "--img-input", data["slide"],
            "--output-path", str(out_dir),
            "--pretrained-model", "resnet18-kather100k",
            "--stride-shape", "112", "112",
            "--batch-size", "8", "--output-type", "dict", "--quiet",
        )

    def test_bad_json_flag_is_a_clean_usage_error(self, data) -> None:
        result = CliRunner().invoke(
            tiatoolbox_cli,
            ["patch-predictor", "--img-input", data["slide"],
             "--input-resolutions", "{not json"],
        )
        assert result.exit_code != 0
        assert "must be valid JSON" in result.output
