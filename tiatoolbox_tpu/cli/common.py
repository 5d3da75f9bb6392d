"""Shared CLI options and helpers (reference ``cli/common.py:19-913``)."""

from __future__ import annotations

from pathlib import Path

import click


class TIAToolboxCLI(click.Group):
    """Root CLI group."""

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.help = (
            "Computational pathology toolbox by TIA Centre, rebuilt TPU-native."
        )


def cli_img_input(usage_help: str = "Path to WSI or image file."):
    """Shared --img-input option."""
    return click.option("--img-input", help=usage_help, type=str)


def cli_output_path(usage_help: str = "Path to output directory.", default=None):
    """Shared --output-path option."""
    return click.option("--output-path", help=usage_help, default=default, type=str)


def cli_file_type(default: str = "*.svs, *.tiff, *.tif, *.png, *.jpg"):
    """Shared --file-type option."""
    return click.option(
        "--file-types",
        help="File types to process (comma separated).",
        default=default,
        type=str,
    )


def cli_mode(default: str = "wsi"):
    """Shared --mode option."""
    return click.option(
        "--mode",
        help="'wsi' or 'tile' processing mode.",
        default=default,
        type=click.Choice(["wsi", "tile"]),
    )


def cli_resolution(default: float = 0):
    """Shared --resolution option."""
    return click.option("--resolution", default=default, type=float)


def cli_units(default: str = "level"):
    """Shared --units option."""
    return click.option(
        "--units",
        default=default,
        type=click.Choice(["mpp", "power", "level", "baseline"]),
    )


def cli_batch_size(default: int = 16):
    """Shared --batch-size option."""
    return click.option("--batch-size", default=default, type=int)


def cli_pretrained_model(default: str = "resnet18-kather100k"):
    """Shared --pretrained-model option."""
    return click.option(
        "--pretrained-model",
        default=default,
        help="Name of a model from the pretrained registry.",
    )


def cli_pretrained_weights(default=None):
    """Shared --pretrained-weights option."""
    return click.option(
        "--pretrained-weights",
        default=default,
        help="Path to local model weights (.npz flax or .pth torch).",
    )


def cli_masks(default=None):
    """Shared --masks option."""
    return click.option("--masks", default=default, type=str)


def cli_output_type(default: str = "zarr"):
    """Shared --output-type option."""
    return click.option(
        "--output-type",
        default=default,
        type=click.Choice(["dict", "zarr", "annotationstore", "qupath"]),
    )


def cli_verbose(default: bool = True):
    """Shared --verbose option."""
    return click.option("--verbose/--quiet", default=default)


def cli_device(default: str = "cpu"):
    """Shared --device option (reference ``cli/common.py:471``)."""
    return click.option(
        "--device",
        default=default,
        help="Inference device (reference: cpu/cuda/mps; here any JAX "
        "platform string — placement is managed by JAX).",
    )


def cli_num_workers(default=None):
    """Shared --num-workers option (host loader threads; default None
    keeps the engine's own default rather than forcing a value)."""
    return click.option("--num-workers", default=default, type=int)


def cli_memory_threshold(default: int = 80):
    """Shared --memory-threshold option (RAM %% before zarr spill)."""
    return click.option("--memory-threshold", default=default, type=int)


def cli_patch_input_shape(default=None):
    """Shared --patch-input-shape option (two ints)."""
    return click.option(
        "--patch-input-shape", type=int, nargs=2, default=default
    )


def cli_stride_shape(default=None):
    """Shared --stride-shape option (two ints)."""
    return click.option("--stride-shape", type=int, nargs=2, default=default)


def cli_patch_output_shape(default=None):
    """Shared --patch-output-shape option (two ints)."""
    return click.option(
        "--patch-output-shape", type=int, nargs=2, default=default
    )


def _json_option(name: str, usage_help: str):
    import json

    def _parse(_ctx, _param, value):
        if value is None:
            return None
        try:
            return json.loads(value)
        except json.JSONDecodeError as exc:
            msg = f"{name} must be valid JSON: {exc}"
            raise click.BadParameter(msg) from exc

    return click.option(name, default=None, help=usage_help, callback=_parse)


def cli_input_resolutions():
    """--input-resolutions as a JSON list (reference ``common.py:133``).

    Example: ``--input-resolutions '[{"units": "mpp", "resolution": 0.25}]'``
    """
    return _json_option(
        "--input-resolutions", "JSON list of {units, resolution} dicts."
    )


def cli_output_resolutions():
    """--output-resolutions as a JSON list."""
    return _json_option(
        "--output-resolutions", "JSON list of {units, resolution} dicts."
    )


def cli_class_dict():
    """--class-dict as a JSON mapping (int keys where possible)."""
    import json

    def _parse(_ctx, _param, value):
        if value is None:
            return None
        try:
            raw = json.loads(value)
        except json.JSONDecodeError as exc:
            msg = f"--class-dict must be valid JSON: {exc}"
            raise click.BadParameter(msg) from exc
        out = {}
        for k, v in raw.items():
            try:
                out[int(k)] = v
            except (TypeError, ValueError):
                out[k] = v
        return out

    return click.option(
        "--class-dict",
        default=None,
        callback=_parse,
        help='Class-index → name mapping, e.g. \'{"0": "tumour"}\'.',
    )


def cli_scale_factor(default=None):
    """Shared --scale-factor option (two floats)."""
    return click.option("--scale-factor", type=float, nargs=2, default=default)


def cli_return_probabilities(*, default: bool = False):
    """Shared --return-probabilities option."""
    return click.option("--return-probabilities", type=bool, default=default)


def cli_return_predictions(*, default: bool = False):
    """Shared --return-predictions option."""
    return click.option("--return-predictions", type=bool, default=default)


def cli_auto_get_mask(*, default: bool = False):
    """Shared --auto-get-mask option."""
    return click.option("--auto-get-mask", type=bool, default=default)


def cli_overwrite(*, default: bool = True):
    """Shared --overwrite option."""
    return click.option("--overwrite", type=bool, default=default)


def cli_output_file(default=None):
    """Shared --output-file option (per-run output filename)."""
    return click.option("--output-file", type=str, default=default)


def cli_yaml_config_path(default=None):
    """Shared --yaml-config-path option (IO config from yaml)."""
    return click.option("--yaml-config-path", type=str, default=default)


def cli_min_distance(default=None):
    """Detector --min-distance peak separation."""
    return click.option("--min-distance", type=int, default=default)


def cli_threshold_abs(default=None):
    """Detector --threshold-abs peak threshold."""
    return click.option("--threshold-abs", type=float, default=default)


def cli_threshold_rel(default=None):
    """Detector --threshold-rel relative peak threshold."""
    return click.option("--threshold-rel", type=float, default=default)


def cli_postproc_tile_shape(default=None):
    """Detector --postproc-tile-shape (two ints)."""
    return click.option(
        "--postproc-tile-shape", type=int, nargs=2, default=default
    )


def load_yaml_ioconfig(yaml_config_path):
    """Build an IO config from a yaml file (reference
    ``cli/common.py`` ``prepare_ioconfig``): keys are the
    ModelIOConfigABC/IOSegmentorConfig kwargs; the class is chosen by
    the presence of segmentor-only keys."""
    import yaml

    from tiatoolbox_tpu.models.engine.io_config import (
        IOSegmentorConfig,
        ModelIOConfigABC,
    )

    with Path(yaml_config_path).open() as fh:
        data = yaml.safe_load(fh)
    seg_keys = {"patch_output_shape", "save_resolution", "margin", "tile_shape"}
    cls = IOSegmentorConfig if seg_keys & set(data) else ModelIOConfigABC
    return cls(**data)


def prepare_file_dir_cli(img_input, output_path, file_types, mode, sub_dirname):
    """Resolve input files and output directory for batch commands."""
    from tiatoolbox_tpu.utils import misc

    input_path = Path(img_input)
    if not input_path.exists():
        msg = f"Input path does not exist: {input_path}"
        raise FileNotFoundError(msg)
    files_all = (
        [input_path]
        if input_path.is_file()
        else misc.grab_files_from_dir(
            input_path, tuple(ft.strip() for ft in file_types.split(","))
        )
    )
    if output_path is None:
        output_path = input_path.parent / sub_dirname
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    del mode
    return files_all, output_path


tiatoolbox_cli = TIAToolboxCLI(name="tiatoolbox-tpu")
