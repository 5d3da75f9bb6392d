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
