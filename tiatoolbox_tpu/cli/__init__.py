"""Command line interface (reference ``tiatoolbox/cli`` — 14 commands).

Run via ``python -m tiatoolbox_tpu.cli <command>`` or the installed
``tiatoolbox-tpu`` entry point.
"""

from __future__ import annotations

import json
from pathlib import Path

import click

from tiatoolbox_tpu import __version__
from tiatoolbox_tpu.cli.common import (
    cli_auto_get_mask,
    cli_batch_size,
    cli_class_dict,
    cli_device,
    cli_file_type,
    cli_img_input,
    cli_input_resolutions,
    cli_masks,
    cli_memory_threshold,
    cli_min_distance,
    cli_mode,
    cli_num_workers,
    cli_output_file,
    cli_output_path,
    cli_output_resolutions,
    cli_output_type,
    cli_overwrite,
    cli_patch_input_shape,
    cli_patch_output_shape,
    cli_postproc_tile_shape,
    cli_pretrained_model,
    cli_pretrained_weights,
    cli_resolution,
    cli_return_predictions,
    cli_return_probabilities,
    cli_scale_factor,
    cli_stride_shape,
    cli_threshold_abs,
    cli_threshold_rel,
    cli_units,
    cli_verbose,
    cli_yaml_config_path,
    load_yaml_ioconfig,
    prepare_file_dir_cli,
    tiatoolbox_cli,
)


def engine_options(fn):
    """Reference engine-command option set (``cli/common.py`` usage in
    every engine command): IO-config overrides, run-param flags, and
    device/loader knobs. Flags an engine doesn't support are ignored
    (the reference varies its option sets per command instead)."""
    for deco in (
        cli_device(),
        cli_num_workers(),
        cli_memory_threshold(),
        cli_patch_input_shape(),
        cli_stride_shape(),
        cli_patch_output_shape(),
        cli_input_resolutions(),
        cli_output_resolutions(),
        cli_return_probabilities(),
        cli_return_predictions(),
        cli_class_dict(),
        cli_scale_factor(),
        cli_overwrite(),
        cli_output_file(),
        cli_auto_get_mask(default=True),
        cli_yaml_config_path(),
    ):
        fn = deco(fn)
    return fn


@tiatoolbox_cli.command(name="slide-info")
@cli_img_input()
@cli_output_path(default=None)
@cli_file_type()
@click.option("--mode", default="show", type=click.Choice(["show", "save"]))
@click.option("--verbose/--quiet", default=True)
def slide_info(img_input, output_path, file_types, mode, verbose) -> None:  # noqa: ARG001
    """Show or save normalized metadata of slide(s)."""
    from tiatoolbox_tpu.utils.misc import save_yaml
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, mode, "meta-data"
    )
    for file_path in files_all:
        wsi = WSIReader.open(file_path)
        info = wsi.info.as_dict()
        info = {k: (str(v) if isinstance(v, Path) else v) for k, v in info.items()}
        if mode == "show":
            click.echo(json.dumps({k: str(v) for k, v in info.items()}, indent=2))
        else:
            save_yaml(
                {k: str(v) for k, v in info.items()},
                output_path / f"{Path(file_path).stem}.yaml",
                exist_ok=True,
            )
    click.echo(f"Processed {len(files_all)} file(s).")


@tiatoolbox_cli.command(name="slide-thumbnail")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@click.option("--mode", default="save", type=click.Choice(["show", "save"]))
def slide_thumbnail(img_input, output_path, file_types, mode) -> None:
    """Save a low-resolution slide thumbnail."""
    from tiatoolbox_tpu.utils.misc import imwrite
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, mode, "slide-thumbnail"
    )
    for file_path in files_all:
        wsi = WSIReader.open(file_path)
        thumb = wsi.slide_thumbnail()
        imwrite(output_path / f"{Path(file_path).stem}_thumb.png", thumb)
    click.echo(f"Saved {len(files_all)} thumbnail(s) to {output_path}.")


@tiatoolbox_cli.command(name="read-bounds")
@cli_img_input()
@cli_output_path()
@cli_resolution()
@cli_units()
@click.option("--region", default=None, help="left,top,right,bottom", type=str)
def read_bounds(img_input, output_path, resolution, units, region) -> None:
    """Read and save a bounds region from a slide."""
    from tiatoolbox_tpu.utils.misc import imwrite
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    bounds = (
        [int(v) for v in region.split(",")] if region else [0, 0, 2000, 2000]
    )
    wsi = WSIReader.open(img_input)
    img = wsi.read_bounds(bounds, resolution=resolution, units=units)
    if output_path is None:
        output_path = Path(img_input).parent / "im_region.jpg"
    output_path = Path(output_path)
    if output_path.suffix.lower() not in (".jpg", ".jpeg", ".png", ".tiff", ".tif"):
        output_path = (
            output_path / "im_region.jpg"
            if output_path.is_dir()
            else output_path.with_suffix(".jpg")
        )
    imwrite(output_path, img)
    click.echo(f"Saved region to {output_path}.")


@tiatoolbox_cli.command(name="save-tiles")
@cli_img_input()
@cli_output_path(default="tiles")
@cli_file_type()
@click.option("--tile-objective-value", default=20, type=int)
@click.option("--tile-read-size", default=(5000, 5000), type=(int, int))
def save_tiles(img_input, output_path, file_types, tile_objective_value, tile_read_size) -> None:
    """Save slide tiles at an objective power to a directory."""
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, "save", "tiles"
    )
    for file_path in files_all:
        wsi = WSIReader.open(file_path)
        wsi.save_tiles(output_path, tile_objective_value, tile_read_size)
    click.echo(f"Tiled {len(files_all)} slide(s) to {output_path}.")


@tiatoolbox_cli.command(name="tissue-mask")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@click.option("--method", default="Otsu", type=click.Choice(["Otsu", "Morphological"]))
@cli_resolution(default=1.25)
@cli_units(default="power")
@click.option("--mode", default="save", type=click.Choice(["show", "save"]))
@click.option("--kernel-size", default=None, type=(int, int))
def tissue_mask(img_input, output_path, file_types, method, resolution, units, mode, kernel_size) -> None:
    """Generate tissue masks for slide(s)."""
    import numpy as np

    from tiatoolbox_tpu.utils.misc import imwrite
    from tiatoolbox_tpu.wsicore.wsireader import WSIReader

    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, mode, "tissue-mask"
    )
    masker_kwargs = {}
    if kernel_size:
        masker_kwargs["kernel_size"] = kernel_size
    for file_path in files_all:
        wsi = WSIReader.open(file_path)
        mask = wsi.tissue_mask(
            method=method.lower(), resolution=resolution, units=units
        )
        imwrite(
            output_path / f"{Path(file_path).stem}_mask.png",
            (mask.img.astype(np.uint8)) * 255,
        )
    click.echo(f"Masked {len(files_all)} slide(s).")


@tiatoolbox_cli.command(name="stain-norm")
@cli_img_input("Path to source image/patch.")
@click.option("--target-input", help="Path to target (reference) image.", default=None)
@cli_output_path(default="stainnorm_output")
@cli_file_type(default="*.png, *.jpg, *.tif, *.tiff")
@click.option(
    "--method",
    default="reinhard",
    type=click.Choice(["reinhard", "custom", "ruifrok", "macenko", "vahadane"]),
)
@click.option("--stain-matrix", default=None, help="Stain matrix file for custom.")
def stain_norm(img_input, target_input, output_path, file_types, method, stain_matrix) -> None:
    """Stain-normalize source image(s) to a target image."""
    from tiatoolbox_tpu.data import stain_norm_target
    from tiatoolbox_tpu.tools.stainnorm import get_normalizer
    from tiatoolbox_tpu.utils.misc import imread, imwrite

    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, "save", "stainnorm_output"
    )
    norm = get_normalizer(method, stain_matrix)
    target = imread(target_input) if target_input else stain_norm_target()
    norm.fit(target)
    for file_path in files_all:
        src = imread(file_path)
        out = norm.transform(src)
        imwrite(output_path / f"{Path(file_path).stem}_normalized.png", out)
    click.echo(f"Normalized {len(files_all)} image(s) to {output_path}.")


def _run_engine_cli(
    engine_cls,
    img_input,
    output_path,
    file_types,
    mode,
    pretrained_model,
    pretrained_weights,
    masks,
    batch_size,
    output_type,
    *,
    verbose: bool,
    **engine_kwargs,
):
    files_all, output_path = prepare_file_dir_cli(
        img_input, output_path, file_types, mode, "engine_output"
    )
    num_workers = engine_kwargs.pop("num_workers", None)
    overwrite = engine_kwargs.pop("overwrite", True)
    engine_init_kwargs = {}
    if num_workers is not None:
        engine_init_kwargs["num_loader_workers"] = num_workers
    engine = engine_cls(
        pretrained_model,
        weights=pretrained_weights,
        batch_size=batch_size,
        verbose=verbose,
        **engine_init_kwargs,
    )
    masks_list = [masks] * len(files_all) if masks else None

    # IO config precedence: yaml file > explicit resolution/shape flags
    # > registry ioconfig (converted to baseline for "tile" mode, where
    # plain images carry no mpp — reference semantic_segmentor.py)
    yaml_config_path = engine_kwargs.pop("yaml_config_path", None)
    input_resolutions = engine_kwargs.pop("input_resolutions", None)
    output_resolutions = engine_kwargs.pop("output_resolutions", None)
    patch_input_shape = engine_kwargs.pop("patch_input_shape", None) or None
    stride_shape = engine_kwargs.pop("stride_shape", None) or None
    patch_output_shape = engine_kwargs.pop("patch_output_shape", None) or None
    if yaml_config_path:
        ioconfig = load_yaml_ioconfig(yaml_config_path)
    elif (
        input_resolutions
        or patch_input_shape
        or stride_shape
        or patch_output_shape
        or output_resolutions
    ):
        from tiatoolbox_tpu.models.engine.io_config import (
            IOSegmentorConfig,
            ModelIOConfigABC,
        )

        base = engine.ioconfig
        io_kwargs = {
            "input_resolutions": input_resolutions
            or (base.input_resolutions if base else None)
            or [{"units": "baseline", "resolution": 1.0}],
            "patch_input_shape": patch_input_shape
            or (base.patch_input_shape if base else None),
            "stride_shape": stride_shape
            or (base.stride_shape if base else None),
            "output_resolutions": output_resolutions
            or (base.output_resolutions if base else []),
        }
        if patch_output_shape or (
            base is not None and getattr(base, "patch_output_shape", None)
        ):
            io_kwargs["patch_output_shape"] = patch_output_shape or tuple(
                base.patch_output_shape
            )
            ioconfig = IOSegmentorConfig(**io_kwargs)
        else:
            ioconfig = ModelIOConfigABC(**io_kwargs)
    elif mode == "tile" and engine.ioconfig is not None:
        ioconfig = engine.ioconfig.to_baseline()
    else:
        ioconfig = None

    # pass only the run params this engine understands (the reference
    # instead varies option sets per command); None values stay unset
    run_params = {
        k: v
        for k, v in engine_kwargs.items()
        if v is not None and k in engine_cls._RUN_PARAMS
    }
    out = engine.run(
        [str(f) for f in files_all],
        masks=masks_list,
        ioconfig=ioconfig,
        patch_mode=False,
        output_type=output_type,
        save_dir=output_path / "raw",
        overwrite=overwrite,
        **run_params,
    )
    click.echo(json.dumps({str(k): str(v) for k, v in out.items()}, indent=2))
    return out


@tiatoolbox_cli.command(name="patch-predictor")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model()
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="zarr")
@cli_verbose()
@engine_options
def patch_predictor(**kwargs) -> None:
    """Patch-level classification over slide(s)."""
    from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

    _run_engine_cli(PatchPredictor, **kwargs)


@tiatoolbox_cli.command(name="semantic-segmentor")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model(default="fcn-tissue_mask")
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="zarr")
@cli_verbose()
@engine_options
def semantic_segmentor(**kwargs) -> None:
    """Semantic segmentation over slide(s)."""
    from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor

    _run_engine_cli(SemanticSegmentor, **kwargs)


@tiatoolbox_cli.command(name="multitask-segmentor")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model(default="hovernet_fast-pannuke")
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="annotationstore")
@cli_verbose()
@engine_options
def multitask_segmentor(**kwargs) -> None:
    """Multi-task (instance) segmentation over slide(s)."""
    from tiatoolbox_tpu.models.engine.multi_task_segmentor import MultiTaskSegmentor

    _run_engine_cli(MultiTaskSegmentor, **kwargs)


@tiatoolbox_cli.command(name="nucleus-instance-segment")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model(default="hovernet_fast-pannuke")
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="annotationstore")
@cli_verbose()
@engine_options
def nucleus_instance_segment(**kwargs) -> None:
    """Nucleus instance segmentation (deprecated alias engine)."""
    from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
        NucleusInstanceSegmentor,
    )

    _run_engine_cli(NucleusInstanceSegmentor, **kwargs)


@tiatoolbox_cli.command(name="nucleus-detector")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model(default="mapde-conic")
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="annotationstore")
@cli_verbose()
@engine_options
@cli_min_distance()
@cli_threshold_abs()
@cli_threshold_rel()
@cli_postproc_tile_shape()
def nucleus_detector(**kwargs) -> None:
    """Nucleus detection over slide(s)."""
    from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

    _run_engine_cli(NucleusDetector, **kwargs)


@tiatoolbox_cli.command(name="deep-feature-extractor")
@cli_img_input()
@cli_output_path()
@cli_file_type()
@cli_mode()
@cli_pretrained_model(default="resnet50-kather100k")
@cli_pretrained_weights()
@cli_masks()
@cli_batch_size()
@cli_output_type(default="zarr")
@cli_verbose()
@engine_options
def deep_feature_extractor(**kwargs) -> None:
    """Deep feature extraction over slide(s)."""
    from tiatoolbox_tpu.models.engine.deep_feature_extractor import (
        DeepFeatureExtractor,
    )

    _run_engine_cli(DeepFeatureExtractor, **kwargs)


@tiatoolbox_cli.command(name="show-wsi")
@cli_img_input()
@click.option("--overlays", default=None, help="Comma-separated overlay paths.")
@click.option("--port", default=5000, type=int)
@click.option("--host", default="127.0.0.1")
def show_wsi(img_input, overlays, port, host) -> None:
    """Serve a slide (and overlays) via the tile server."""
    from tiatoolbox_tpu.visualization.tileserver import TileServer

    layers = {"slide": img_input}
    if overlays:
        for i, overlay in enumerate(overlays.split(",")):
            layers[f"overlay-{i}"] = overlay.strip()
    server = TileServer(title="tiatoolbox-tpu", layers=layers)
    click.echo(f"Serving on http://{host}:{port}")
    server.run(host=host, port=port)


@tiatoolbox_cli.command(name="visualize")
@click.option("--img-input", default=None)
@click.option("--port", default=5006, type=int)
def visualize(img_input, port) -> None:
    """Launch the visualization UI (tile server based)."""
    from tiatoolbox_tpu.visualization.tileserver import TileServer

    layers = {"slide": img_input} if img_input else {}
    server = TileServer(title="tiatoolbox-tpu", layers=layers)
    click.echo(f"Serving on http://127.0.0.1:{port}")
    server.run(host="127.0.0.1", port=port)


@tiatoolbox_cli.command(name="version")
def version() -> None:
    """Show version."""
    click.echo(f"tiatoolbox-tpu {__version__}")


def main() -> None:
    """CLI entry point."""
    tiatoolbox_cli()


if __name__ == "__main__":
    main()
