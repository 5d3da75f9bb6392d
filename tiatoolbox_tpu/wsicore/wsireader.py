"""Whole-slide image readers.

Rebuild of the reference reader stack (``wsicore/wsireader.py``) on
this project's own native TIFF/zarr backends:

- ``WSIReader``: resolution algebra + generic ``read_rect`` /
  ``read_bounds`` implemented once as template methods over an abstract
  in-bounds level read (the reference re-implements the read logic per
  reader; here concrete readers only provide ``_read_level_within``).
- ``VirtualWSIReader``: ndarray/PNG/JPG-as-WSI with virtual scaling
  (reference ``wsireader.py:3121-3694``).
- ``TIFFWSIReader``: tiled pyramidal TIFF/SVS via ``tiffio.TiffFile``
  (reference ``wsireader.py:3745-5190``, minus tifffile).
- ``NGFFWSIReader``: OME-NGFF v0.4 zarr via ``zarrlite``
  (reference ``wsireader.py:5725-6267``).
- ``JP2WSIReader``: JPEG-2000 via OpenCV full-image decode
  (reference ``wsireader.py:2516-3120`` uses glymur streaming).

All readers are host-plane; they emit fixed-shape uint8 tiles consumed
by the device pipeline.
"""

from __future__ import annotations

import re
from pathlib import Path

import cv2
import numpy as np

from tiatoolbox_tpu import logger, utils
from tiatoolbox_tpu.utils import magic
from tiatoolbox_tpu.utils.exceptions import FileNotSupportedError
from tiatoolbox_tpu.utils.image import (
    find_overlap,
    find_padding,
    sub_pixel_read,
)
from tiatoolbox_tpu.utils.transforms import (
    background_composite,
    bounds2locsize,
    imresize,
    locsize2bounds,
)
from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta

MIN_NGFF_VERSION = (0, 4)


class WSIReader:
    """Base whole-slide image reader.

    Args:
        input_img: Path to the slide or an ndarray.
        mpp: Override microns-per-pixel metadata (x, y).
        power: Override objective power metadata.
    """

    @staticmethod
    def open(
        input_img,
        mpp=None,
        power=None,
        post_proc="auto",
        **kwargs,
    ) -> "WSIReader":
        """Sniff the input and return an appropriate reader instance.

        Mirrors reference dispatch (``wsireader.py:343-419``): ndarray →
        Virtual; suffix/magic → TIFF / JP2 / NGFF / Virtual readers.
        ``post_proc`` ("auto" | callable | name in ``postproc_defs`` |
        None) post-processes read regions; "auto" applies
        ``MultichannelToRGB`` on TIFF/Virtual readers (reference
        ``wsireader.py:699-724``).
        """
        if isinstance(input_img, np.ndarray):
            return VirtualWSIReader(
                input_img, mpp=mpp, power=power, post_proc=post_proc, **kwargs
            )
        if isinstance(input_img, WSIReader):
            return input_img

        path = Path(input_img)
        if not path.exists():
            msg = f"File does not exist: {path}"
            raise FileNotFoundError(msg)

        if path.is_dir():
            if magic.is_ngff(path):
                return NGFFWSIReader(path, mpp=mpp, power=power)
            if magic.is_zarr(path):
                return ZarrWSIReader(path, mpp=mpp, power=power)
            msg = f"Directory is not a zarr/NGFF store: {path}"
            raise FileNotSupportedError(msg)

        suffixes = [s.lower() for s in path.suffixes]
        last = suffixes[-1] if suffixes else ""
        if last == ".npy":
            return VirtualWSIReader(np.load(str(path)), mpp=mpp, power=power, **kwargs)
        if last == ".mrxs":
            return MIRAXWSIReader(path, mpp=mpp, power=power)
        if magic.is_dcm(path) or last == ".dcm":
            return DICOMWSIReader(path, mpp=mpp, power=power)
        if magic.is_tiff(path):
            return TIFFWSIReader(path, mpp=mpp, power=power, post_proc=post_proc)
        if magic.is_jp2(path) or last == ".jp2":
            return JP2WSIReader(path, mpp=mpp, power=power)
        if magic.is_sqlite3(path) or last == ".db":
            from tiatoolbox_tpu.wsicore.store_reader import AnnotationStoreReader

            return AnnotationStoreReader(path, mpp=mpp, power=power, **kwargs)
        if last in (".png", ".jpg", ".jpeg", ".webp", ".bmp"):
            return VirtualWSIReader(path, mpp=mpp, power=power, **kwargs)
        msg = f"File {path} is not a supported file format."
        raise FileNotSupportedError(msg)

    def __init__(self, input_img, mpp=None, power=None, post_proc="auto") -> None:
        if isinstance(input_img, (str, Path)):
            self.input_path: Path | None = Path(input_img)
        else:
            self.input_path = None
        self._m_info: WSIMeta | None = None
        self._manual_mpp = tuple(np.broadcast_to(mpp, 2).astype(float)) if mpp else None
        self._manual_power = float(power) if power else None
        self.post_proc = self.get_post_proc(post_proc)

    def get_post_proc(self, post_proc):
        """Resolve the post-processing callable (reference :699-724).

        "auto" → ``MultichannelToRGB`` for TIFF/Virtual readers, None
        otherwise; a string is looked up in ``utils.postproc_defs``.
        """
        from tiatoolbox_tpu.utils import postproc_defs

        if callable(post_proc):
            return post_proc
        if post_proc is None:
            return None
        if post_proc == "auto":
            if isinstance(self, (TIFFWSIReader, VirtualWSIReader)):
                return postproc_defs.MultichannelToRGB()
            return None
        if isinstance(post_proc, str) and hasattr(postproc_defs, post_proc):
            return getattr(postproc_defs, post_proc)()
        msg = f"Invalid post_proc: {post_proc}"
        raise ValueError(msg)

    # -- metadata --------------------------------------------------------------

    @property
    def info(self) -> WSIMeta:
        """Cached slide metadata, with manual mpp/power overrides applied."""
        if self._m_info is None:
            self._m_info = self._info()
            if self._manual_mpp:
                self._m_info.mpp = np.array(self._manual_mpp)
            if self._manual_power:
                self._m_info.objective_power = self._manual_power
        return self._m_info

    @info.setter
    def info(self, meta: WSIMeta) -> None:
        self._m_info = meta
        self._optlevel_cache = {}  # level search depends on the metadata

    def _info(self) -> WSIMeta:
        raise NotImplementedError

    # -- resolution algebra (contract identical to the reference) ---------------

    def _find_optimal_level_and_downsample(
        self, resolution, units, precision: int = 3
    ) -> tuple[int, np.ndarray]:
        """Most-downscaled level that is still >= the target resolution.

        Returns (level, post-read scale factor); reference
        ``wsireader.py:744-802``. Memoized per (resolution, units): grid
        readers (WSIPatchDataset) call this for every patch with
        identical arguments, and the level search dominated the warm
        read path before caching.
        """
        try:
            key = (
                tuple(np.atleast_1d(np.asarray(resolution, dtype=float))),
                units,
                precision,
            )
        except (TypeError, ValueError):
            key = None
        if key is not None:
            cache = getattr(self, "_optlevel_cache", None)
            if cache is None:
                cache = self._optlevel_cache = {}
            hit = cache.get(key)
            if hit is not None:
                return hit[0], hit[1].copy()
        level_scales = self.info.relative_level_scales(resolution, units)
        sufficient = [
            bool(np.all(np.round(x, decimals=precision) <= 1)) for x in level_scales
        ]
        if not any(sufficient):
            level = 0
        else:
            level = (len(level_scales) - 1) - int(np.argmax(sufficient[::-1]))
        scale = level_scales[level]
        if np.any(np.array(scale) > 1):
            logger.warning(
                "Read: Scale > 1. This means that the desired resolution is "
                "higher than the WSI baseline (maximum encoded resolution). "
                "Interpolation of read regions may occur.",
            )
        if key is not None:
            self._optlevel_cache[key] = (level, np.array(scale))
        return level, scale

    def find_read_rect_params(
        self, location, size, resolution, units, precision: int = 3
    ) -> tuple:
        """Optimal read level + coordinates for a read_rect call."""
        read_level, post_read_scale = self._find_optimal_level_and_downsample(
            resolution, units, precision
        )
        level_downsample = self.info.level_downsamples[read_level]
        baseline_read_size = np.round(
            np.array(size) * level_downsample / post_read_scale
        ).astype(int)
        level_read_size = np.round(np.array(size) / post_read_scale).astype(int)
        level_location = np.round(np.array(location) / level_downsample).astype(int)
        return (
            read_level,
            level_location,
            level_read_size,
            post_read_scale,
            baseline_read_size,
        )

    def _find_read_params_at_resolution(
        self, location, size, resolution, units
    ) -> tuple:
        """Read params when location/size are in the requested-resolution frame."""
        read_level, read_level_to_resolution = self._find_optimal_level_and_downsample(
            resolution, units
        )
        baseline_to_read_level = 1 / self.info.level_downsamples[read_level]
        baseline_to_resolution = baseline_to_read_level * read_level_to_resolution
        requested_location = np.array(location)
        requested_size = np.array(size)
        size_at_baseline = requested_size / baseline_to_resolution
        location_at_baseline = (
            requested_location.astype(np.float32) / baseline_to_resolution
        )
        size_at_read_level = requested_size / read_level_to_resolution
        location_at_read_level = (
            requested_location.astype(np.float32) / read_level_to_resolution
        )
        output = tuple(
            np.ceil(v).astype(np.int64)
            for v in (
                size_at_read_level,
                location_at_read_level,
                size_at_baseline,
                location_at_baseline,
            )
        )
        return (read_level, read_level_to_resolution, *output)

    def bounds_at_resolution_to_baseline(self, bounds, resolution, units):
        """Convert bounds given at requested resolution to baseline frame."""
        bounds = np.array(bounds)
        tl, br = bounds[:2], bounds[2:]
        size = br - tl
        (_, _, _, _, size_at_baseline, location_at_baseline) = (
            self._find_read_params_at_resolution(tl, size, resolution, units)
        )
        return np.concatenate(
            [location_at_baseline, location_at_baseline + size_at_baseline]
        )

    def slide_dimensions(self, resolution, units, precision: int = 3) -> tuple:
        """Slide (width, height) at the requested resolution."""
        baseline = self.info.slide_dimensions
        _, _, shape_at_resolution, _ = self.find_read_bounds_params(
            [0, 0, *list(baseline)], resolution, units, precision
        )
        return tuple(shape_at_resolution)

    def find_read_bounds_params(
        self, bounds, resolution, units, precision: int = 3
    ) -> tuple:
        """Optimal read level + level bounds + output size for read_bounds."""
        start_x, start_y, end_x, end_y = bounds
        read_level, post_read_scale = self._find_optimal_level_and_downsample(
            resolution, units, precision
        )
        level_downsample = self.info.level_downsamples[read_level]
        location = np.array([start_x, start_y])
        size = np.array([end_x - start_x, end_y - start_y])
        level_size = np.round(size / level_downsample).astype(int)
        level_location = np.round(location / level_downsample).astype(int)
        level_bounds = (*level_location, *(level_location + level_size))
        output_size = np.round(level_size * post_read_scale).astype(int)
        return (read_level, level_bounds, output_size, post_read_scale)

    @staticmethod
    def _check_unit_conversion_integrity(
        input_unit, output_unit, baseline_mpp, baseline_power
    ) -> None:
        if input_unit not in {"mpp", "power", "level", "baseline"}:
            msg = (
                "Invalid input_unit: argument accepts only one of the following "
                "options: `'mpp'`, `'power'`, `'level'`, `'baseline'`."
            )
            raise ValueError(msg)
        if output_unit not in {"mpp", "power", "baseline", None}:
            msg = (
                "Invalid output_unit: argument accepts only one of the following "
                "options: `'mpp'`, `'power'`, `'baseline'`, or None (to return "
                "all units)."
            )
            raise ValueError(msg)
        if baseline_mpp is None and input_unit == "mpp":
            msg = (
                "Missing 'mpp': `input_unit` has been set to 'mpp' while there "
                "is no information about 'mpp' in WSI meta data."
            )
            raise ValueError(msg)
        if baseline_power is None and input_unit == "power":
            msg = (
                "Missing 'objective_power': `input_unit` has been set to 'power' "
                "while there is no information about 'objective_power' in WSI "
                "meta data."
            )
            raise ValueError(msg)

    def convert_resolution_units(self, input_res, input_unit, output_unit=None):
        """Convert a resolution between mpp/power/baseline unit systems."""
        baseline_mpp = self.info.mpp
        baseline_power = self.info.objective_power
        self._check_unit_conversion_integrity(
            input_unit, output_unit, baseline_mpp, baseline_power
        )
        out: dict = {"mpp": None, "power": None, "baseline": None}
        if input_unit == "mpp":
            if isinstance(input_res, (list, tuple, np.ndarray)):
                out["mpp"] = np.array(input_res)
            else:
                out["mpp"] = np.array([input_res, input_res])
            out["baseline"] = baseline_mpp[0] / out["mpp"][0]
            if baseline_power is not None:
                out["power"] = out["baseline"] * baseline_power
        elif input_unit == "power":
            out["baseline"] = input_res / baseline_power
            out["power"] = input_res
        elif input_unit == "level":
            scales = self.info.relative_level_scales(input_res, input_unit)
            out["baseline"] = scales[0]
            if baseline_power is not None:
                out["power"] = out["baseline"] * baseline_power
        else:  # baseline
            out["baseline"] = input_res
            if baseline_power is not None:
                out["power"] = baseline_power * out["baseline"]
        if baseline_mpp is not None and input_unit != "mpp":
            out["mpp"] = baseline_mpp / out["baseline"]
        result = out[output_unit] if output_unit is not None else out
        if result is None:
            logger.warning(
                "Although unit conversion from input_unit has been done, the "
                "requested output_unit is returned as None. Probably due to "
                "missing 'mpp' or 'objective_power' in slide's meta data.",
            )
        return result

    # -- reading -----------------------------------------------------------------

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        """Read an in-bounds (clamped) region at a pyramid level.

        Concrete readers must implement this; location/size in level
        coordinates, guaranteed within the level image.
        """
        raise NotImplementedError

    def _read_level_bounds(
        self, bounds, level: int, pad_mode: str | None, pad_constant_values
    ) -> np.ndarray:
        """Read possibly out-of-bounds level bounds with edge padding."""
        loc, size = bounds2locsize(bounds)
        level_dims = self.info.level_dimensions[level]
        overlap = find_overlap(loc, size, level_dims)
        ov_loc, ov_size = bounds2locsize(overlap)
        if np.any(ov_size <= 0):
            n_ch = getattr(self, "_n_channels", 3)
            region = np.zeros((max(size[1], 0), max(size[0], 0), n_ch), dtype=np.uint8)
            if pad_mode == "constant" and not np.isscalar(pad_constant_values):
                region[...] = pad_constant_values
            elif pad_mode == "constant":
                region[...] = pad_constant_values
            return region
        region = self._read_level_within(ov_loc, ov_size, level)
        padding = find_padding(loc, size, level_dims)
        if np.all(padding == 0):
            return region
        if pad_mode in ("none", None):
            return region
        if region.ndim > 2:
            padding = np.concatenate([padding, [[0, 0]]])
        if pad_mode == "constant":
            return np.pad(
                region, padding, mode="constant", constant_values=pad_constant_values
            )
        return np.pad(region, padding, mode=pad_mode)

    def read_rect(
        self,
        location,
        size,
        resolution=0,
        units: str = "level",
        interpolation: str = "optimise",
        pad_mode: str = "constant",
        pad_constant_values=0,
        coord_space: str = "baseline",
        **kwargs,
    ) -> np.ndarray:
        """Read a region: location at baseline, size at output resolution.

        See reference ``wsireader.py:1360-1553`` for the full semantics;
        the field of view varies with resolution.
        """
        if coord_space == "resolution":
            return self.read_rect_at_resolution(
                location,
                size,
                resolution=resolution,
                units=units,
                interpolation=interpolation,
                pad_mode=pad_mode,
                pad_constant_values=pad_constant_values,
                **kwargs,
            )
        (read_level, level_location, level_read_size, _, _) = (
            self.find_read_rect_params(location, size, resolution, units)
        )
        bounds = locsize2bounds(level_location, level_read_size)
        region = self._read_level_bounds(
            bounds, read_level, pad_mode, pad_constant_values
        )
        if interpolation not in (None, "none"):
            region = imresize(
                region, output_size=tuple(np.array(size)), interpolation=interpolation
            )
        if self.post_proc is not None:
            region = self.post_proc(region)
        # cross-reader contract: reads are C-contiguous (JP2/zarr paths
        # may otherwise hand back slice views)
        return np.ascontiguousarray(region)

    def read_rect_at_resolution(
        self,
        location,
        size,
        resolution=0,
        units: str = "level",
        **kwargs,
    ) -> np.ndarray:
        """read_rect with location/size in the requested-resolution frame."""
        tl = np.array(location)
        br = tl + np.array(size)
        bounds = np.concatenate([tl, br])
        return self.read_bounds(
            bounds,
            resolution=resolution,
            units=units,
            coord_space="resolution",
            **kwargs,
        )

    def read_bounds(
        self,
        bounds,
        resolution=0,
        units: str = "level",
        interpolation: str = "optimise",
        pad_mode: str = "constant",
        pad_constant_values=0,
        coord_space: str = "baseline",
        **kwargs,
    ) -> np.ndarray:
        """Read a baseline-frame bounds region; FOV fixed across resolutions."""
        bounds_at_baseline = bounds
        if coord_space == "resolution":
            bounds_at_baseline = self.bounds_at_resolution_to_baseline(
                bounds, resolution, units
            )
            _, size_at_requested = bounds2locsize(bounds)
            read_level, level_bounds, _, post_read_scale = (
                self.find_read_bounds_params(bounds_at_baseline, resolution, units)
            )
        else:
            read_level, level_bounds, size_at_requested, post_read_scale = (
                self.find_read_bounds_params(bounds_at_baseline, resolution, units)
            )
        region = self._read_level_bounds(
            level_bounds, read_level, pad_mode, pad_constant_values
        )
        if interpolation not in (None, "none"):
            region = imresize(
                region,
                output_size=tuple(np.array(size_at_requested)),
                interpolation=interpolation,
            )
        if self.post_proc is not None:
            region = self.post_proc(region)
        return region

    def read_region(self, location, level: int, size) -> np.ndarray:
        """OpenSlide-compatible read: location at baseline, size at level."""
        return self.read_rect(
            location=location,
            size=size,
            resolution=level,
            units="level",
        )

    # -- conveniences -------------------------------------------------------------

    def slide_thumbnail(self, resolution=1.25, units: str = "power") -> np.ndarray:
        """Whole-slide thumbnail at the requested (low) resolution."""
        slide_dims = self.info.slide_dimensions
        bounds = [0, 0, *slide_dims]
        return self.read_bounds(bounds, resolution=resolution, units=units)

    def tissue_mask(
        self,
        method: str = "otsu",
        resolution=1.25,
        units: str = "power",
        **masker_kwargs,
    ) -> "VirtualWSIReader":
        """Compute a tissue mask and return it as a VirtualWSIReader."""
        from tiatoolbox_tpu.tools import tissuemask

        thumbnail = self.slide_thumbnail(resolution, units)
        if method not in ("otsu", "morphological"):
            msg = f"Method {method} is not supported."
            raise ValueError(msg)
        if method == "morphological":
            mpp = None
            power = None
            if units == "mpp":
                mpp = resolution
            elif units == "power":
                power = resolution
            masker = tissuemask.MorphologicalMasker(
                mpp=mpp, power=power, **masker_kwargs
            )
        else:
            masker = tissuemask.OtsuTissueMasker(**masker_kwargs)
        mask_img = masker.fit_transform([thumbnail])[0]
        return VirtualWSIReader(mask_img.astype(np.uint8), info=self.info, mode="bool")

    def save_tiles(
        self,
        output_dir,
        tile_objective_value: int,
        tile_read_size: tuple[int, int],
        tile_format: str = ".jpg",
        *,
        verbose: bool = False,
    ) -> None:
        """Save slide tiles at a given objective power to a directory."""
        output_dir = Path(output_dir)
        if self.input_path is not None:
            output_dir = output_dir / self.input_path.name
        output_dir.mkdir(parents=True, exist_ok=True)

        rescale = self.info.objective_power / tile_objective_value
        if not float(rescale).is_integer():
            msg = (
                "Tile objective value must be an integer multiple of the "
                "objective power of the slide."
            )
            raise ValueError(msg)
        w, h = self.slide_dimensions(tile_objective_value, "power")
        tw, th = int(tile_read_size[0]), int(tile_read_size[1])
        import csv

        rows = []
        iter_idx = 0
        for y in range(0, h, th):
            for x in range(0, w, tw):
                cw, ch = min(tw, w - x), min(th, h - y)
                tile = self.read_rect(
                    location=(int(x * rescale), int(y * rescale)),
                    size=(cw, ch),
                    resolution=tile_objective_value,
                    units="power",
                )
                name = f"Tile_{tile_objective_value}_{x}_{y}{tile_format}"
                utils.misc.imwrite(output_dir / name, tile)
                rows.append([iter_idx, name, x, y, cw, ch])
                iter_idx += 1
                if verbose:
                    logger.info("Saved tile %s", name)
        thumb = self.slide_thumbnail()
        utils.misc.imwrite(output_dir / "slide_thumbnail.jpg", thumb)
        with (output_dir / "Output.csv").open("w", newline="") as fh:
            writer = csv.writer(fh)
            writer.writerow(
                ["iter", "Tile_Name", "start_w", "start_h", "end_w", "end_h"]
            )
            writer.writerows(rows)


class VirtualWSIReader(WSIReader):
    """Array/flat-image reader with virtual pyramid scaling.

    ``mode`` is one of "rgb", "bool" (masks; nearest interpolation), or
    "feature" (arbitrary channels). A donor ``info`` WSIMeta rescales
    coordinates from the donor baseline onto this image.
    """

    def __init__(
        self,
        input_img,
        mpp=None,
        power=None,
        info: WSIMeta | None = None,
        mode: str = "rgb",
        post_proc="auto",
    ) -> None:
        super().__init__(input_img, mpp=mpp, power=power, post_proc=post_proc)
        if mode.lower() not in ("rgb", "bool", "feature"):
            msg = "Invalid mode."
            raise ValueError(msg)
        if isinstance(input_img, np.ndarray):
            self.img = input_img
        else:
            self.img = utils.misc.imread(self.input_path)
        if self.img.ndim < 2:
            msg = "Input image must be 2D (H, W) or 3D (H, W, C)."
            raise ValueError(msg)
        if mode != "bool" and (self.img.ndim == 2 or self.img.shape[2] not in (3, 4)):
            logger.warning(
                "The image mode is set to 'feature' as the input dimensions do "
                "not match with binary mask or RGB/RGBA.",
            )
            mode = "feature"
        self.mode = mode.lower()
        if info is not None:
            self._m_info = info

    def _info(self) -> WSIMeta:
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            objective_power=None,
            slide_dimensions=self.img.shape[:2][::-1],
            level_count=1,
            level_dimensions=(self.img.shape[:2][::-1],),
            level_downsamples=[1.0],
            vendor=None,
            mpp=None,
            raw=None,
        )

    def _find_params_from_baseline(self, location, baseline_read_size):
        """Scale baseline coordinates onto this (possibly smaller) image."""
        baseline_size = np.array(self.info.slide_dimensions)
        image_size = np.array(self.img.shape[:2][::-1])
        size_ratio = image_size / baseline_size
        image_location = np.array(location, dtype=np.float32) * size_ratio
        read_size = np.array(baseline_read_size) * size_ratio
        return image_location, read_size

    def read_rect(
        self,
        location,
        size,
        resolution=0,
        units: str = "level",
        interpolation: str = "optimise",
        pad_mode: str = "constant",
        pad_constant_values=0,
        coord_space: str = "baseline",
        **kwargs,
    ) -> np.ndarray:
        if coord_space == "resolution":
            return self.read_rect_at_resolution(
                location,
                size,
                resolution=resolution,
                units=units,
                interpolation=interpolation,
                pad_mode=pad_mode,
                pad_constant_values=pad_constant_values,
            )
        (_, _, _, _, baseline_read_size) = self.find_read_rect_params(
            location, size, resolution, units
        )
        image_location, image_read_size = self._find_params_from_baseline(
            location, baseline_read_size
        )
        bounds = locsize2bounds(image_location, image_read_size)
        if interpolation == "optimise" and self.mode == "bool":
            interpolation = "nearest"
        output_size = None if interpolation in (None, "none") else size
        region = sub_pixel_read(
            self.img,
            bounds,
            output_size=output_size,
            interpolation=interpolation,
            pad_mode=pad_mode,
            pad_constant_values=pad_constant_values,
            read_kwargs=kwargs,
            pad_at_baseline=False,
        )
        if self.mode == "rgb":
            if self.post_proc is not None:
                region = self.post_proc(region)
            return background_composite(region, alpha=False)
        # contiguity contract: mask/feature modes can return slice
        # views of self.img — copy so callers can't mutate the backing
        # image (and C-order matches every other reader)
        return np.ascontiguousarray(region)

    def read_bounds(
        self,
        bounds,
        resolution=0,
        units: str = "level",
        interpolation: str = "optimise",
        pad_mode: str = "constant",
        pad_constant_values=0,
        coord_space: str = "baseline",
        **kwargs,
    ) -> np.ndarray:
        bounds_at_baseline = bounds
        if coord_space == "resolution":
            bounds_at_baseline = self.bounds_at_resolution_to_baseline(
                bounds, resolution, units
            )
            _, size_at_requested = bounds2locsize(bounds)
            _, _, _, post_read_scale = self.find_read_bounds_params(
                bounds_at_baseline, resolution=resolution, units=units
            )
        else:
            _, _, size_at_requested, post_read_scale = self.find_read_bounds_params(
                bounds_at_baseline, resolution=resolution, units=units
            )
        location_at_read, size_at_read = self._find_params_from_baseline(
            *bounds2locsize(bounds_at_baseline)
        )
        bounds_at_read = locsize2bounds(location_at_read, size_at_read)
        if interpolation in (None, "none"):
            interpolation = None
        if interpolation == "optimise" and self.mode == "bool":
            interpolation = "nearest"
        region = sub_pixel_read(
            self.img,
            bounds_at_read,
            output_size=size_at_requested,
            interpolation=interpolation,
            pad_mode=pad_mode,
            pad_constant_values=pad_constant_values,
            read_kwargs=kwargs,
            pad_at_baseline=False,
        )
        if coord_space == "resolution":
            region = imresize(region, output_size=size_at_requested)
        else:
            region = imresize(
                region, scale_factor=post_read_scale, output_size=size_at_requested
            )
        if self.mode == "rgb":
            if self.post_proc is not None:
                region = self.post_proc(region)
            return background_composite(region, alpha=False)
        return region


class TIFFWSIReader(WSIReader):
    """Tiled pyramidal TIFF / SVS / OME-TIFF reader on ``tiffio``."""

    def __init__(self, input_img, mpp=None, power=None, post_proc="auto") -> None:
        super().__init__(input_img, mpp=mpp, power=power, post_proc=post_proc)
        from tiatoolbox_tpu.wsicore.tiffio import TiffFile

        self.tiff = TiffFile(self.input_path)
        self._level_pages = self.tiff.pyramid_pages()
        if not self._level_pages:
            msg = f"No image pyramid found in {self.input_path}"
            raise FileNotSupportedError(msg)
        base = self.tiff.pages[self._level_pages[0]]
        self._n_channels = base.samples_per_pixel
        self._get_colors_from_meta()

    def _get_colors_from_meta(self) -> None:
        """Populate channel colors from slide XML (reference :3834-3856).

        Tries ScanColorTable (QPTIFF), FilterColors (Vectra-style) and
        OME-XML Channel Color attributes in turn.
        """
        from xml.etree import ElementTree

        from tiatoolbox_tpu.utils import postproc_defs

        if not isinstance(self.post_proc, postproc_defs.MultichannelToRGB):
            return
        try:
            xml = self.tiff.pages[self._level_pages[0]].description
            root = ElementTree.fromstring(xml)
        except ElementTree.ParseError:
            return
        for parser in (
            TIFFWSIReader._parse_scancolortable,
            TIFFWSIReader._parse_filtercolor_metadata,
            TIFFWSIReader._parse_ome_metadata_mapping,
        ):
            color_dict = parser(root)
            if color_dict:
                self.post_proc.color_dict = color_dict
                return

    @staticmethod
    def _color_string_to_rgb(value: str):
        """"255, 128, 0" or a named color ("Lime") → RGB tuple in [0,1]."""
        import matplotlib.colors as mcolors

        if "," in value:
            return tuple(int(x.strip()) / 255 for x in value.split(","))
        return mcolors.to_rgb(value)

    @staticmethod
    def _parse_scancolortable(root):
        """QPTIFF ScanColorTable k/v pairs → color dict (reference :3857-3892)."""
        color_info = root.find(".//ScanColorTable")
        if color_info is None:
            return None
        color_dict = {
            k.text.split("_")[0]: v.text
            for k, v in zip(
                color_info.iterfind("ScanColorTable-k"),
                color_info.iterfind("ScanColorTable-v"),
            )
        }
        for key, value in color_dict.items():
            if value is None:
                continue
            color_dict[key] = TIFFWSIReader._color_string_to_rgb(value)
        return color_dict

    @staticmethod
    def _parse_filtercolor_metadata(root):
        """FilterColors + ScanBands filter-pair matching (reference :3895-3972)."""
        filter_colors_section = root.find(".//FilterColors")
        if filter_colors_section is None:
            return None
        filter_colors = {}
        keys = filter_colors_section.findall(".//FilterColors-k")
        vals = filter_colors_section.findall(".//FilterColors-v")
        for k, v in zip(keys, vals):
            filter_colors[k.text] = v.text

        channel_dict = {}
        for scan_band in root.findall(".//ScanBands-i"):
            bands_i = scan_band.find(".//Bands-i")
            if bands_i is None:
                continue
            band_name_element = bands_i.find("Name")
            if band_name_element is None:
                continue
            channel_name = band_name_element.text.strip()
            filter_pair = scan_band.find(".//FilterPair")
            if filter_pair is None:
                continue
            emission = filter_pair.find(".//EmissionFilter/FixedFilter/PartNumber")
            excitation = filter_pair.find(
                ".//ExcitationFilter/FixedFilter/PartNumber"
            )
            if emission is None or excitation is None:
                continue
            matching_rgb = (1.0, 1.0, 1.0)
            for fc_key, fc_val in filter_colors.items():
                if emission.text in fc_key and excitation.text in fc_key:
                    matching_rgb = TIFFWSIReader._color_string_to_rgb(fc_val)
                    break
            channel_dict[channel_name] = matching_rgb
        return channel_dict or None

    @staticmethod
    def _parse_ome_metadata_mapping(root):
        """OME-XML Channel Color attrs + dye annotations (reference :3989-4125)."""
        from collections import defaultdict

        ns = {}
        if root.tag.startswith("{"):
            ns = {"ns": root.tag.split("}")[0].strip("{")}

        dye_mapping = {}
        for annotation in root.findall(
            ".//ns:StructuredAnnotations/ns:XMLAnnotation", ns
        ):
            value_elem = annotation.find("ns:Value", ns)
            if value_elem is None:
                continue
            for chan_priv in value_elem.findall(".//ns:ChannelPriv", ns):
                chan_id = chan_priv.attrib.get("ID")
                dye = chan_priv.attrib.get("FluorescenceChannel")
                if chan_id and dye:
                    dye_mapping[chan_id] = dye

        def int_to_rgb(color_int: int):
            if color_int < 0:
                color_int += 1 << 32
            return (
                ((color_int >> 16) & 0xFF) / 255,
                ((color_int >> 8) & 0xFF) / 255,
                (color_int & 0xFF) / 255,
            )

        channel_data = []
        for pixels in root.findall(".//ns:Pixels", ns):
            for channel in pixels.findall("ns:Channel", ns):
                chan_id = channel.attrib.get("ID")
                name = channel.attrib.get("Name")
                color = channel.attrib.get("Color")
                if not (chan_id and name and color):
                    continue
                try:
                    rgb = int_to_rgb(int(color))
                except ValueError:
                    rgb = None
                channel_data.append({"id": chan_id, "name": name, "rgb": rgb})

        color_dict = {}
        key_counts: dict = defaultdict(int)
        for c_data in channel_data:
            dye = dye_mapping.get(c_data["id"])
            base_key = f"{c_data['name']} ({dye})" if dye else c_data["name"]
            count = key_counts[base_key]
            key = base_key if count == 0 else f"{base_key} [{count + 1}]"
            color_dict[key] = c_data["rgb"]
            key_counts[base_key] += 1
        return color_dict or None

    def _info(self) -> WSIMeta:
        pages = [self.tiff.pages[i] for i in self._level_pages]
        base = pages[0]
        level_dims = [(p.width, p.height) for p in pages]
        downsamples = [base.width / p.width for p in pages]
        meta = self.tiff.svs_metadata()
        mpp = meta["mpp"]
        objective_power = meta["objective_power"]
        if objective_power is None and mpp is not None:
            objective_power = float(utils.misc.mpp2common_objective_power(mpp[0]))
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=(base.width, base.height),
            level_dimensions=level_dims,
            level_downsamples=downsamples,
            level_count=len(pages),
            vendor=meta["vendor"],
            mpp=mpp,
            objective_power=objective_power,
            raw={"description": base.description},
        )

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        page_index = self._level_pages[level]
        return self.tiff.read_region(
            page_index, tuple(int(v) for v in location), tuple(int(v) for v in size)
        )

    def prefetch_bounds(self, bounds_list, resolution, units) -> None:
        """Batch-decode all JPEG tiles the given baseline-frame bounds
        will touch (one parallel native libjpeg call; see
        ``TiffFile.prefetch_regions``). Engines call this per batch so
        tile decode runs GIL-free across cores ahead of the per-patch
        reads."""
        level, _scale = self._find_optimal_level_and_downsample(resolution, units)
        ds = self.info.level_downsamples[level]
        level_bounds = [tuple(np.asarray(b, float) / ds) for b in bounds_list]
        self.tiff.prefetch_regions(self._level_pages[level], level_bounds)


class MIRAXWSIReader(WSIReader):
    """3DHISTECH MIRAX (.mrxs) reader on the native ``mirax`` parser.

    The reference serves MRXS through OpenSlide
    (``wsireader.py:459,1978``); this implements the container
    directly (see ``wsicore/mirax.py``).
    """

    def __init__(self, input_img, mpp=None, power=None, post_proc=None) -> None:
        super().__init__(input_img, mpp=mpp, power=power, post_proc=post_proc)
        from tiatoolbox_tpu.wsicore.mirax import MiraxFile

        self.mirax = MiraxFile(self.input_path)

    def _info(self) -> WSIMeta:
        level_dims = [
            self.mirax.level_dimensions(lvl)
            for lvl in range(len(self.mirax.levels))
        ]
        base = level_dims[0]
        downsamples = [base[0] / d[0] for d in level_dims]
        mpp = self.mirax.levels[0].mpp_xy
        objective_power = None
        if mpp is not None:
            mpp = np.array(mpp)
            objective_power = float(utils.misc.mpp2common_objective_power(mpp[0]))
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=base,
            level_dimensions=level_dims,
            level_downsamples=downsamples,
            level_count=len(level_dims),
            vendor="3DHISTECH",
            mpp=mpp,
            objective_power=objective_power,
            raw={"slide_id": self.mirax.slide_id},
        )

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        return self.mirax.read_region(level, location, size)


class JP2WSIReader(WSIReader):
    """JPEG-2000 reader with lazy reduced-resolution decoding.

    Slide dimensions come from the J2K ``SIZ`` marker without any
    decode; pixel data is decoded lazily per power-of-two scale using
    OpenJPEG's reduced-resolution path (``cv2.IMREAD_REDUCED_*``), so
    thumbnails and tissue masks never materialise the full-resolution
    image. Decoded planes are cached in spill-aware smart arrays
    (zarr-backed above the RAM threshold). A full-resolution decode
    happens only when a level-0 read is requested.
    """

    #: reduced-decode scales supported by OpenJPEG via OpenCV
    _SCALES = (8, 4, 2, 1)

    def __init__(self, input_img, mpp=None, power=None) -> None:
        super().__init__(input_img, mpp=mpp, power=power)
        parsed = self._parse_j2k_size(self.input_path)
        if parsed is None:
            msg = f"Could not parse JP2 codestream header: {self.input_path}"
            raise FileNotSupportedError(msg)
        self._base_wh, self._n_channels = parsed
        self._planes: dict[int, np.ndarray] = {}
        # Parse capture-resolution box for mpp if present.
        self._file_mpp = self._parse_jp2_mpp(self.input_path)

    @staticmethod
    def _parse_j2k_size(path: Path) -> tuple[tuple[int, int], int] | None:
        """(width, height), components from the SIZ marker (no decode)."""
        import struct as _struct

        try:
            head = path.read_bytes()[: 1 << 16]
        except OSError:  # pragma: no cover
            return None
        soc = head.find(b"\xff\x4f\xff\x51")  # SOC immediately before SIZ
        if soc < 0 or soc + 42 > len(head):
            return None
        siz = soc + 2
        (xsiz, ysiz, xosiz, yosiz) = _struct.unpack_from(">IIII", head, siz + 6)
        (csiz,) = _struct.unpack_from(">H", head, siz + 38)
        return ((xsiz - xosiz, ysiz - yosiz), int(csiz))

    def _decode_plane(self, scale: int) -> np.ndarray:
        """Decode the image at 1/scale resolution (cached)."""
        if scale in self._planes:
            return self._planes[scale]
        grey = self._n_channels == 1
        flags = {
            1: cv2.IMREAD_GRAYSCALE if grey else cv2.IMREAD_COLOR,
            2: cv2.IMREAD_REDUCED_GRAYSCALE_2 if grey else cv2.IMREAD_REDUCED_COLOR_2,
            4: cv2.IMREAD_REDUCED_GRAYSCALE_4 if grey else cv2.IMREAD_REDUCED_COLOR_4,
            8: cv2.IMREAD_REDUCED_GRAYSCALE_8 if grey else cv2.IMREAD_REDUCED_COLOR_8,
        }[scale]
        img = cv2.imread(str(self.input_path), flags)
        if img is None and scale != 1:  # old OpenCV: no reduced jp2 decode
            full = self._decode_plane(1)
            img = imresize(full, scale_factor=1.0 / scale)
            self._planes[scale] = img
            return img
        if img is None:
            msg = f"Could not decode JP2 file: {self.input_path}"
            raise FileNotSupportedError(msg)
        if img.ndim == 3 and img.shape[2] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.ndim == 2:
            img = img[:, :, None]
        # spill big planes to a zarr-backed smart array
        if img.nbytes > (64 << 20):
            from tiatoolbox_tpu.utils.zarrlite import create_smart_array

            holder = create_smart_array(img.shape, img.dtype, name=f"jp2_s{scale}")
            holder[:] = img
            img = holder
        self._planes[scale] = img
        return img

    @staticmethod
    def _parse_jp2_mpp(path: Path) -> tuple[float, float] | None:
        try:
            data = path.read_bytes()[: 1 << 20]
        except OSError:  # pragma: no cover
            return None
        idx = data.find(b"resc")
        if idx < 0 or idx + 14 > len(data):
            return None
        import struct as _struct

        vr_n, vr_d, hr_n, hr_d, vr_e, hr_e = _struct.unpack(
            ">HHHHbb", data[idx + 4 : idx + 14]
        )
        if vr_d == 0 or hr_d == 0:
            return None
        v_ppm = (vr_n / vr_d) * (10.0**vr_e)  # points per metre
        h_ppm = (hr_n / hr_d) * (10.0**hr_e)
        if v_ppm <= 0 or h_ppm <= 0:
            return None
        return (1e6 / h_ppm, 1e6 / v_ppm)

    def _info(self) -> WSIMeta:
        w, h = self._base_wh
        # Virtual pyramid of power-of-two levels down to ~512px.
        level_dims = [(w, h)]
        while min(level_dims[-1]) > 512:
            pw, ph = level_dims[-1]
            level_dims.append((max(1, pw // 2), max(1, ph // 2)))
        downs = [w / d[0] for d in level_dims]
        mpp = self._file_mpp
        power = (
            float(utils.misc.mpp2common_objective_power(mpp[0])) if mpp else None
        )
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=(w, h),
            level_dimensions=level_dims,
            level_downsamples=downs,
            level_count=len(level_dims),
            vendor="jp2",
            mpp=mpp,
            objective_power=power,
            raw={},
        )

    @property
    def _codestream(self):
        """Parsed J2K codestream (cached); None when not extractable.

        Multi-tile codestreams get true windowed reads — tiles decode
        independently, so a window decodes only its tiles at any
        reduced scale (glymur-equivalent capability, reference
        ``wsireader.py:2516-3120``).
        """
        if not hasattr(self, "_codestream_cache"):
            from tiatoolbox_tpu.wsicore.jp2 import J2KCodestream

            cs = None
            try:
                parsed = J2KCodestream.from_bytes(self.input_path.read_bytes())
                if len(parsed.tiles) > 1 and not parsed.has_ppm:
                    align = 1 << parsed.decomposition_levels
                    if parsed.xtsiz % align == 0 and parsed.ytsiz % align == 0:
                        cs = parsed
            except (ValueError, KeyError, OSError):
                cs = None
            self._codestream_cache = cs
        return self._codestream_cache

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        ds = self.info.level_downsamples[level]
        # decode at the coarsest reduced scale that still covers ds
        scale = next(s for s in self._SCALES if s <= ds or s == 1)
        cs = self._codestream
        if cs is not None:
            # windowed tile-level decode: no full-image materialisation
            x0 = int(location[0] * ds)
            y0 = int(location[1] * ds)
            w0 = max(int(size[0] * ds), 1)
            h0 = max(int(size[1] * ds), 1)
            region = cs.read_region((x0, y0), (w0, h0), reduce=scale)
            if region.shape[:2] != (int(size[1]), int(size[0])):
                region = imresize(region, output_size=(int(size[0]), int(size[1])))
            if region.ndim == 2:
                region = region[:, :, None]
            return region
        plane = self._decode_plane(scale)
        rel = ds / scale
        x0 = int(location[0] * ds / scale)
        y0 = int(location[1] * ds / scale)
        w0 = max(int(size[0] * rel), 1)
        h0 = max(int(size[1] * rel), 1)
        region = np.asarray(plane[y0 : y0 + h0, x0 : x0 + w0])
        if rel != 1:
            region = imresize(region, output_size=(int(size[0]), int(size[1])))
        if region.ndim == 2:
            region = region[:, :, None]
        return region


class DICOMWSIReader(WSIReader):
    """WSI DICOM reader on the in-package parser (no pydicom).

    Reference uses wsidicom (``wsireader.py:5191-5724``); this build
    parses TILED_FULL instances natively (``wsicore/dicom.py``). A
    directory of ``.dcm`` instances is treated as one pyramid.
    """

    def __init__(self, input_img, mpp=None, power=None) -> None:
        super().__init__(input_img, mpp=mpp, power=power)
        from tiatoolbox_tpu.wsicore.dicom import DicomSlide

        self.slide = DicomSlide(self.input_path)
        self._n_channels = 3

    def _info(self) -> WSIMeta:
        dims = [
            (inst.total_shape[1], inst.total_shape[0]) for inst in self.slide.levels
        ]
        base = dims[0]
        mpp = self.slide.levels[0].mpp
        power = (
            float(utils.misc.mpp2common_objective_power(mpp[0])) if mpp else None
        )
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=base,
            level_dimensions=dims,
            level_downsamples=[base[0] / d[0] for d in dims],
            level_count=len(dims),
            vendor="dicom",
            mpp=mpp,
            objective_power=power,
            raw=None,
        )

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        return self.slide.read_region(level, location, size)


class ZarrWSIReader(WSIReader):
    """Reader for a plain zarr array / group of level arrays (YXS axes)."""

    def __init__(self, input_img, mpp=None, power=None) -> None:
        super().__init__(input_img, mpp=mpp, power=power)
        from tiatoolbox_tpu.utils.zarrlite import ZarrArray, ZarrGroup, open_zarr

        store = open_zarr(self.input_path)
        if isinstance(store, ZarrArray):
            self._levels = [store]
        else:
            assert isinstance(store, ZarrGroup)
            self._levels = [store[k] for k in store.keys()]  # noqa: SIM118
            self._levels.sort(key=lambda a: -a.shape[1])
        self._n_channels = (
            self._levels[0].shape[2] if self._levels[0].ndim > 2 else 1
        )

    def _info(self) -> WSIMeta:
        dims = [(a.shape[1], a.shape[0]) for a in self._levels]
        base = dims[0]
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=base,
            level_dimensions=dims,
            level_downsamples=[base[0] / d[0] for d in dims],
            level_count=len(dims),
            vendor="zarr",
            mpp=None,
            objective_power=None,
            raw=None,
        )

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        x0, y0 = int(location[0]), int(location[1])
        w, h = int(size[0]), int(size[1])
        region = self._levels[level][y0 : y0 + h, x0 : x0 + w]
        if region.ndim == 2:
            region = region[:, :, None]
        return region


class NGFFWSIReader(ZarrWSIReader):
    """OME-NGFF v0.4 multiscales reader (zarr group with attrs)."""

    def __init__(self, input_img, mpp=None, power=None) -> None:
        WSIReader.__init__(self, input_img, mpp=mpp, power=power)
        from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

        group = ZarrGroup(self.input_path)
        attrs = group.attrs
        multiscales = attrs.get("multiscales", [{}])[0]
        version = multiscales.get("version", "0.4")
        if tuple(int(v) for v in str(version).split(".")[:2]) < MIN_NGFF_VERSION:
            logger.warning("NGFF version %s may not be fully supported.", version)
        self._axes = [a["name"].upper() for a in multiscales.get("axes", [])] or [
            "Y",
            "X",
            "C",
        ]
        datasets = multiscales.get("datasets", [])
        self._levels = [group[d["path"]] for d in datasets]
        self._scales = [
            d.get("coordinateTransformations", [{}])[0].get("scale") for d in datasets
        ]
        self._mpp_from_axes = self._extract_mpp(multiscales)
        self._n_channels = (
            self._levels[0].shape[-1] if self._levels[0].ndim > 2 else 1
        )

    def _extract_mpp(self, multiscales: dict) -> tuple[float, float] | None:
        axes = multiscales.get("axes", [])
        datasets = multiscales.get("datasets", [])
        if not datasets:
            return None
        scale = datasets[0].get("coordinateTransformations", [{}])[0].get("scale")
        if scale is None:
            return None
        mpp_x = mpp_y = None
        for i, ax in enumerate(axes):
            unit = (ax.get("unit") or "").lower()
            factor = {"micrometer": 1.0, "nanometer": 1e-3, "millimeter": 1e3}.get(unit)
            if factor is None:
                continue
            if ax["name"].lower() == "x":
                mpp_x = scale[i] * factor
            elif ax["name"].lower() == "y":
                mpp_y = scale[i] * factor
        if mpp_x and mpp_y:
            return (mpp_x, mpp_y)
        return None

    def _info(self) -> WSIMeta:
        yi = self._axes.index("Y") if "Y" in self._axes else 0
        xi = self._axes.index("X") if "X" in self._axes else 1
        dims = [(a.shape[xi], a.shape[yi]) for a in self._levels]
        base = dims[0]
        mpp = self._mpp_from_axes
        power = (
            float(utils.misc.mpp2common_objective_power(mpp[0])) if mpp else None
        )
        return WSIMeta(
            file_path=self.input_path,
            axes="YXS",
            slide_dimensions=base,
            level_dimensions=dims,
            level_downsamples=[base[0] / d[0] for d in dims],
            level_count=len(dims),
            vendor="ngff",
            mpp=mpp,
            objective_power=power,
            raw=None,
        )

    def _read_level_within(self, location, size, level: int) -> np.ndarray:
        arr = self._levels[level]
        x0, y0 = int(location[0]), int(location[1])
        w, h = int(size[0]), int(size[1])
        if self._axes[:2] == ["Y", "X"] or arr.ndim == 2:
            region = arr[y0 : y0 + h, x0 : x0 + w]
        elif self._axes[:3] == ["C", "Y", "X"]:
            region = arr[:, y0 : y0 + h, x0 : x0 + w]
            region = np.moveaxis(region, 0, -1)
        else:
            region = arr[y0 : y0 + h, x0 : x0 + w]
        if region.ndim == 2:
            region = region[:, :, None]
        return region


# -- reference API-compat shims --------------------------------------------------


def is_dicom(path) -> bool:
    """Sniff WSI DICOM (reference ``wsireader.py:64``; delegates to
    :func:`tiatoolbox_tpu.utils.magic.is_dcm`)."""
    return magic.is_dcm(path)


def is_tiled_tiff(path) -> bool:
    """True when the file is a TIFF whose first directory is tiled
    (reference ``wsireader.py:223``)."""
    if not magic.is_tiff(path):
        return False
    try:
        from tiatoolbox_tpu.wsicore.tiffio import TiffFile

        return TiffFile(str(path)).pages[0].is_tiled
    except Exception:  # noqa: BLE001 - malformed files are not tiled tiffs
        return False


def OpenSlideWSIReader(input_img, mpp=None, power=None, **kwargs) -> WSIReader:  # noqa: N802
    """Open an OpenSlide-supported slide (SVS/NDPI/MRXS/generic TIFF).

    API-compat factory for the reference class (``wsireader.py:1970``):
    this build has no OpenSlide dependency — SVS/NDPI/tiled TIFF go to
    :class:`TIFFWSIReader` (own parser) and ``.mrxs`` containers to
    :class:`MIRAXWSIReader`, via the standard :meth:`WSIReader.open`
    dispatch. Returns the concrete reader.
    """
    reader = WSIReader.open(input_img, mpp=mpp, power=power, **kwargs)
    if not isinstance(reader, (TIFFWSIReader, MIRAXWSIReader)):
        msg = (
            f"{reader.__class__.__name__} handles this file; "
            "OpenSlideWSIReader covers SVS/NDPI/MRXS/tiled-TIFF formats."
        )
        raise FileNotSupportedError(msg)
    return reader
