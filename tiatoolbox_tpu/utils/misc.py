"""Miscellaneous host-side utilities.

Covers the core of reference ``tiatoolbox/utils/misc.py`` (imread/
imwrite :149-217, mpp↔power conversion :293-404, contrast enhancer
:405, bounding box :898, dtype minimisation :1925). Store-conversion
helpers live in ``tiatoolbox_tpu.utils.store_conversion`` and the
smart-array allocator in ``tiatoolbox_tpu.utils.zarrlite``.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import cv2
import numpy as np
import yaml

from tiatoolbox_tpu import logger
from tiatoolbox_tpu.utils.exceptions import FileNotSupportedError


def split_path_name_ext(full_path) -> tuple[Path, str, list[str]]:
    """Split a path into directory, basename, and list of suffixes."""
    input_path = Path(full_path)
    return input_path.parent.absolute(), input_path.name, input_path.suffixes


def grab_files_from_dir(input_path, file_types=("*.jpg", "*.png", "*.tif")) -> list:
    """List files in a directory matching the given glob patterns."""
    input_path = Path(input_path)
    if isinstance(file_types, str):
        file_types = tuple(file_types.split(","))
    files_grabbed: list[Path] = []
    for files in file_types:
        files_grabbed.extend(input_path.glob(str(files)))
    return list(files_grabbed)


def imread(image_path, as_uint8: bool = True) -> np.ndarray:
    """Read an image file to an RGB(A) numpy array.

    Supports the formats cv2 can decode plus .npy arrays.
    """
    image_path = Path(image_path)
    if not image_path.is_file():
        msg = f"Could not find image file: {image_path}"
        raise FileNotFoundError(msg)
    if image_path.suffix == ".npy":
        image = np.load(str(image_path))
    else:
        image = cv2.imread(str(image_path), cv2.IMREAD_UNCHANGED)
        if image is None:
            msg = f"Unable to decode image: {image_path}"
            raise FileNotSupportedError(msg)
        if image.ndim == 3 and image.shape[2] == 3:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        elif image.ndim == 3 and image.shape[2] == 4:
            image = cv2.cvtColor(image, cv2.COLOR_BGRA2RGBA)
    if as_uint8 and image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    return image


def imwrite(image_path, img: np.ndarray) -> None:
    """Write an RGB(A) numpy array to an image file."""
    image_path = Path(image_path)
    if img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    elif img.ndim == 3 and img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_RGBA2BGRA)
    if not cv2.imwrite(str(image_path), img):
        msg = f"Could not write image: {image_path}"
        raise OSError(msg)


def load_stain_matrix(stain_matrix_input) -> np.ndarray:
    """Load a stain matrix from ndarray or csv/npy file."""
    if isinstance(stain_matrix_input, np.ndarray):
        return stain_matrix_input
    path = Path(stain_matrix_input)
    if path.suffix == ".csv":
        import pandas as pd

        return pd.read_csv(path, header=None).to_numpy()
    if path.suffix == ".npy":
        return np.load(str(path))
    msg = "If supplying a path to a stain matrix, use either a npy or a csv file"
    raise FileNotSupportedError(msg)


# ---------------------------------------------------------------------------
# Resolution conversions
# ---------------------------------------------------------------------------

# Common objective-power ↔ mpp anchor: 40x ≈ 0.25 mpp (10 / power).
_MPP_40X = 0.25


def mpp2common_objective_power(
    mpp,
    common_powers=(1, 1.25, 2, 2.5, 4, 5, 10, 20, 40, 60, 90, 100),
) -> float | np.ndarray:
    """Approximate objective power(s) from mpp, snapped to common values."""
    op = mpp2objective_power(mpp)
    distances = np.abs(np.subtract.outer(np.atleast_1d(op), common_powers))
    snapped = np.array(common_powers)[np.argmin(distances, axis=-1)]
    if np.isscalar(mpp) or np.ndim(mpp) == 0:
        return float(snapped[0])
    return snapped


def objective_power2mpp(objective_power) -> float | np.ndarray:
    """Approximate mpp from objective power (10 / power)."""
    return 10.0 / np.asarray(objective_power, dtype=float)


def mpp2objective_power(mpp) -> float | np.ndarray:
    """Approximate objective power from mpp (10 / mpp)."""
    return 10.0 / np.asarray(mpp, dtype=float)


# ---------------------------------------------------------------------------
# Image helpers
# ---------------------------------------------------------------------------


def contrast_enhancer(img: np.ndarray, low_p: int = 2, high_p: int = 98) -> np.ndarray:
    """Percentile-stretch contrast enhancement on a uint8 image.

    Matches reference ``utils/misc.py:405-445`` (skimage
    rescale_intensity semantics incl. the min/max fallback and float
    truncation to uint8).
    """
    if img.dtype != np.uint8:
        msg = "Image should be uint8."
        raise AssertionError(msg)
    img_out = img.copy()
    p_low, p_high = np.percentile(img_out, (low_p, high_p))
    if p_low >= p_high:
        p_low, p_high = np.min(img_out), np.max(img_out)
    if p_high > p_low:
        clipped = np.clip(img_out.astype(np.float64), p_low, p_high)
        img_out = (clipped - p_low) / (p_high - p_low) * 255.0
    return img_out.astype(np.uint8)


def get_luminosity_tissue_mask(img: np.ndarray, threshold: float) -> np.ndarray:
    """Tissue mask from LAB luminosity thresholding (< threshold).

    Applies contrast enhancement first (reference ``misc.py:279-284``).
    """
    img = img.astype("uint8")
    img = contrast_enhancer(img, low_p=2, high_p=98)
    img_lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    l_lab = img_lab[:, :, 0] / 255.0
    tissue_mask = l_lab < threshold
    if tissue_mask.sum() == 0:
        msg = "Empty tissue mask computed."
        raise ValueError(msg)
    return tissue_mask


def get_bounding_box(img: np.ndarray) -> np.ndarray:
    """Bounds (start_x, start_y, end_x, end_y) of nonzero area of a mask."""
    rows = np.any(img, axis=1)
    cols = np.any(img, axis=0)
    r_min, r_max = np.where(rows)[0][[0, -1]]
    c_min, c_max = np.where(cols)[0][[0, -1]]
    r_max += 1
    c_max += 1
    return np.array([c_min, r_min, c_max, r_max])


def cast_to_min_dtype(array: np.ndarray) -> np.ndarray:
    """Cast an integer array to the smallest dtype that holds its range."""
    if array.size == 0:
        return array
    lo, hi = array.min(), array.max()
    for dtype in (np.uint8, np.int8, np.uint16, np.int16, np.uint32, np.int32):
        info = np.iinfo(dtype)
        if info.min <= lo and hi <= info.max:
            return array.astype(dtype)
    return array


# ---------------------------------------------------------------------------
# File / data helpers
# ---------------------------------------------------------------------------


def read_locations(input_table) -> "object":
    """Read annotation locations from ndarray/csv/json to a DataFrame.

    Output columns: x, y, class (class defaults to None/NaN when absent).
    """
    import pandas as pd

    if isinstance(input_table, (str, Path)):
        path = Path(input_table)
        if path.suffix == ".npy":
            input_table = np.load(str(path))
        elif path.suffix == ".csv":
            out_table = pd.read_csv(path, sep=",")
            if "x" not in out_table.columns:
                out_table = pd.read_csv(
                    path, header=None, names=["x", "y", "class"], sep=","
                )
            if "class" not in out_table.columns:
                out_table["class"] = None
            return out_table[["x", "y", "class"]]
        elif path.suffix == ".json":
            with path.open() as fh:
                data = json.load(fh)
            return pd.DataFrame(data)
        else:
            msg = "File type not supported."
            raise FileNotSupportedError(msg)
    if isinstance(input_table, np.ndarray):
        if input_table.shape[1] == 3:
            return pd.DataFrame(input_table, columns=["x", "y", "class"])
        if input_table.shape[1] == 2:
            out = pd.DataFrame(input_table, columns=["x", "y"])
            out["class"] = None
            return out
        msg = "Numpy table should be of format `x, y` or `x, y, class`."
        raise ValueError(msg)
    if hasattr(input_table, "columns"):
        df = input_table.copy()
        if df.shape[1] == 2:
            df.columns = ["x", "y"]
            df["class"] = None
        elif df.shape[1] == 3:
            df.columns = ["x", "y", "class"]
        else:
            msg = "Input table must have 2 or 3 columns."
            raise ValueError(msg)
        return df
    msg = "File type not supported."
    raise TypeError(msg)


def unzip_data(zip_path, save_path, *, del_zip: bool = True) -> None:
    """Extract a zip archive to a directory."""
    with zipfile.ZipFile(zip_path, "r") as zf:
        zf.extractall(path=save_path)
    if del_zip:
        Path(zip_path).unlink()


def save_yaml(input_dict: dict, output_path="output.yaml", *, parents: bool = False, exist_ok: bool = False) -> None:
    """Write a dict to a YAML file."""
    path = Path(output_path)
    if parents:
        path.parent.mkdir(parents=True, exist_ok=True)
    if not exist_ok and path.exists():
        msg = "File already exists."
        raise FileExistsError(msg)
    with path.open("w") as fh:
        yaml.dump(input_dict, fh)


def save_as_json(data: dict | list, save_path, *, parents: bool = False, exist_ok: bool = False) -> None:
    """Write JSON-safe data to a file, converting numpy scalars/arrays."""

    def walk(obj):
        if isinstance(obj, dict):
            return {
                (k.item() if isinstance(k, np.generic) else k): walk(v)
                for k, v in obj.items()
            }
        if isinstance(obj, (list, tuple)):
            return [walk(v) for v in obj]
        if isinstance(obj, np.ndarray):
            return walk(obj.tolist())
        if isinstance(obj, np.generic):
            return obj.item()
        if isinstance(obj, Path):
            return str(obj)
        return obj

    path = Path(save_path)
    if parents:
        path.parent.mkdir(parents=True, exist_ok=True)
    if not exist_ok and path.exists():
        msg = "File already exists."
        raise FileExistsError(msg)
    with path.open("w") as fh:
        json.dump(walk(data), fh)


def download_data(url: str, save_path, *, overwrite: bool = False) -> Path:
    """Download a file from a URL (no-op if cached and not overwrite).

    Note: this build targets zero-egress environments; network failures
    raise with a clear message rather than hanging.
    """
    save_path = Path(save_path)
    if save_path.exists() and not overwrite:
        return save_path
    save_path.parent.mkdir(parents=True, exist_ok=True)
    import urllib.request

    try:
        urllib.request.urlretrieve(url, str(save_path))  # noqa: S310
    except Exception as exc:
        msg = f"Could not download {url}: {exc}"
        raise ConnectionError(msg) from exc
    return save_path


def select_device(*, on_gpu: bool | None = None) -> str:
    """Return the preferred JAX platform name ("tpu", "gpu", or "cpu")."""
    import jax

    platforms = {d.platform for d in jax.devices()}
    if on_gpu is False:
        return "cpu"
    for pref in ("tpu", "axon", "gpu"):
        if pref in platforms:
            return "tpu" if pref == "axon" else pref
    return "cpu"


def string_to_tuple(in_str: str) -> tuple[str, ...]:
    """Split a comma separated string into a tuple of strings."""
    return tuple(substring.strip() for substring in in_str.split(","))


def write_probability_heatmap_as_ome_tiff(
    image_path,
    probability_map,
    colormap: int | None = None,
    tile_size: int = 256,
    mpp=None,
) -> "Path":
    """Write a probability map as a pyramidal OME-TIFF heatmap.

    Reference ``utils/misc.py:1808-1904`` (tifffile bigtiff writer);
    here built on the in-package ``TiffPyramidWriter`` with an OME-XML
    ImageDescription.

    Args:
        image_path: Output .ome.tiff path.
        probability_map: [H, W] float map in [0, 1] (or uint8).
        colormap: Optional cv2 colormap id (e.g. cv2.COLORMAP_JET);
            greyscale RGB when None.
        tile_size: Pyramid tile size.
        mpp: Optional (x, y) microns-per-pixel metadata.
    """
    from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter

    prob = np.asarray(probability_map)
    if prob.dtype != np.uint8:
        prob = np.clip(prob * 255.0, 0, 255).astype(np.uint8)
    if colormap is not None:
        rgb = cv2.cvtColor(cv2.applyColorMap(prob, colormap), cv2.COLOR_BGR2RGB)
    else:
        rgb = np.stack([prob] * 3, axis=-1)

    levels = [rgb]
    while max(levels[-1].shape[:2]) > tile_size:
        prev = levels[-1]
        levels.append(
            cv2.resize(
                prev,
                (max(1, prev.shape[1] // 2), max(1, prev.shape[0] // 2)),
                interpolation=cv2.INTER_AREA,
            )
        )
    h, w = rgb.shape[:2]
    physical = ""
    if mpp is not None:
        mpp = np.broadcast_to(np.asarray(mpp, dtype=float), 2)
        physical = (
            f' PhysicalSizeX="{mpp[0]}" PhysicalSizeXUnit="µm"'
            f' PhysicalSizeY="{mpp[1]}" PhysicalSizeYUnit="µm"'
        )
    ome_xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="probability_heatmap">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="uint8" '
        f'SizeX="{w}" SizeY="{h}" SizeC="3" SizeZ="1" SizeT="1"'
        f"{physical}>"
        '<Channel ID="Channel:0:0" SamplesPerPixel="3"/>'
        "<TiffData/></Pixels></Image></OME>"
    )
    writer = TiffPyramidWriter(
        image_path,
        tile_size=tile_size,
        description=ome_xml,
        mpp=tuple(mpp) if mpp is not None else None,
        compression="deflate",
    )
    writer.write(levels)
    return Path(image_path)


def ppu2mpp(ppu: float, units: str | int) -> float:
    """Pixels-per-unit → microns-per-pixel (reference ``misc.py:940-988``).

    Args:
        ppu: Pixels per unit.
        units: "m"/"cm"/"mm"/"inch" or TIFF ResolutionUnit codes
            2 (inch) / 3 (cm).
    """
    microns_per_unit = {
        "meter": 1e6,
        "m": 1e6,
        "centimeter": 1e4,
        "cm": 1e4,
        "mm": 1e3,
        "inch": 25400,
        "in": 25400,
        2: 25400,
        3: 1e4,
    }
    if units not in microns_per_unit:
        msg = f"Invalid units: {units}"
        raise ValueError(msg)
    return 1 / ppu * microns_per_unit[units]


def get_zarr_array(zarr_array) -> np.ndarray:
    """Materialise a zarr-backed / array-like object as a numpy array."""
    from tiatoolbox_tpu.utils.zarrlite import ZarrArray

    if isinstance(zarr_array, ZarrArray):
        return zarr_array[:]
    return np.array(zarr_array).astype(float)


def make_valid_poly(poly, origin: tuple[float, float] | None = None):
    """Translate to ``origin`` and repair degenerate polygons.

    Reference ``misc.py:1034-1059``: invalid polygons are fixed with a
    small buffer; here validity means at least 3 distinct points and
    nonzero ring area.
    """
    import numpy as _np

    from tiatoolbox_tpu.annotation.geometry import Polygon

    if origin is not None and tuple(origin) != (0, 0):
        shift = _np.asarray(origin, dtype=float)
        if isinstance(poly, Polygon):
            poly = Polygon(
                poly.shell - shift, [h - shift for h in poly.holes]
            )
        else:
            poly = type(poly)(poly.coords - shift)
    if isinstance(poly, Polygon):
        distinct = _np.unique(poly.shell[:-1], axis=0)
        if len(distinct) < 3 or poly.area == 0:
            logger.warning("Invalid geometry found, fix using buffer().")
            return poly.buffer(0.01)
    return poly


def anns_from_hoverdict(
    data: dict,
    props: list,
    typedict: dict | None,
    origin: tuple[float, float],
    scale_factor,
) -> list:
    """HoVerNet-style detection dict → Annotation list (reference :1060-1113)."""
    from tiatoolbox_tpu.annotation.geometry import geojson_to_geometry
    from tiatoolbox_tpu.annotation.storage import Annotation

    annotations = []
    for ann in data.values():
        geom = geojson_to_geometry(
            {
                "type": ann.get("geom_type", "Polygon"),
                "coordinates": (
                    np.asarray(scale_factor) * np.array([ann["contour"]])
                ).tolist(),
            }
        )
        properties = {
            prop: (
                typedict[ann[prop]]
                if prop == "type" and typedict is not None
                else ann[prop]
            )
            for prop in props[3:]
            if prop in ann
        }
        annotations.append(Annotation(make_valid_poly(geom, origin), properties))
    return annotations


def make_default_dict(data: dict, subcat: str) -> dict:
    """Auto type-name dict for one head of a multi-head .dat (reference :1115-1140)."""
    types = {
        data[subcat][ann_id]["type"]
        for ann_id in data[subcat]
        if "type" in data[subcat][ann_id]
    }
    num_chars = min(3, len(subcat))
    return {t: f"{subcat[:num_chars]}: {t}" for t in types}


def add_from_dat(
    store,
    fp,
    scale_factor=(1, 1),
    typedict: dict | None = None,
    origin: tuple[float, float] = (0, 0),
) -> None:
    """Load a HoVerNet/cerberus ``.dat`` detection file into a store.

    Reference ``misc.py:1142-1217``: joblib-pickled dict of instances
    (or category → instances for multi-head cerberus output); scale
    factor is inferred from stored base/proc resolutions when present.
    """
    import joblib

    data = joblib.load(fp)
    props = list(data[next(iter(data.keys()))].keys())
    if "base_resolution" in data and "proc_resolution" in data:
        scale_factor = (
            data["proc_resolution"]["resolution"]
            / data["base_resolution"]["resolution"]
        )
        logger.info("Scale factor inferred from resolutions: %s", scale_factor)
    if "contour" not in props:
        # cerberus format: objects subdivided into categories
        anns = []
        for subcat in data:
            if (
                subcat in {"resolution", "proc_dimensions", "base_dimensions"}
                or "resolution" in subcat
            ):
                continue
            sub_props = next(iter(data[subcat].values()))
            if not isinstance(sub_props, dict):
                continue
            sub_props = list(sub_props.keys())
            typedict_sub = (
                make_default_dict(data, subcat)
                if typedict is None
                else typedict[subcat]
            )
            anns.extend(
                anns_from_hoverdict(
                    data[subcat], sub_props, typedict_sub, origin, scale_factor
                )
            )
    else:
        anns = anns_from_hoverdict(data, props, typedict, origin, scale_factor)
    logger.info("Added %d annotations.", len(anns))
    store.append_many(anns)


def store_from_dat(
    fp,
    scale_factor=(1, 1),
    typedict: dict | None = None,
    origin: tuple[float, float] = (0, 0),
    cls=None,
):
    """New annotation store populated from a ``.dat`` detection file."""
    from tiatoolbox_tpu.annotation.storage import SQLiteStore

    store = (cls or SQLiteStore)()
    add_from_dat(store, fp, scale_factor, typedict=typedict, origin=origin)
    return store


def save_annotations(save_path: Path, store) -> Path:
    """Persist a store to ``save_path`` (forced ``.db`` extension)."""
    save_path = Path(save_path).with_suffix(".db")
    store.dump(str(save_path))
    return save_path


def save_qupath_json(save_path: Path, qupath_json: dict) -> Path:
    """Write a QuPath GeoJSON dict to ``save_path`` (forced ``.json``)."""
    save_path = Path(save_path).with_suffix(".json")
    with save_path.open("w") as fh:
        json.dump(qupath_json, fh, indent=2)
    return save_path
