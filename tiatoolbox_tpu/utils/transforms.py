"""Host-side image transforms (NumPy/OpenCV).

Behavioural contract mirrors reference ``tiatoolbox/utils/transforms.py``
(rgb2od/od2rgb at :209-258, imresize at :94-208, bounds helpers at
:259-438). Device-side (JAX) equivalents of the color math live in
``tiatoolbox_tpu.ops.colorconv`` — this module is for the host plane
(thumbnails, masks, coordinate algebra) where NumPy is the right tool.
"""

from __future__ import annotations

import cv2
import numpy as np


def select_cv2_interpolation(scale_factor: float | np.ndarray) -> str:
    """Pick 'area' when shrinking and 'cubic' when enlarging.

    Mirrors reference ``tiatoolbox/utils/misc.py`` interpolation
    selection used by ``imresize(interpolation="optimise")``.
    """
    if np.any(np.asarray(scale_factor) > 1.0):
        return "cubic"
    return "area"


_CV2_INTERPOLATION = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "area": cv2.INTER_AREA,
    "cubic": cv2.INTER_CUBIC,
    "lanczos": cv2.INTER_LANCZOS4,
}


def parse_cv2_interpolaton(interpolation: str | int) -> int:
    """Convert a human-friendly interpolation name to a cv2 flag.

    Accepts cv2 integer flags unchanged. Raises ValueError on unknown
    names (reference ``tiatoolbox/utils/misc.py:parse_cv2_interpolaton``).
    """
    if isinstance(interpolation, str):
        key = interpolation.lower()
        if key in _CV2_INTERPOLATION:
            return _CV2_INTERPOLATION[key]
        msg = f"Invalid interpolation: {interpolation}"
        raise ValueError(msg)
    if interpolation in _CV2_INTERPOLATION.values():
        return interpolation
    msg = f"Invalid interpolation: {interpolation}"
    raise ValueError(msg)


def background_composite(
    image: np.ndarray,
    fill: int = 255,
    *,
    alpha: bool = False,
) -> np.ndarray:
    """Composite an RGBA image onto a constant background.

    Args:
        image: HxWx3 or HxWx4 uint8 array (or HxW greyscale).
        fill: Background fill value.
        alpha: If True, return RGBA; otherwise RGB.
    """
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = img.astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 3:
        # Alpha-free input: the weight is 1 everywhere, so the float
        # composite below reduces to the identity — skip it (uint8
        # values are exact in float32, so this is bit-identical).
        if alpha:
            out_a = np.full(img.shape[:2] + (1,), 255, np.uint8)
            return np.concatenate([img, out_a], axis=-1)
        return img.copy() if img is image else img
    else:
        rgb = img[..., :3].astype(np.float32)
        a = img[..., 3:4].astype(np.float32)
    w = a / 255.0
    out_rgb = rgb * w + float(fill) * (1.0 - w)
    out_rgb = np.clip(np.rint(out_rgb), 0, 255).astype(np.uint8)
    if alpha:
        out_a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        return np.concatenate([out_rgb, out_a], axis=-1)
    return out_rgb


# dtypes cv2.resize handles directly, keyed by source dtype; values are
# the precision-preserving working dtype (reference transforms.py:156-171).
_RESIZE_DTYPE_MAP: dict[np.dtype, np.dtype] = {
    np.dtype(np.bool_): np.dtype(np.uint8),
    np.dtype(np.int8): np.dtype(np.int16),
    np.dtype(np.int16): np.dtype(np.int16),
    np.dtype(np.int32): np.dtype(np.float32),
    np.dtype(np.uint8): np.dtype(np.uint8),
    np.dtype(np.uint16): np.dtype(np.uint16),
    np.dtype(np.uint32): np.dtype(np.float32),
    np.dtype(np.int64): np.dtype(np.float64),
    np.dtype(np.uint64): np.dtype(np.float64),
    np.dtype(np.float16): np.dtype(np.float32),
    np.dtype(np.float32): np.dtype(np.float32),
    np.dtype(np.float64): np.dtype(np.float64),
}


def imresize(
    img: np.ndarray,
    scale_factor: float | tuple[float, float] | None = None,
    output_size: int | tuple[int, int] | None = None,
    interpolation: str | int = "optimise",
) -> np.ndarray:
    """Resize an HxW[xC] image by scale factor or to an output size.

    ``output_size`` is (width, height). With ``interpolation="optimise"``
    uses INTER_AREA when shrinking and INTER_CUBIC when enlarging —
    identical policy to the reference so resampled pixels match.
    """
    if scale_factor is None and output_size is None:
        msg = "One of scale_factor and output_size must be not None."
        raise TypeError(msg)

    sf = None
    if scale_factor is not None:
        sf = np.atleast_1d(np.asarray(scale_factor, dtype=float))
        if sf.size == 1:
            sf = np.repeat(sf, 2)

    if output_size is None:
        out_wh = np.array(
            [int(img.shape[1] * sf[0]), int(img.shape[0] * sf[1])],
        )
    else:
        out_wh = np.atleast_1d(np.asarray(output_size))
        if out_wh.size == 1:
            out_wh = np.repeat(out_wh, 2)

    if sf is None:
        sf = np.asarray(img.shape[:2][::-1], dtype=float) / out_wh

    if np.all(sf == 1.0):
        return img

    if interpolation == "optimise":
        interpolation = select_cv2_interpolation(sf)
    cv2_interp = parse_cv2_interpolaton(interpolation)

    original_dtype = img.dtype
    if original_dtype not in _RESIZE_DTYPE_MAP:
        msg = f"Does not support resizing for array of dtype: {original_dtype}"
        raise ValueError(msg)
    img = img.astype(_RESIZE_DTYPE_MAP[original_dtype])

    if img.shape[0] == img.shape[1] == 1:
        return img.repeat(out_wh[1], 0).repeat(out_wh[0], 1)

    dsize = (int(out_wh[0]), int(out_wh[1]))
    if img.ndim == 3 and img.shape[-1] > 4:
        chans = [
            cv2.resize(img[..., c], dsize=dsize, interpolation=cv2_interp)[..., None]
            for c in range(img.shape[-1])
        ]
        return np.concatenate(chans, axis=-1)
    return cv2.resize(img, dsize=dsize, interpolation=cv2_interp)


def rgb2od(img: np.ndarray) -> np.ndarray:
    r"""RGB → optical density: :math:`OD = -\log(I/255)`, zeros mapped to 1.

    Matches reference ``transforms.py:209-233`` including the in-place
    zero substitution and the 1e-6 floor.
    """
    img = np.copy(img)
    img[img == 0] = 1
    return np.maximum(-1 * np.log(img / 255.0), 1e-6)


def od2rgb(od: np.ndarray) -> np.ndarray:
    """Optical density → uint8 RGB (reference ``transforms.py:234-258``)."""
    od = np.maximum(od, 1e-6)
    return (255 * np.exp(-1 * od)).astype(np.uint8)


def bounds2locsize(
    bounds,
    origin: str = "upper",
) -> tuple[np.ndarray, np.ndarray]:
    """(left, top, right, bottom) bounds → (location, size) arrays."""
    left, top, right, bottom = bounds
    origin = origin.lower()
    if origin == "upper":
        return np.array([left, top]), np.array([right - left, bottom - top])
    if origin == "lower":
        return np.array([left, bottom]), np.array([right - left, top - bottom])
    msg = "Invalid origin. Only 'upper' or 'lower' are valid."
    raise ValueError(msg)


def locsize2bounds(location, size) -> tuple:
    """(location, size) → (left, top, right, bottom) bounds."""
    return (
        location[0],
        location[1],
        location[0] + size[0],
        location[1] + size[1],
    )


def bounds2slices(bounds, stride: int = 1) -> tuple[slice, ...]:
    """Bounds → numpy slices in (y, x) read order."""
    if np.size(stride) not in (1, 2):
        msg = "Invalid stride shape."
        raise ValueError(msg)
    strides = np.tile(stride, 4 // max(np.size(stride), 1))[:2]
    start, stop = np.reshape(np.asarray(bounds), (2, -1)).astype(int)
    return tuple(
        slice(s, e, int(st))
        for s, e, st in zip(start[::-1], stop[::-1], strides)
    )


def pad_bounds(bounds, padding) -> tuple:
    """Expand bounds outward by padding (scalar, per-axis, or per-edge)."""
    if np.size(bounds) % 2 != 0:
        msg = "Bounds must have an even number of elements."
        raise ValueError(msg)
    ndims = np.size(bounds) // 2
    if np.size(padding) not in (1, ndims, np.size(bounds)):
        msg = "Invalid number of padding elements."
        raise ValueError(msg)
    pad = np.asarray(padding)
    if pad.size == ndims:
        pad = np.tile(pad, 2)
    signs = np.repeat([-1, 1], ndims)
    result = np.add(bounds, pad * signs)
    return tuple(result)
