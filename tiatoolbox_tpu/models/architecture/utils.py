"""Shared architecture utilities (JAX/NumPy).

Reference: ``models/architecture/utils.py`` (centre_crop :114,
UpSample2x :202, peak tools :408-547). Device functions take NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def argmax_last_axis(image):
    """argmax over the last axis (host or device arrays)."""
    if isinstance(image, np.ndarray):
        return np.argmax(image, axis=-1)
    return jnp.argmax(image, axis=-1)


def centre_crop(img, crop_shape, data_format: str = "NHWC"):
    """Remove ``crop_shape`` = [dh, dw] pixels, centred (NHWC default)."""
    if data_format not in ("NCHW", "NHWC"):
        msg = f"Unknown input format `{data_format}`."
        raise ValueError(msg)
    crop_t = int(crop_shape[0] // 2)
    crop_b = int(crop_shape[0] - crop_t)
    crop_l = int(crop_shape[1] // 2)
    crop_r = int(crop_shape[1] - crop_l)
    if data_format == "NCHW":
        return img[:, :, crop_t : img.shape[2] - crop_b, crop_l : img.shape[3] - crop_r]
    return img[:, crop_t : img.shape[1] - crop_b, crop_l : img.shape[2] - crop_r, :]


def centre_crop_to_shape(x, y, data_format: str = "NHWC"):
    """Centre crop ``x`` to the spatial shape of ``y``."""
    if data_format == "NCHW":
        crop_shape = (x.shape[2] - y.shape[2], x.shape[3] - y.shape[3])
    else:
        crop_shape = (x.shape[1] - y.shape[1], x.shape[2] - y.shape[2])
    if crop_shape[0] < 0 or crop_shape[1] < 0:
        msg = "Height or width of `x` is smaller than `y`."
        raise ValueError(msg)
    if crop_shape == (0, 0):
        return x
    return centre_crop(x, crop_shape, data_format)


def upsample2x(x):
    """Nearest-neighbour 2x upsample, NHWC (reference UpSample2x :202)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def resize_bilinear(x, scale: int = 2):
    """Bilinear resize by integer scale, align_corners=False (NHWC)."""
    import jax

    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="bilinear")


def peak_detection_map_overlap(
    detection_map: np.ndarray,
    min_distance: int = 6,
    threshold_abs: float = 0.5,
) -> np.ndarray:
    """Local-maxima peak coordinates from a detection probability map.

    Matches skimage ``peak_local_max``-style behaviour: maxima above
    ``threshold_abs`` that are the max within a (2*min_distance+1)
    square window. Returns [N, 2] (row, col) coordinates.
    """
    import scipy.ndimage as ndi

    size = 2 * min_distance + 1
    local_max = ndi.maximum_filter(detection_map, size=size, mode="constant")
    mask = (detection_map == local_max) & (detection_map > threshold_abs)
    coords = np.argwhere(mask)
    # order by descending intensity (as peak_local_max does)
    if len(coords):
        intensities = detection_map[coords[:, 0], coords[:, 1]]
        coords = coords[np.argsort(-intensities)]
    return coords


def nms_on_detection_maps(
    coords: np.ndarray, scores: np.ndarray, radius: float
) -> np.ndarray:
    """Greedy non-maximum suppression on point detections.

    Returns indices of kept detections (highest score wins within
    ``radius``).
    """
    if len(coords) == 0:
        return np.array([], dtype=int)
    from scipy.spatial import cKDTree

    coords = np.asarray(coords, dtype=float)
    order = np.argsort(-np.asarray(scores))
    tree = cKDTree(coords)
    suppressed = np.zeros(len(coords), dtype=bool)
    kept: list[int] = []
    for idx in order:
        if suppressed[idx]:
            continue
        kept.append(int(idx))
        for j in tree.query_ball_point(coords[idx], r=radius):
            if j != idx:
                suppressed[j] = True
    return np.array(kept, dtype=int)


def is_torch_compile_compatible() -> bool:
    """API-parity shim (reference ``architecture/utils.py``).

    The reference gates ``torch.compile`` on GPU capability; here every
    model forward is already an XLA-jitted program, so there is no
    separate compile step to gate.
    """
    return True


def compile_model(model=None, *, mode: str = "default"):
    """API-parity shim for the reference's ``torch.compile`` wrapper.

    JAX models compile through ``jax.jit`` inside ``ModelABC`` — the
    wrapper is returned unchanged. ``mode`` is accepted for signature
    compatibility ("default", "reduce-overhead", "max-autotune",
    "disable").
    """
    valid = {"default", "reduce-overhead", "max-autotune", "disable"}
    if mode not in valid:
        msg = f"Invalid mode: {mode}."
        raise ValueError(msg)
    return model
