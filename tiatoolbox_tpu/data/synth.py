"""Synthetic histology-like sample data.

Zero-egress replacement for the reference's remote sample registry:
produces deterministic H&E-look images (tissue blobs with nuclei dots on
a white background) used by tests and benchmarks.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

# Ruifrok & Johnston H&E stain vectors (rows: haematoxylin, eosin) —
# standard published constants, also used by the stain tools.
_HE_STAINS = np.array(
    [
        [0.65, 0.70, 0.29],
        [0.07, 0.99, 0.11],
    ]
)


def synthetic_he_patch(
    size: tuple[int, int] = (256, 256),
    seed: int = 0,
    tissue_fraction: float = 0.7,
) -> np.ndarray:
    """Generate an H&E-looking uint8 RGB patch of ``size`` (width, height).

    Composites smooth eosin "tissue" density with blob-shaped
    haematoxylin "nuclei" via Beer-Lambert (OD → RGB), so stain
    estimation algorithms recover sensible stain matrices from it.
    """
    width, height = size
    rng = np.random.default_rng(seed)

    # Smooth random fields via heavy Gaussian blur of noise.
    def smooth_field(scale: int) -> np.ndarray:
        small = rng.random((max(2, height // scale), max(2, width // scale)))
        field = cv2.resize(small, (width, height), interpolation=cv2.INTER_CUBIC)
        return np.clip(field, 0, 1)

    tissue = smooth_field(32)
    tissue_mask = tissue > np.quantile(tissue, 1 - tissue_fraction)
    tissue_soft = cv2.GaussianBlur(tissue_mask.astype(np.float32), (31, 31), 0)

    eosin_density = smooth_field(16) * tissue_soft * 0.9

    # Nuclei: scattered gaussian dots inside the tissue.
    nuclei = np.zeros((height, width), np.float32)
    n_nuclei = min(int(tissue_mask.sum() / 600) + 5, 4000)
    ys, xs = np.nonzero(tissue_mask)
    if len(ys):
        idx = rng.integers(0, len(ys), size=n_nuclei)
        for y, x in zip(ys[idx], xs[idx]):
            r = int(rng.integers(3, 7))
            cv2.circle(nuclei, (int(x), int(y)), r, 1.0, -1)
    nuclei = cv2.GaussianBlur(nuclei, (5, 5), 0)

    od = (
        nuclei[..., None] * _HE_STAINS[0] * 1.0
        + eosin_density[..., None] * _HE_STAINS[1] * 0.8
    )
    rgb = 255.0 * np.exp(-od)
    noise = rng.normal(0, 2.0, rgb.shape)
    return np.clip(rgb + noise, 0, 255).astype(np.uint8)


def make_synthetic_slide(
    path: str | Path,
    size: tuple[int, int] = (2048, 1536),
    mpp: float = 0.5,
    objective_power: float = 20,
    tile_size: int = 256,
    levels: int | None = None,
    seed: int = 11,
) -> Path:
    """Write a pyramidal tiled-TIFF synthetic slide to ``path``.

    Produces a baseline level plus 2x-downsampled levels until the image
    fits in a single tile. Metadata (mpp/power) is embedded via TIFF
    resolution tags + an SVS-style ImageDescription so the reader's
    metadata parsing is exercised.
    """
    from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter

    path = Path(path)
    width, height = size
    base = synthetic_he_patch(size=(width, height), seed=seed)

    images = [base]
    if levels is None:
        levels = 1
        w, h = width, height
        while max(w, h) > tile_size:
            w, h = max(1, w // 2), max(1, h // 2)
            levels += 1
    for _ in range(levels - 1):
        prev = images[-1]
        images.append(
            cv2.resize(
                prev,
                (max(1, prev.shape[1] // 2), max(1, prev.shape[0] // 2)),
                interpolation=cv2.INTER_AREA,
            )
        )

    description = (
        f"Aperio Image Library v0.0.0\n"
        f"{width}x{height} [0,0 {width}x{height}] ({tile_size}x{tile_size})"
        f" JPEG/RGB Q=90|AppMag = {objective_power:g}|MPP = {mpp:g}"
    )
    writer = TiffPyramidWriter(
        path,
        tile_size=tile_size,
        description=description,
        mpp=(mpp, mpp),
    )
    writer.write(images)
    return path


def make_synthetic_dicom(
    path: str | Path,
    size: tuple[int, int] = (512, 384),
    frame_size: int = 128,
    mpp: float = 0.5,
    seed: int = 21,
) -> Path:
    """Write a minimal TILED_FULL WSI DICOM instance (native pixels).

    Exercises the in-package DICOM parser; explicit VR little endian,
    uncompressed RGB frames in row-major tile order.
    """
    import struct

    path = Path(path)
    width, height = size
    img = synthetic_he_patch(size=size, seed=seed)
    frames_across = -(-width // frame_size)
    frames_down = -(-height // frame_size)
    frames = []
    for fy in range(frames_down):
        for fx in range(frames_across):
            tile = np.zeros((frame_size, frame_size, 3), np.uint8)
            block = img[
                fy * frame_size : (fy + 1) * frame_size,
                fx * frame_size : (fx + 1) * frame_size,
            ]
            tile[: block.shape[0], : block.shape[1]] = block
            frames.append(tile.tobytes())
    pixel_data = b"".join(frames)

    def element(group, elem, vr, value: bytes) -> bytes:
        if len(value) % 2:
            value += b"\x00" if vr != b"UI" else b"\x00"
        head = struct.pack("<HH", group, elem) + vr
        if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
            return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + struct.pack("<H", len(value)) + value

    ts = b"1.2.840.10008.1.2.1"  # explicit VR LE
    meta = b"".join(
        [
            element(0x0002, 0x0010, b"UI", ts),
        ]
    )
    mm = mpp / 1000.0
    spacing = f"{mm:.6f}\\{mm:.6f}".encode()
    dataset = b"".join(
        [
            element(0x0008, 0x0008, b"CS", b"ORIGINAL\\PRIMARY\\VOLUME"),
            element(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            element(0x0028, 0x0008, b"IS", str(len(frames)).encode()),
            element(0x0028, 0x0010, b"US", struct.pack("<H", frame_size)),
            element(0x0028, 0x0011, b"US", struct.pack("<H", frame_size)),
            element(0x0028, 0x0030, b"DS", spacing),
            element(0x0048, 0x0006, b"UL", struct.pack("<I", width)),
            element(0x0048, 0x0007, b"UL", struct.pack("<I", height)),
            element(0x7FE0, 0x0010, b"OB", pixel_data),
        ]
    )
    with path.open("wb") as fh:
        fh.write(b"\x00" * 128 + b"DICM")
        fh.write(meta)
        fh.write(dataset)
    return path
