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

    # Smooth random fields via cubic upsampling of coarse noise. All
    # full-resolution math below runs in float32 and row blocks: the
    # naive broadcast (density[..., None] * stains) materializes
    # several H*W*3 float64 temporaries — >1 GB each at bench-slide
    # sizes, which swap-thrashed gigapixel generation to ~170 s.
    def smooth_field(scale: int) -> np.ndarray:
        small = rng.random(
            (max(2, height // scale), max(2, width // scale))
        ).astype(np.float32)
        field = cv2.resize(small, (width, height), interpolation=cv2.INTER_CUBIC)
        return np.clip(field, 0, 1, out=field)

    tissue = smooth_field(32)
    tissue_mask = tissue > np.quantile(tissue, 1 - tissue_fraction)
    tissue_soft = cv2.GaussianBlur(tissue_mask.astype(np.float32), (31, 31), 0)

    eosin_density = smooth_field(16)
    eosin_density *= tissue_soft
    eosin_density *= 0.9

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

    haem = _HE_STAINS[0].astype(np.float32)
    eos = (_HE_STAINS[1] * 0.8).astype(np.float32)
    out = np.empty((height, width, 3), np.uint8)
    block = max(1, (32 << 20) // (width * 3 * 4))  # ~128 MB of f32 rows
    for y0 in range(0, height, block):
        y1 = min(y0 + block, height)
        od = nuclei[y0:y1, :, None] * haem
        od += eosin_density[y0:y1, :, None] * eos
        np.negative(od, out=od)
        rgb = np.exp(od, out=od)
        rgb *= 255.0
        # rng.normal draws the same stream blockwise as it would whole
        rgb += rng.normal(0, 2.0, rgb.shape).astype(np.float32)
        np.clip(rgb, 0, 255, out=rgb)
        out[y0:y1] = rgb.astype(np.uint8)
    return out


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


def _dicom_element(group, elem, vr, value: bytes) -> bytes:
    import struct

    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _dicom_element_implicit(group, elem, vr, value: bytes) -> bytes:
    """Implicit VR LE: tag + 4-byte length, no VR bytes (vr ignored)."""
    import struct

    del vr
    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def _dicom_seq_item(content: bytes) -> bytes:
    import struct

    return struct.pack("<HHI", 0xFFFE, 0xE000, len(content)) + content


def make_synthetic_dicom(
    path: str | Path,
    size: tuple[int, int] = (512, 384),
    frame_size: int = 128,
    mpp: float = 0.5,
    seed: int = 21,
    *,
    sparse: bool = False,
    sparse_keep=None,
    n_concat: int = 1,
    explicit: bool = True,
) -> Path | list[Path]:
    """Write a minimal WSI DICOM instance (native pixels).

    Exercises the in-package DICOM parser; explicit or implicit VR
    little endian, uncompressed RGB frames.

    Args:
        sparse: Emit TILED_SPARSE organisation — only tiles selected by
            ``sparse_keep`` are stored, each with an explicit
            PlanePositionSlideSequence position.
        sparse_keep: Callable ``(fy, fx) -> bool`` choosing which grid
            cells carry data (default: a checkerboard).
        n_concat: Split the frames across this many concatenated
            instances (shared ConcatenationUID + frame offsets). When
            >1, writes ``path`` with suffixes ``_p{k}.dcm`` and returns
            the list of paths.
        explicit: Dataset transfer syntax — explicit VR LE (default) or
            implicit VR LE (file meta stays explicit VR per standard).
    """
    import struct

    path = Path(path)
    width, height = size
    img = synthetic_he_patch(size=size, seed=seed)
    frames_across = -(-width // frame_size)
    frames_down = -(-height // frame_size)
    if sparse and sparse_keep is None:
        sparse_keep = lambda fy, fx: (fy + fx) % 2 == 0  # noqa: E731
    frames = []
    positions = []  # 1-based (row_px, col_px) per stored frame
    for fy in range(frames_down):
        for fx in range(frames_across):
            if sparse and not sparse_keep(fy, fx):
                continue
            tile = np.zeros((frame_size, frame_size, 3), np.uint8)
            block = img[
                fy * frame_size : (fy + 1) * frame_size,
                fx * frame_size : (fx + 1) * frame_size,
            ]
            tile[: block.shape[0], : block.shape[1]] = block
            frames.append(tile.tobytes())
            positions.append((fy * frame_size + 1, fx * frame_size + 1))

    element = _dicom_element if explicit else _dicom_element_implicit
    ts = b"1.2.840.10008.1.2.1" if explicit else b"1.2.840.10008.1.2"
    # file meta (group 0002) is always explicit VR LE
    meta = _dicom_element(0x0002, 0x0010, b"UI", ts)
    mm = mpp / 1000.0
    spacing = f"{mm:.6f}\\{mm:.6f}".encode()
    concat_uid = b"1.2.826.0.1.3680043.99.1.42" if n_concat > 1 else None

    # split frames into n_concat parts
    per_part = -(-len(frames) // n_concat)
    paths = []
    for part in range(n_concat):
        lo = part * per_part
        hi = min(lo + per_part, len(frames))
        part_frames = frames[lo:hi]
        if not part_frames:
            continue
        elements = [
            element(0x0008, 0x0008, b"CS", b"ORIGINAL\\PRIMARY\\VOLUME"),
            element(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            element(0x0028, 0x0004, b"CS", b"RGB"),
            element(0x0028, 0x0008, b"IS", str(len(part_frames)).encode()),
            element(0x0028, 0x0010, b"US", struct.pack("<H", frame_size)),
            element(0x0028, 0x0011, b"US", struct.pack("<H", frame_size)),
            element(0x0028, 0x0030, b"DS", spacing),
        ]
        if concat_uid:
            elements += [
                element(0x0020, 0x9161, b"UI", concat_uid),
                element(0x0020, 0x9162, b"US", struct.pack("<H", part + 1)),
                element(0x0020, 0x9228, b"UL", struct.pack("<I", lo)),
            ]
        elements += [
            element(
                0x0020, 0x9311, b"CS",
                b"TILED_SPARSE" if sparse else b"TILED_FULL",
            ),
        ]
        if sparse:
            items = b"".join(
                _dicom_seq_item(
                    element(
                        0x0048, 0x021A, b"SQ",
                        _dicom_seq_item(
                            element(0x0048, 0x021E, b"SL", struct.pack("<i", col))
                            + element(0x0048, 0x021F, b"SL", struct.pack("<i", row))
                        ),
                    )
                )
                for row, col in positions[lo:hi]
            )
            elements.append(element(0x5200, 0x9230, b"SQ", items))
        elements += [
            element(0x0048, 0x0006, b"UL", struct.pack("<I", width)),
            element(0x0048, 0x0007, b"UL", struct.pack("<I", height)),
            element(0x7FE0, 0x0010, b"OB", b"".join(part_frames)),
        ]
        out_path = (
            path if n_concat == 1
            else path.with_name(f"{path.stem}_p{part}.dcm")
        )
        with out_path.open("wb") as fh:
            fh.write(b"\x00" * 128 + b"DICM")
            fh.write(meta)
            fh.write(b"".join(elements))
        paths.append(out_path)
    return paths if n_concat > 1 else path
