"""Synthetic MIRAX (.mrxs) tree writer for reader tests.

Emits the container layout parsed by ``tiatoolbox_tpu.wsicore.mirax``
(Slidedat.ini + Index.dat + Data0000.dat with JPEG tiles).
"""

from __future__ import annotations

import struct
from pathlib import Path

import cv2
import numpy as np

SLIDE_VERSION = "01.02"
SLIDE_ID = "SYNTHETIC-0001"


def tile_pixels(level: int, tx: int, ty: int, tile: int) -> np.ndarray:
    """Deterministic RGB tile content."""
    img = np.zeros((tile, tile, 3), np.uint8)
    img[..., 0] = 40 * level + 10
    img[..., 1] = (60 * tx + 30) % 256
    img[..., 2] = (60 * ty + 30) % 256
    img[: tile // 4, : tile // 4] = 255  # corner marker
    return img


def write_synthetic_mrxs(
    path: Path,
    grid_nx: int = 4,
    grid_ny: int = 3,
    tile: int = 64,
    n_levels: int = 2,
    mpp: float = 0.5,
    *,
    missing_tiles: tuple = (),
    overlap: int = 0,
    fill_bgr: int = 16777215,
    n_data_files: int = 1,
    corrupt_tiles: tuple = (),
) -> Path:
    """Write <path>.mrxs + data dir; returns the .mrxs path.

    Adversarial knobs: ``missing_tiles`` drops index entries,
    ``corrupt_tiles`` writes garbage bytes for an entry, ``fill_bgr``
    sets a nonzero fill colour, ``overlap`` emits camera overlap, and
    ``n_data_files`` spreads tiles round-robin across data files.
    """
    path = Path(path)
    mrxs = path.with_suffix(".mrxs")
    data_dir = mrxs.parent / mrxs.stem
    data_dir.mkdir(parents=True, exist_ok=True)
    mrxs.write_bytes(b"MIRAX synthetic stub")

    # ---- data files with JPEG tiles, record index entries per level
    level_entries: list[list[tuple[int, int, int, int]]] = [[] for _ in range(n_levels)]
    data_paths = [data_dir / f"Data{k:04d}.dat" for k in range(n_data_files)]
    handles = [p.open("wb") for p in data_paths]
    thumb_entry = None
    try:
        tile_counter = 0
        for lvl in range(n_levels):
            step = 2**lvl
            for gy in range(0, grid_ny, step):
                for gx in range(0, grid_nx, step):
                    if (lvl, gx // step, gy // step) in missing_tiles:
                        continue
                    if (lvl, gx // step, gy // step) in corrupt_tiles:
                        payload = b"\xde\xad\xbe\xef" * 16
                    else:
                        img = tile_pixels(lvl, gx // step, gy // step, tile)
                        ok, buf = cv2.imencode(
                            ".jpg",
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                            [cv2.IMWRITE_JPEG_QUALITY, 95],
                        )
                        assert ok
                        payload = buf.tobytes()
                    fileno = tile_counter % n_data_files
                    fh = handles[fileno]
                    offset = fh.tell()
                    fh.write(payload)
                    tile_counter += 1
                    image_number = gy * grid_nx + gx
                    level_entries[lvl].append(
                        (image_number, offset, len(payload), fileno)
                    )
        # one nonhier entry: a small "thumbnail" JPEG
        thumb = np.full((32, 32, 3), 128, np.uint8)
        ok, buf = cv2.imencode(".jpg", thumb)
        thumb_entry = (0, handles[0].tell(), len(buf), 0)
        handles[0].write(buf.tobytes())
    finally:
        for fh in handles:
            fh.close()

    # ---- Slidedat.ini
    lines = [
        "[GENERAL]",
        f"SLIDE_VERSION = {SLIDE_VERSION}",
        f"SLIDE_ID = {SLIDE_ID}",
        f"IMAGENUMBER_X = {grid_nx}",
        f"IMAGENUMBER_Y = {grid_ny}",
        "",
        "[HIERARCHICAL]",
        "HIER_COUNT = 1",
        "NONHIER_COUNT = 1",
        "INDEXFILE = Index.dat",
        "HIER_0_NAME = Slide zoom level",
        f"HIER_0_COUNT = {n_levels}",
    ]
    for lvl in range(n_levels):
        lines += [
            f"HIER_0_VAL_{lvl} = ZoomLevel_{lvl}",
            f"HIER_0_VAL_{lvl}_SECTION = LAYER_0_LEVEL_{lvl}_SECTION",
        ]
    lines += [
        "NONHIER_0_NAME = Scan data layer",
        "NONHIER_0_COUNT = 1",
        "NONHIER_0_VAL_0 = ScanDataLayer_SlideThumbnail",
        "",
        "[DATAFILE]",
        f"FILE_COUNT = {n_data_files}",
        *[f"FILE_{k} = Data{k:04d}.dat" for k in range(n_data_files)],
        "",
    ]
    for lvl in range(n_levels):
        lines += [
            f"[LAYER_0_LEVEL_{lvl}_SECTION]",
            f"DIGITIZER_WIDTH = {tile}",
            f"DIGITIZER_HEIGHT = {tile}",
            f"OVERLAP_X = {overlap}",
            f"OVERLAP_Y = {overlap}",
            f"MICROMETER_PER_PIXEL_X = {mpp * 2**lvl}",
            f"MICROMETER_PER_PIXEL_Y = {mpp * 2**lvl}",
            "IMAGE_FORMAT = JPEG",
            f"IMAGE_FILL_COLOR_BGR = {fill_bgr}",
            "",
        ]
    (data_dir / "Slidedat.ini").write_text("\n".join(lines), encoding="utf-8")

    # ---- Index.dat
    header = SLIDE_VERSION.encode() + SLIDE_ID.encode()
    # layout: header | hier_root, nonhier_root | hier slot table |
    # nonhier slot table | pages
    hier_root = len(header) + 8
    nonhier_root = hier_root + 4 * n_levels
    pages_start = nonhier_root + 4 * 1
    blob = bytearray(header)
    blob += struct.pack("<ii", hier_root, nonhier_root)
    page_offsets = []
    pages = bytearray()
    for lvl in range(n_levels):
        page_offsets.append(pages_start + len(pages))
        entries = level_entries[lvl]
        pages += struct.pack("<ii", len(entries), 0)
        for entry in entries:
            pages += struct.pack("<iiii", *entry)
    nonhier_page_offset = pages_start + len(pages)
    pages += struct.pack("<ii", 1, 0)
    pages += struct.pack("<iiii", *thumb_entry)
    for off in page_offsets:
        blob += struct.pack("<i", off)
    blob += struct.pack("<i", nonhier_page_offset)
    blob += pages
    (data_dir / "Index.dat").write_bytes(bytes(blob))
    return mrxs
