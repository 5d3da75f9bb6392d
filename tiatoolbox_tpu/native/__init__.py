"""Native (C++) host-plane components, loaded via ctypes.

Currently: a multithreaded libjpeg batch tile decoder and TIFF
LZW/PackBits decoders used by the TIFF reader's hot read path, and a
priority-flood watershed used by the HoVerNet-family instance
postprocessing. The shared library is compiled on first use with g++
and cached under ``$TIATOOLBOX_TPU_HOME/native``; when the toolchain
or libjpeg is unavailable the callers fall back to OpenCV /
pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from tiatoolbox_tpu import logger, rcParam

_lib = None
_lib_checked = False
# must match tiatpu_version() in jpegdec.cpp; bump together on any
# exported-symbol change so stale cached builds rebuild instead of
# raising AttributeError at symbol-binding time
_NATIVE_VERSION = 2


def _source_paths() -> list[Path]:
    here = Path(__file__).parent
    return [here / "jpegdec.cpp", here / "watershed.cpp", here / "lzw.cpp"]


def _build_library(out_path: Path) -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *[str(p) for p in _source_paths()],
        "-ljpeg",
        "-lpthread",
        "-o",
        str(out_path),
    ]
    try:
        result = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120, check=False
        )
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.warning("Native build failed to launch: %s", exc)
        return False
    if result.returncode != 0:
        logger.warning("Native build failed: %s", result.stderr[:500])
        return False
    return True


def get_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_checked  # noqa: PLW0603
    if _lib_checked:
        return _lib
    _lib_checked = True
    if os.environ.get("TIATOOLBOX_TPU_NO_NATIVE"):
        return None
    cache_dir = Path(rcParam["TIATOOLBOX_HOME"]) / "native"
    cache_dir.mkdir(parents=True, exist_ok=True)
    # version-suffixed filename: caches from older checkouts (possibly
    # mtime-newer after archive extraction, or a TIATOOLBOX_HOME shared
    # between envs) are simply never loaded — dlopen caches by path, so
    # rebuild-in-place could not replace an already-mapped stale library
    lib_path = cache_dir / f"libtiatpu_native_v{_NATIVE_VERSION}.so"
    src_mtime = max(p.stat().st_mtime for p in _source_paths())
    if not lib_path.exists() or lib_path.stat().st_mtime < src_mtime:
        if not _build_library(lib_path):
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError as exc:  # pragma: no cover
        logger.warning("Could not load native library: %s", exc)
        return None
    if lib.tiatpu_version() != _NATIVE_VERSION:  # pragma: no cover
        logger.warning("Native library version mismatch; using fallbacks.")
        return None
    lib.tiatpu_decode_jpeg_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.tiatpu_decode_jpeg_batch.restype = ctypes.c_int
    lib.tiatpu_watershed.argtypes = [
        ctypes.c_void_p,  # image float32
        ctypes.c_void_p,  # markers int32
        ctypes.c_void_p,  # mask uint8
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_void_p,  # out int32
    ]
    lib.tiatpu_watershed.restype = ctypes.c_int
    lib.tiatpu_lzw_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.tiatpu_lzw_decode.restype = ctypes.c_int64
    lib.tiatpu_packbits_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.tiatpu_packbits_decode.restype = ctypes.c_int64
    _lib = lib
    return _lib


def watershed(image, markers, mask):
    """Native marker-based watershed; None when the library is absent.

    Matches ``skimage.segmentation.watershed(image, markers,
    mask=mask)`` semantics (ascending flood, FIFO tie-break,
    4-connectivity).
    """
    lib = get_library()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.float32)
    markers32 = np.ascontiguousarray(markers, np.int32)
    mask8 = np.ascontiguousarray(mask != 0, np.uint8)
    out = np.empty(image.shape, np.int32)
    lib.tiatpu_watershed(
        image.ctypes.data_as(ctypes.c_void_p),
        markers32.ctypes.data_as(ctypes.c_void_p),
        mask8.ctypes.data_as(ctypes.c_void_p),
        image.shape[0],
        image.shape[1],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def decode_jpeg_batch(
    streams: list[bytes],
    tile_h: int,
    tile_w: int,
    out_ch: int = 3,
    n_threads: int | None = None,
) -> np.ndarray | None:
    """Decode JPEG byte streams in parallel → [n, h, w, c] uint8.

    Returns None when the native library is unavailable or any tile
    fails (caller falls back to the OpenCV path).
    """
    lib = get_library()
    if lib is None or not streams:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 4, len(streams), 16)
    blob = b"".join(streams)
    offsets = np.zeros(len(streams), np.uint64)
    sizes = np.array([len(s) for s in streams], np.uint64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    out = np.zeros((len(streams), tile_h, tile_w, out_ch), np.uint8)
    failures = lib.tiatpu_decode_jpeg_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(streams),
        out.ctypes.data_as(ctypes.c_void_p),
        tile_h,
        tile_w,
        out_ch,
        n_threads,
    )
    if failures:
        logger.warning("Native JPEG decode: %d tile(s) failed.", failures)
        return None
    return out


def lzw_decode(data: bytes, expected_size: int) -> bytes | None:
    """Native TIFF-LZW decode; None when the library is unavailable or
    the stream is malformed (caller falls back to pure Python)."""
    lib = get_library()
    if lib is None:
        return None
    out = np.empty(expected_size, np.uint8)
    n = lib.tiatpu_lzw_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), expected_size
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def packbits_decode(data: bytes, expected_size: int) -> bytes | None:
    """Native PackBits decode; None when unavailable/overflowing."""
    lib = get_library()
    if lib is None:
        return None
    out = np.empty(expected_size, np.uint8)
    n = lib.tiatpu_packbits_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), expected_size
    )
    if n < 0:
        return None
    return out[:n].tobytes()
