"""JPEG-2000 codestream tooling: windowed (tile-level) reads, no glymur.

Real-world JP2 WSIs (e.g. Omnyx) ship tile-partitioned codestreams.
The reference reads arbitrary windows through glymur/OpenJPEG
(``/root/reference/tiatoolbox/wsicore/wsireader.py:2516-3120``); this
module reaches the same capability with cv2's OpenJPEG decoder plus
standard J2K *tile extraction transcoding*: each tile's codestream
segments are wrapped in a minimal single-tile codestream (rewritten
SIZ + Isot) and decoded independently. Decoding a tile at absolute
origin (tx0, ty0) is bit-exact because setting
``XOsiz = XTOsiz = tx0`` preserves the tile's absolute coordinate
system, which anchors all DWT/code-block grids.

Also provides the inverse (stitching independently encoded tiles into
one multi-tile codestream) so tests can synthesise tiled JP2s without
an external tiling encoder. Exact when the tile size is a multiple of
``2**levels`` (all grids keep their parity at every DWT level).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import cv2
import numpy as np

SOC = 0xFF4F
SIZ = 0xFF51
COD = 0xFF52
COC = 0xFF53
TLM = 0xFF55
PLM = 0xFF57
QCD = 0xFF5C
QCC = 0xFF5D
RGN = 0xFF5E
POC = 0xFF5F
PPM = 0xFF60
CRG = 0xFF63
COM = 0xFF64
SOT = 0xFF90
SOD = 0xFF93
EOC = 0xFFD9

# main-header segments that stay valid after tile extraction
_KEEP_IN_MAIN = {COD, COC, QCD, QCC, RGN, POC, CRG, COM}


@dataclass
class TilePart:
    """One SOT..(next SOT|EOC) segment of a tile."""

    offset: int  # offset of the SOT marker in the codestream
    length: int  # full tile-part length (Psot)
    tpsot: int


@dataclass
class J2KCodestream:
    """Parsed J2K codestream with a tile index for windowed decoding."""

    data: bytes  # full codestream bytes (SOC..EOC)
    xsiz: int = 0
    ysiz: int = 0
    xosiz: int = 0
    yosiz: int = 0
    xtsiz: int = 0
    ytsiz: int = 0
    xtosiz: int = 0
    ytosiz: int = 0
    n_components: int = 0
    siz_offset: int = 0
    siz_length: int = 0
    main_segments: list = field(default_factory=list)  # (marker, off, seglen)
    tiles: dict = field(default_factory=dict)  # Isot -> [TilePart]
    has_ppm: bool = False

    # -- parsing ------------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes) -> "J2KCodestream":
        if data[:2] != b"\xff\x4f":
            # jp2 container: locate the jp2c box payload
            idx = data.find(b"jp2c")
            if idx < 0:
                msg = "Not a J2K codestream or JP2 container."
                raise ValueError(msg)
            data = data[idx + 4 :]
            soc = data.find(b"\xff\x4f\xff\x51")
            if soc < 0:
                msg = "JP2 container holds no codestream."
                raise ValueError(msg)
            data = data[soc:]
        cs = cls(data=data)
        cs._parse()
        return cs

    def _parse(self) -> None:
        data = self.data
        off = 2  # past SOC
        n = len(data)
        while off + 4 <= n:
            marker = struct.unpack_from(">H", data, off)[0]
            if marker == SOT:
                break
            seglen = struct.unpack_from(">H", data, off + 2)[0]
            if marker == SIZ:
                self.siz_offset = off
                self.siz_length = seglen
                (
                    _rsiz, self.xsiz, self.ysiz, self.xosiz, self.yosiz,
                    self.xtsiz, self.ytsiz, self.xtosiz, self.ytosiz,
                    self.n_components,
                ) = struct.unpack_from(">HIIIIIIIIH", data, off + 4)
            elif marker == PPM:
                self.has_ppm = True
            elif marker in _KEEP_IN_MAIN:
                self.main_segments.append((marker, off, seglen))
            off += 2 + seglen
        # index tile-parts
        while off + 12 <= n:
            marker = struct.unpack_from(">H", data, off)[0]
            if marker == EOC:
                break
            if marker != SOT:
                msg = f"Unexpected marker {marker:04x} in tile stream."
                raise ValueError(msg)
            _lsot, isot, psot, tpsot, _tnsot = struct.unpack_from(
                ">HHIBB", data, off + 2
            )
            if psot == 0:  # last tile-part extends to EOC
                psot = n - 2 - off
            self.tiles.setdefault(isot, []).append(TilePart(off, psot, tpsot))
            off += psot

    # -- tile grid ----------------------------------------------------------

    @property
    def grid_shape(self) -> tuple[int, int]:
        """(tiles_x, tiles_y)."""
        tx = -(-(self.xsiz - self.xtosiz) // self.xtsiz)
        ty = -(-(self.ysiz - self.ytosiz) // self.ytsiz)
        return tx, ty

    @property
    def image_size(self) -> tuple[int, int]:
        """(width, height) of the image area."""
        return self.xsiz - self.xosiz, self.ysiz - self.yosiz

    def tile_bounds(self, index: int) -> tuple[int, int, int, int]:
        """Absolute (x0, y0, x1, y1) of a tile, clipped to the image."""
        tx, _ty = self.grid_shape
        i, j = index % tx, index // tx
        x0 = max(self.xtosiz + i * self.xtsiz, self.xosiz)
        y0 = max(self.ytosiz + j * self.ytsiz, self.yosiz)
        x1 = min(self.xtosiz + (i + 1) * self.xtsiz, self.xsiz)
        y1 = min(self.ytosiz + (j + 1) * self.ytsiz, self.ysiz)
        return x0, y0, x1, y1

    # -- single-tile extraction --------------------------------------------

    @property
    def decomposition_levels(self) -> int:
        """DWT levels from the main-header COD (SPcod byte)."""
        for marker, off, _seglen in self.main_segments:
            if marker == COD:
                # COD: marker(2) Lcod(2) Scod(1) SGcod(4) SPcod levels(1)
                return self.data[off + 9]
        return 5  # spec-common default

    def extract_tile_codestream(self, index: int) -> bytes:
        """Minimal standalone codestream containing only tile ``index``.

        SIZ is rewritten so the image equals the tile rebased to
        origin (0, 0) — cv2's OpenJPEG wrapper rejects non-zero image
        origins. The rebase is bit-exact when the tile origin is a
        multiple of ``2**decomposition_levels`` (every DWT/code-block
        grid keeps its parity), which holds for power-of-two tile
        grids — i.e. all real tiled JP2 WSIs. Raises otherwise.
        """
        if self.has_ppm:
            msg = "PPM (packed packet headers) unsupported for extraction."
            raise ValueError(msg)
        if index not in self.tiles:
            msg = f"Tile {index} absent from codestream."
            raise KeyError(msg)
        x0, y0, x1, y1 = self.tile_bounds(index)
        align = 1 << self.decomposition_levels
        if x0 % align or y0 % align:
            msg = (
                f"Tile origin ({x0}, {y0}) not aligned to 2^levels={align}; "
                "origin rebase would change DWT grids."
            )
            raise ValueError(msg)
        data = self.data
        out = bytearray(b"\xff\x4f")  # SOC
        # rewritten SIZ: image == this tile at origin 0, single-tile grid
        siz = bytearray(data[self.siz_offset : self.siz_offset + 2 + self.siz_length])
        struct.pack_into(">IIIIIIII", siz, 6, x1 - x0, y1 - y0, 0, 0,
                         max(x1 - x0, 1), max(y1 - y0, 1), 0, 0)
        out += siz
        for _marker, off, seglen in self.main_segments:
            out += data[off : off + 2 + seglen]
        for part in self.tiles[index]:
            seg = bytearray(data[part.offset : part.offset + part.length])
            struct.pack_into(">H", seg, 4, 0)  # Isot -> 0
            struct.pack_into(">I", seg, 6, part.length)  # explicit Psot
            out += seg
        out += b"\xff\xd9"  # EOC
        return bytes(out)

    def decode_tile(self, index: int, reduce: int = 1) -> np.ndarray:
        """Decode one tile (RGB/grey uint8), optionally at 1/reduce scale.

        Decoded tiles are LRU-cached (64 MB) — grid reads touch each
        tile a handful of times.
        """
        cache = self.__dict__.setdefault("_tile_cache", {})
        key = (index, reduce)
        if key in cache:
            return cache[key]
        img = self._decode_tile_uncached(index, reduce)
        cache[key] = img
        while sum(v.nbytes for v in cache.values()) > (64 << 20) and len(cache) > 1:
            cache.pop(next(iter(cache)))
        return img

    def _decode_tile_uncached(self, index: int, reduce: int) -> np.ndarray:
        mini = np.frombuffer(self.extract_tile_codestream(index), np.uint8)
        grey = self.n_components == 1
        flags = {
            1: cv2.IMREAD_GRAYSCALE if grey else cv2.IMREAD_COLOR,
            2: cv2.IMREAD_REDUCED_GRAYSCALE_2 if grey else cv2.IMREAD_REDUCED_COLOR_2,
            4: cv2.IMREAD_REDUCED_GRAYSCALE_4 if grey else cv2.IMREAD_REDUCED_COLOR_4,
            8: cv2.IMREAD_REDUCED_GRAYSCALE_8 if grey else cv2.IMREAD_REDUCED_COLOR_8,
        }[reduce]
        img = cv2.imdecode(mini, flags)
        if img is None:
            msg = f"OpenJPEG failed to decode extracted tile {index}."
            raise ValueError(msg)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img

    def read_region(
        self, location: tuple[int, int], size: tuple[int, int], reduce: int = 1
    ) -> np.ndarray:
        """Decode a window (image-area coords at full res) via its tiles.

        Returns the window at 1/reduce scale (ceil semantics per tile,
        matching OpenJPEG's reduced decode).
        """
        x, y = location
        w, h = size
        gx0 = self.xosiz + x
        gy0 = self.yosiz + y
        gx1, gy1 = gx0 + w, gy0 + h
        tx, ty = self.grid_shape
        i0 = max((gx0 - self.xtosiz) // self.xtsiz, 0)
        j0 = max((gy0 - self.ytosiz) // self.ytsiz, 0)
        i1 = min(-(-(gx1 - self.xtosiz) // self.xtsiz), tx)
        j1 = min(-(-(gy1 - self.ytosiz) // self.ytsiz), ty)
        out_w = -(-w // reduce)
        out_h = -(-h // reduce)
        channels = 1 if self.n_components == 1 else 3
        shape = (out_h, out_w, channels) if channels > 1 else (out_h, out_w)
        out = np.zeros(shape, np.uint8)
        for j in range(j0, j1):
            for i in range(i0, i1):
                index = j * tx + i
                tile = self.decode_tile(index, reduce=reduce)
                tx0, ty0, _tx1, _ty1 = self.tile_bounds(index)
                # overlap in full-res absolute coords
                ox0, oy0 = max(gx0, tx0), max(gy0, ty0)
                ox1 = min(gx1, _tx1)
                oy1 = min(gy1, _ty1)
                if ox1 <= ox0 or oy1 <= oy0:
                    continue
                # reduced-scale slices: output pixel d samples absolute
                # position gx0 + d*reduce and is filled from the tile
                # containing that position, so source and dest rounding
                # share one grid — no 1-px seam misregistration when the
                # window origin is not a multiple of `reduce`.
                dx0 = max(-(-(ox0 - gx0) // reduce), 0)
                dy0 = max(-(-(oy0 - gy0) // reduce), 0)
                dx1 = min(-(-(ox1 - gx0) // reduce), out_w)
                dy1 = min(-(-(oy1 - gy0) // reduce), out_h)
                if dx1 <= dx0 or dy1 <= dy0:
                    continue
                sx0 = (gx0 + dx0 * reduce - tx0) // reduce
                sy0 = (gy0 + dy0 * reduce - ty0) // reduce
                sw = min(dx1 - dx0, tile.shape[1] - sx0)
                sh = min(dy1 - dy0, tile.shape[0] - sy0)
                if sw <= 0 or sh <= 0:
                    continue
                out[dy0 : dy0 + sh, dx0 : dx0 + sw] = tile[
                    sy0 : sy0 + sh, sx0 : sx0 + sw
                ]
        return out


# -- synthesis: stitch independent tile encodes into one codestream --------


def _codestream_parts(data: bytes):
    """(siz_segment, main_segments_bytes, tile_part_bytes) of a
    single-tile encode."""
    cs = J2KCodestream.from_bytes(data)
    siz = cs.data[cs.siz_offset : cs.siz_offset + 2 + cs.siz_length]
    main = b"".join(
        cs.data[off : off + 2 + seglen] for _m, off, seglen in cs.main_segments
    )
    (part,) = cs.tiles[0]
    body = cs.data[part.offset : part.offset + part.length]
    return siz, main, body, cs


def encode_tiled_j2k(
    image: np.ndarray, tile_size: int = 256, quality: int | None = None
) -> bytes:
    """Encode an RGB/grey image as a MULTI-TILE J2K codestream.

    Each tile is encoded independently with cv2/OpenJPEG and stitched
    into one codestream (shared main header; per-tile COD/QCD copied
    into each tile-part header). ``tile_size`` must be a multiple of
    64 (2**levels for OpenJPEG's default 6 DWT levels) so absolute
    grids keep parity.
    """
    if tile_size % 64:
        msg = "tile_size must be a multiple of 64."
        raise ValueError(msg)
    h, w = image.shape[:2]
    params = [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, quality] if quality else []
    tiles_x = -(-w // tile_size)
    tiles_y = -(-h // tile_size)
    out = bytearray(b"\xff\x4f")
    first = True
    index = 0
    for j in range(tiles_y):
        for i in range(tiles_x):
            x0, y0 = i * tile_size, j * tile_size
            tile = image[y0 : min(y0 + tile_size, h), x0 : min(x0 + tile_size, w)]
            bgr = (
                cv2.cvtColor(tile, cv2.COLOR_RGB2BGR) if tile.ndim == 3 else tile
            )
            ok, buf = cv2.imencode(".jp2", bgr, params)
            if not ok:  # pragma: no cover
                msg = "cv2 JPEG2000 encode failed."
                raise RuntimeError(msg)
            siz, main, body, _cs = _codestream_parts(bytes(buf.flatten()))
            if first:
                # full-image SIZ with the tile grid; COD/QCD are
                # mandatory in the main header (defaults; each
                # tile-part also carries its own overrides)
                siz = bytearray(siz)
                struct.pack_into(
                    ">IIIIIIII", siz, 6, w, h, 0, 0, tile_size, tile_size, 0, 0
                )
                out += siz + main
                first = False
            # tile-part: SOT + per-tile COD/QCD (+COM etc.) + SOD + data
            # (the SOT is rebuilt from scratch below — the original
            # fields are not consulted)
            sod_index = body.find(b"\xff\x93")
            packet_data = body[sod_index:]
            tile_part_len = 12 + len(main) + len(packet_data)
            sot = struct.pack(">HHHIBB", SOT, 10, index, tile_part_len, 0, 1)
            out += sot + main + packet_data
            index += 1
    out += b"\xff\xd9"
    return bytes(out)


def write_tiled_jp2(
    path: str | Path,
    image: np.ndarray,
    tile_size: int = 256,
    quality: int | None = None,
) -> Path:
    """Write a tiled raw-codestream .jp2 file for tests."""
    path = Path(path)
    path.write_bytes(encode_tiled_j2k(image, tile_size, quality))
    return path
