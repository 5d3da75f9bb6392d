"""Region-once wire transfer: ship decoded slide bands, patchify on device.

For overlapping patch grids (stride < patch), the per-patch feed ships
every overlapped pixel (patch/stride)^2 times over the host→device link
— 1.78x per axis for the reference segmentor defaults (patch 256,
stride 192; grid math contract: reference ``tools/patchextraction.py:
488-614``). This module ships each decoded region row ONCE as a uint8
band and extracts the overlapping patches on device with
``lax.dynamic_slice`` inside a jitted program, cutting wire bytes to
~(band_h / unique_rows) ≈ 1.0-1.1x of the slide pixels.

Host side: :class:`BandPlan` groups a regular patch grid into horizontal
bands sized to a byte budget. Device side: :func:`extract_patches` is a
shape-keyed jitted gather of B patches from a band.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np


@functools.lru_cache(maxsize=32)
def _extract_program(patch_h: int, patch_w: int):
    import jax
    from jax import lax

    @jax.jit
    def extract(band, starts):
        def one(s):
            return lax.dynamic_slice(
                band, (s[0], s[1], 0), (patch_h, patch_w, band.shape[-1])
            )

        return jax.vmap(one)(starts)

    return extract


def extract_patches(band, starts_yx, patch_hw: tuple[int, int]):
    """Gather ``[B, ph, pw, C]`` patches from a device-resident band.

    Args:
        band: [H, W, C] device array (any dtype; uint8 on the wire).
        starts_yx: [B, 2] int32 top-left (y, x) offsets, in-bounds
            (callers clip; pair with a validity mask for padded rows).
        patch_hw: static (height, width) of every patch.
    """
    import jax.numpy as jnp

    return _extract_program(int(patch_hw[0]), int(patch_hw[1]))(
        band, jnp.asarray(starts_yx, jnp.int32)
    )


@dataclass
class Band:
    """One horizontal slice of the read plan."""

    read_x: int  # band origin in read-resolution coords (may be <0)
    read_y: int
    band_w: int  # static read size (same for every band)
    band_h: int
    ds_indices: np.ndarray  # dataset indices of the patches in this band
    starts_local: np.ndarray  # [n, 2] int32 (y, x) offsets within the band


@dataclass
class BandPlan:
    """Band decomposition of a REGULAR patch grid.

    Eligibility is the caller's job in part (no mask-filtered holes if
    index reconstruction is to hold); :func:`BandPlan.build` returns
    None when the grid is not a complete x-fastest mesh or the bands
    would not beat the per-patch wire cost.
    """

    patch_h: int
    patch_w: int
    bands: list[Band] = field(default_factory=list)

    @property
    def wire_pixels(self) -> int:
        return sum(b.band_w * b.band_h for b in self.bands)

    @staticmethod
    def build(
        inputs: np.ndarray,
        patch_wh: tuple[int, int],
        stride_wh: tuple[int, int],
        max_band_bytes: int = 96 * 1024 * 1024,
        bytes_per_pixel: int = 3,
        min_bands: int = 6,
    ) -> "BandPlan | None":
        """Plan bands for the grid ``inputs`` ([x0, y0, x1, y1] rows).

        The grid must be the complete x-fastest meshgrid produced by
        ``PatchExtractor.get_coordinates`` (uniform patch size, uniform
        strides both axes). Returns None if it is not, or if banding
        would ship MORE pixels than the per-patch feed (stride >= patch:
        no overlap to save).

        ``min_bands`` targets a minimum band COUNT (not just a byte
        cap): a single band serializes decode→wire→dispatch→fetch
        (nothing to overlap), so the planner splits the grid into at
        least this many bands when there are enough patch rows — each
        extra band costs only a (patch-stride)-row halo re-read. The
        per-patch wire check below still rejects plans whose halos
        outweigh the overlap saving.
        """
        inputs = np.asarray(inputs)
        pw, ph = int(patch_wh[0]), int(patch_wh[1])
        sw, sh = int(stride_wh[0]), int(stride_wh[1])
        if len(inputs) == 0:
            return None
        sizes = inputs[:, 2:] - inputs[:, :2]
        if not np.all(sizes == (pw, ph)):
            return None
        xs = np.unique(inputs[:, 0])
        ys = np.unique(inputs[:, 1])
        if len(xs) * len(ys) != len(inputs):
            return None
        # complete x-fastest mesh with uniform strides
        if len(xs) > 1 and not np.all(np.diff(xs) == sw):
            return None
        if len(ys) > 1 and not np.all(np.diff(ys) == sh):
            return None
        expect = np.stack(
            [np.tile(xs, len(ys)), np.repeat(ys, len(xs))], axis=-1
        )
        if not np.array_equal(inputs[:, :2], expect):
            return None
        if sh >= ph and sw >= pw:
            return None  # no overlap: per-patch feed already ships once
        x_min = int(xs[0])
        band_w = int(xs[-1]) + pw - x_min
        n_cols = len(xs)
        # rows per band from the byte budget (>=1); every band reads the
        # same static (band_h, band_w) so one compiled program serves all
        rows_fit = max(
            1,
            (max_band_bytes // (band_w * bytes_per_pixel) - (ph - sh)) // sh,
        )
        # band count target: pipeline depth first, byte budget as a cap
        rows_target = (
            max(1, -(-len(ys) // max(1, int(min_bands))))
            if min_bands
            else len(ys)
        )

        def make_plan(rows_per_band: int) -> "BandPlan":
            band_h = (rows_per_band - 1) * sh + ph
            plan = BandPlan(patch_h=ph, patch_w=pw)
            for r0 in range(0, len(ys), rows_per_band):
                band_ys = ys[r0 : r0 + rows_per_band]
                read_y = int(band_ys[0])
                starts = []
                ds_idx = []
                for ri, y in enumerate(band_ys):
                    row = r0 + ri
                    for ci, x in enumerate(xs):
                        ds_idx.append(row * n_cols + ci)
                        starts.append((int(y) - read_y, int(x) - x_min))
                plan.bands.append(
                    Band(
                        read_x=x_min,
                        read_y=read_y,
                        band_w=band_w,
                        band_h=band_h,
                        ds_indices=np.asarray(ds_idx, np.int64),
                        starts_local=np.asarray(starts, np.int32),
                    )
                )
            return plan

        per_patch_pixels = len(inputs) * pw * ph
        for rows_per_band in dict.fromkeys(
            (
                min(int(rows_fit), len(ys), rows_target),
                min(int(rows_fit), len(ys)),
            )
        ):
            plan = make_plan(rows_per_band)
            # enforce the documented guarantee: never ship MORE pixels
            # than the per-patch feed (possible with one-axis overlap +
            # gaps on the other axis, or when min_bands halos outweigh
            # the overlap saving) — fall back to the byte-budget-maximal
            # plan before giving up entirely.
            if plan.wire_pixels < per_patch_pixels:
                return plan
        return None
