"""WSI I/O core: metadata, readers, and the tiling contract."""

from __future__ import annotations

from numbers import Number
from typing import TypedDict

from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta  # noqa: F401


class WSIReaderParams(TypedDict, total=False):
    """Parameters for reading whole slide images (reference
    ``wsicore/__init__.py:17``)."""

    meta: WSIMeta | None
    mpp: tuple[Number, Number] | Number
    power: Number
