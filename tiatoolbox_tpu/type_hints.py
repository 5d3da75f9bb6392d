"""Shared type aliases (reference ``type_hints.py:1-40``).

Geometry aliases bind to the in-package geometry library instead of
Shapely.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Literal, SupportsFloat, Union

import numpy as np

from tiatoolbox_tpu.annotation.geometry import LineString, Point, Polygon

JSON = Union[dict, list, str, int, float, bool, None]
NumPair = tuple[SupportsFloat, SupportsFloat]
IntPair = tuple[int, int]

Resolution = Union[SupportsFloat, NumPair, np.ndarray, Sequence[SupportsFloat]]
Units = Literal["mpp", "power", "baseline", "level"]
Bounds = tuple[SupportsFloat, SupportsFloat, SupportsFloat, SupportsFloat]
IntBounds = tuple[int, int, int, int]

Geometry = Union[Point, LineString, Polygon]
Properties = JSON
QueryGeometry = Union[Bounds, Geometry]
CallablePredicate = Callable[[dict], bool]
CallableSelect = Callable[[dict], dict]
Predicate = Union[str, bytes, CallablePredicate]
Select = Union[str, bytes, CallableSelect]

NumpyPadLiteral = Literal[
    "constant",
    "edge",
    "linear_ramp",
    "maximum",
    "mean",
    "median",
    "minimum",
    "reflect",
    "symmetric",
    "wrap",
    "empty",
]
