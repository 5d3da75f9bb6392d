"""Shared type aliases (analogue of reference ``tiatoolbox/type_hints.py``)."""

from __future__ import annotations

from typing import Literal, Sequence, Union

import numpy as np

Resolution = Union[float, int, Sequence[float], np.ndarray]
Units = Literal["mpp", "power", "level", "baseline"]
IntPair = Union[Sequence[int], np.ndarray]
IntBounds = Union[Sequence[int], np.ndarray]
NumPair = Union[Sequence[float], np.ndarray]
