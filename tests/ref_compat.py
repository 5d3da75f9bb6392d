"""Import helper: load reference tiatoolbox modules with stubbed deps.

Used by parity tests to compare numerics against the actual reference
implementation (its heavy native deps are absent in this environment;
the algorithms under test only need numpy/cv2/sklearn/scipy).
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import sys
import types

REFERENCE_PATH = "/root/reference"

_REAL_TOPLEVEL = {
    "numpy", "cv2", "scipy", "sklearn", "yaml", "torch", "pandas", "PIL",
    "tqdm", "requests", "fsspec", "psutil", "matplotlib", "jax", "flax",
    "tiatoolbox", "tiatoolbox_tpu",
}


class _AnyAttrModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _AnyAttrModule(f"{self.__name__}.{name}")

    def __call__(self, *args, **kwargs):
        return self

    def __mro_entries__(self, bases):  # allow subclassing stubs
        # drop the stub base entirely: keeps real mixin bases working
        # (e.g. class X(TimmStub, RealMixin) -> class X(RealMixin))
        return ()


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        module = _AnyAttrModule(spec.name)
        module.__file__ = f"<stub {spec.name}>"
        module.__path__ = []
        return module

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Stub top-level packages that are genuinely absent.

    Never touches submodules of packages that exist for real (a
    missing-attribute fallback import inside a real package must raise
    ImportError, not produce a stub).
    """

    def __init__(self) -> None:
        self._top_missing: dict[str, bool] = {}

    def _is_missing(self, top: str) -> bool:
        if top in self._top_missing:
            return self._top_missing[top]
        missing = True
        for finder in sys.meta_path:
            if isinstance(finder, _StubFinder):
                continue
            try:
                if finder.find_spec(top, None) is not None:
                    missing = False
                    break
            except (ImportError, AttributeError, ValueError):
                continue
        self._top_missing[top] = missing
        return missing

    def find_spec(self, fullname, path=None, target=None):
        top = fullname.split(".")[0]
        if top in _REAL_TOPLEVEL or top.startswith("_"):
            return None
        existing = sys.modules.get(top)
        if existing is not None and not isinstance(existing, _AnyAttrModule):
            return None  # real package; let its own imports fail honestly
        if not self._is_missing(top):
            return None
        return importlib.machinery.ModuleSpec(fullname, _StubLoader())


_installed = False


def install() -> None:
    """Install the stub finder + reference path (idempotent)."""
    global _installed  # noqa: PLW0603
    if _installed:
        return
    # import real heavy deps BEFORE stubbing so their own optional-import
    # probes see genuine ImportErrors rather than stubs
    import scipy.cluster.hierarchy  # noqa: F401
    import scipy.ndimage  # noqa: F401
    import scipy.optimize  # noqa: F401
    import scipy.spatial  # noqa: F401
    import sklearn.decomposition  # noqa: F401
    import torch  # noqa: F401
    import torch._dynamo  # noqa: F401 - pulls sympy before stubbing

    try:
        import requests  # noqa: F401
    except ImportError:  # pragma: no cover
        pass
    try:  # the reference's sam.py pulls transformers; load it for real
        from transformers.models.sam import modeling_sam  # noqa: F401
    except ImportError:  # pragma: no cover
        pass

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    sys.meta_path.append(_StubFinder())
    _install_real_shims()
    _installed = True


def _install_real_shims() -> None:
    """Give stubbed modules the handful of real functions the
    algorithms under test actually call."""
    import importlib

    import numpy as np

    exposure = importlib.import_module("skimage.exposure")

    def rescale_intensity(image, in_range=None, out_range=None):
        lo, hi = in_range
        out_lo, out_hi = out_range if out_range is not None else (0.0, 1.0)
        clipped = np.clip(image.astype(np.float64), lo, hi)
        if hi > lo:
            clipped = (clipped - lo) / (hi - lo)
        return clipped * (out_hi - out_lo) + out_lo

    exposure.rescale_intensity = rescale_intensity

    filters = importlib.import_module("skimage.filters")

    def threshold_otsu(image, nbins=256):
        # Faithful re-statement of skimage's Otsu: maximise inter-class
        # variance over a 256-bin histogram of the input values.
        values = np.asarray(image).ravel()
        counts, bin_edges = np.histogram(values, bins=nbins)
        centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
        counts = counts.astype(np.float64)
        w1 = np.cumsum(counts)
        w2 = np.cumsum(counts[::-1])[::-1]
        m1 = np.cumsum(counts * centers) / np.maximum(w1, 1e-12)
        m2 = (np.cumsum((counts * centers)[::-1]) / np.maximum(w2[::-1], 1e-12))[::-1]
        var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
        return centers[:-1][np.argmax(var12)]

    filters.threshold_otsu = threshold_otsu
