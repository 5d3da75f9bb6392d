"""The committed benchmark scripts stay runnable (tiny grids)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def _load_alloc_module():
    spec = importlib.util.spec_from_file_location(
        "annotation_store_alloc",
        REPO_ROOT / "benchmarks" / "annotation_store_alloc.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_cell_polygon_valid() -> None:
    mod = _load_alloc_module()
    poly = mod.cell_polygon((100, 200), seed=3)
    assert poly.area > 0
    x0, y0, x1, y1 = poly.bounds
    assert 0 < x0 < x1 < 250
    assert 100 < y0 < y1 < 350
    # closed ring with the declared point count
    coords = list(poly.exterior.coords)
    assert len(coords) == 20
    assert tuple(coords[0]) == tuple(coords[-1])


def test_alloc_benchmark_runs_all_modes() -> None:
    mod = _load_alloc_module()
    for store in ("dict", "sqlite"):
        for in_memory in (True, False):
            out = mod.run_benchmark((4, 5), store, in_memory=in_memory)
            assert out["n"] == 20
            assert out["peak_mib_psutil"] < 100
            if not (store == "sqlite" and in_memory):
                assert out["file_mib"] is not None
