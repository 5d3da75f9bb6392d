"""Annotation-store memory/size benchmark.

Mirrors the reference's only quantified in-repo benchmark
(``benchmarks/annotation_store_alloc.py``): generate a grid of
cell-polygon annotations, append them to a store, and report the
process peak memory delta (psutil) and the on-disk size.

Usage::

    python benchmarks/annotation_store_alloc.py [-S 100 100]
        [-s dict|sqlite] [-m]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def cell_polygon(x: float, y: float, n_points: int = 20, radius: float = 8.0):
    from tiatoolbox_tpu.annotation.geometry import Polygon

    rng = np.random.default_rng(int(x) * 7919 + int(y))
    angles = np.linspace(0, 2 * math.pi, n_points, endpoint=False)
    radii = radius * (0.75 + 0.5 * rng.random(n_points))
    pts = np.stack(
        [x + radii * np.cos(angles), y + radii * np.sin(angles)], axis=-1
    )
    return Polygon(pts)


def rss_mib() -> float:
    import psutil

    return psutil.Process(os.getpid()).memory_info().rss / 2**20


def main() -> None:
    from tiatoolbox_tpu.annotation.storage import (
        Annotation,
        DictionaryStore,
        SQLiteStore,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("-S", "--size", nargs=2, type=int, default=(100, 100))
    parser.add_argument(
        "-s", "--store", choices=("dict", "sqlite"), default="sqlite"
    )
    parser.add_argument("-m", "--in-memory", action="store_true")
    args = parser.parse_args()

    nx, ny = args.size
    path = None
    if args.in_memory:
        store = DictionaryStore() if args.store == "dict" else SQLiteStore()
    else:
        suffix = ".ndjson" if args.store == "dict" else ".db"
        path = Path(tempfile.mkstemp(suffix=suffix)[1])
        store = (
            DictionaryStore(path)
            if args.store == "dict"
            else SQLiteStore(path)
        )

    before = rss_mib()
    annotations = [
        Annotation(cell_polygon(x * 25 + 12, y * 25 + 12), {"class": int(x % 5)})
        for y in range(ny)
        for x in range(nx)
    ]
    store.append_many(annotations)
    store.commit()
    after = rss_mib()

    print(f"store={args.store} in_memory={args.in_memory} n={nx * ny}")
    print(f"peak RSS delta: {after - before:.1f} MiB")
    if path is not None:
        if args.store == "dict":
            store.dump(path)
        print(f"on-disk size: {path.stat().st_size / 2**20:.2f} MiB")
        path.unlink(missing_ok=True)


if __name__ == "__main__":
    main()
