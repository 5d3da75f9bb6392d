"""Memory / file-size benchmark for the annotation stores.

Counterpart of the reference's only committed in-repo performance
artifact (``/root/reference/benchmarks/annotation_store_alloc.py``):
build a WxH grid of fake 20-point cell-boundary polygons, append them
one by one to a store, and record peak process memory (psutil RSS,
child-process isolated) and on-disk file size. Same protocol — grid of
cells spaced 100 apart, ellipsoid boundaries with noise — over OUR
geometry/store stack (own WKB codec + R*Tree SQLite schema instead of
Shapely + reference schema). memray is not available in this
environment, so only the psutil column is produced.

Reference's committed numbers for a 100x100 grid (10k annotations),
peak MiB psutil/memray:

| store  | in-memory | on-disk   |   file MiB |
| ------ | --------- | --------- | ---------- |
| dict   | 21.0/18.0 | 24.2/19.0 |       9.02 |
| sqlite | 16.8/6.4  |  6.8/2.7  |       5.34 |

Measured here (this checkout, run via ``python
benchmarks/annotation_store_alloc.py --all``; psutil only):
see ``RESULTS.md`` next to this file for the recorded table.

Command line:

```
python benchmarks/annotation_store_alloc.py -S 100 100 -s sqlite -m
python benchmarks/annotation_store_alloc.py --all   # full table
```
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
from pathlib import Path
from tempfile import TemporaryDirectory

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def cell_polygon(
    xy: tuple[float, float],
    n_points: int = 20,
    radius: float = 8,
    noise: float = 0.01,
    eccentricity: tuple[float, float] = (1, 3),
    seed: int = 0,
):
    """Fake cell boundary: noisy, rotated, eccentric ellipse.

    Mirrors the generator used by the reference benchmark
    (``benchmarks/annotation_store_alloc.py:157-220`` there) so the
    workloads are comparable annotation-for-annotation.
    """
    from tiatoolbox_tpu.annotation.geometry import Polygon

    rng = np.random.default_rng(seed)
    x, y = xy
    n_free = n_points - 1  # last point repeats the first
    alpha = np.linspace(0, 2 * np.pi - (2 * np.pi / n_free), n_free)
    rx = radius * (rng.random() + 0.5)
    ry = rx * rng.uniform(*eccentricity)
    curve_x = x + rx * np.cos(alpha)
    curve_y = y + ry * np.sin(alpha)
    boundary = np.stack([curve_x, curve_y], axis=1)
    boundary += rng.normal(0, noise * radius, boundary.shape)
    theta = rng.uniform(0, 2 * np.pi)
    rot = np.array(
        [[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]]
    )
    centre = np.array([x, y])
    boundary = (boundary - centre) @ rot.T + centre
    coords = np.vstack([boundary, boundary[:1]])
    return Polygon([tuple(p) for p in coords])


class _PeakRssSampler:
    """Background thread tracking the true RSS high-water mark.

    The reference column is a PEAK (memray / psutil polling); an
    end-minus-start delta under-reports stores whose transients are
    freed before commit returns, so this samples RSS at ~1 kHz for the
    duration of the run.
    """

    def __init__(self, proc, interval: float = 0.001) -> None:
        import threading

        self._proc = proc
        self._interval = interval
        self.peak = proc.memory_info().rss
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            rss = self._proc.memory_info().rss
            if rss > self.peak:
                self.peak = rss
            self._stop.wait(self._interval)

    def __enter__(self) -> "_PeakRssSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()
        rss = self._proc.memory_info().rss
        if rss > self.peak:
            self.peak = rss


def run_benchmark(size: tuple[int, int], store: str, *, in_memory: bool) -> dict:
    """Append a size[0] x size[1] grid of cells; report peak RSS + file size."""
    import psutil

    from tiatoolbox_tpu.annotation.storage import (
        Annotation,
        DictionaryStore,
        SQLiteStore,
    )

    proc = psutil.Process(os.getpid())
    cls = {"dict": DictionaryStore, "sqlite": SQLiteStore}[store]

    with TemporaryDirectory() as tmp:
        path = Path(tmp) / f"store.{'db' if store == 'sqlite' else 'json'}"
        target = ":memory:" if in_memory else str(path)

        rss_before = proc.memory_info().rss
        with _PeakRssSampler(proc) as sampler:
            st = cls(target)
            w, h = size
            for i in range(w):
                for j in range(h):
                    poly = cell_polygon((100 * i, 100 * j), seed=i * h + j)
                    st.append(Annotation(poly, {"class": (i * h + j) % 4}))
            st.commit()

        if in_memory and store == "dict":
            # reference writes the in-memory dict store out to measure
            # serialized size; on-disk runs measure the live file
            st.dump(str(path))
        file_mib = path.stat().st_size / 2**20 if path.exists() else None
        peak_mib = (sampler.peak - rss_before) / 2**20
    return {
        "store": store,
        "in_memory": in_memory,
        "n": size[0] * size[1],
        "peak_mib_psutil": round(peak_mib, 2),
        "file_mib": round(file_mib, 2) if file_mib is not None else None,
    }


def run_isolated(size: tuple[int, int], store: str, *, in_memory: bool) -> dict:
    """Run one benchmark in a child process (clean-RSS measurement)."""
    args = [
        sys.executable,
        __file__,
        "-S",
        str(size[0]),
        str(size[1]),
        "-s",
        store,
        "--json",
    ]
    if in_memory:
        args.append("-m")
    out = subprocess.run(
        args, capture_output=True, text=True, check=True, cwd=str(REPO_ROOT)
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def full_table(size: tuple[int, int]) -> None:
    rows = []
    for store in ("dict", "sqlite"):
        for in_memory in (True, False):
            rows.append(run_isolated(size, store, in_memory=in_memory))
    n = size[0] * size[1]
    print(f"\n{n} annotations ({size[0]}x{size[1]} grid), peak MiB (psutil):\n")
    print("| store  | mode      | peak MiB | file MiB |")
    print("| ------ | --------- | -------- | -------- |")
    for r in rows:
        mode = "in-memory" if r["in_memory"] else "on-disk"
        file_s = "-" if r["file_mib"] is None else f"{r['file_mib']:.2f}"
        print(f"| {r['store']:<6} | {mode:<9} | {r['peak_mib_psutil']:>8.2f} | {file_s:>8} |")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-S", "--size", type=int, nargs=2, default=(100, 100))
    parser.add_argument("-s", "--store", choices=("dict", "sqlite"), default="dict")
    parser.add_argument("-m", "--in-memory", action="store_true")
    parser.add_argument("--json", action="store_true", help="one JSON line out")
    parser.add_argument("--all", action="store_true", help="full table, isolated runs")
    args = parser.parse_args()
    if args.all:
        full_table(tuple(args.size))
        return
    result = run_benchmark(tuple(args.size), args.store, in_memory=args.in_memory)
    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
