"""Query-latency benchmark for the annotation stores.

Counterpart of the reference's interactive benchmark notebooks
(``/root/reference/benchmarks/annotation_store.ipynb`` parts 1.1-1.4 —
append, box query, polygon query, predicate query — and
``annotation_nquery.ipynb`` — neighbourhood queries). The reference
commits no numbers from those notebooks; this script produces a
recorded table (see ``RESULTS.md``) over the same cell-polygon grid
workload as ``annotation_store_alloc.py``.

Timed operations per backend (dict / sqlite):

- append: one-by-one ``append`` of N annotations (+ ``append_many``)
- bquery: bounding-box query over a 1000x1000 window (bbox only)
- query-poly: full geometry query with a polygon region
- pquery: predicate query ``props["class"] == 0`` over the window
- pquery-complex: compound predicate with arithmetic + comparison
- nquery: proximate-pair search within radius 150 over a sub-grid

Command line:

```
python benchmarks/annotation_query.py -S 100 100 -s sqlite
python benchmarks/annotation_query.py --all          # full table
```
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from annotation_store_alloc import cell_polygon  # noqa: E402


def _timed(fn, *, repeats: int = 3):
    """Best-of-``repeats`` wall seconds and the last result."""
    best = float("inf")
    result = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn()
        best = min(best, time.perf_counter() - t0)
    return best, result


def run_benchmark(size: tuple[int, int], store: str) -> dict:
    from tiatoolbox_tpu.annotation.geometry import Polygon
    from tiatoolbox_tpu.annotation.storage import (
        Annotation,
        DictionaryStore,
        SQLiteStore,
    )

    cls = {"dict": DictionaryStore, "sqlite": SQLiteStore}[store]
    w, h = size
    n = w * h
    anns = [
        Annotation(
            cell_polygon((100 * i, 100 * j), seed=i * h + j),
            {"class": (i * h + j) % 4, "n": i * h + j},
        )
        for i in range(w)
        for j in range(h)
    ]

    st = cls(":memory:")
    t_append, _ = _timed(lambda: [st.append(a) for a in anns], repeats=1)
    st2 = cls(":memory:")
    t_bulk, _ = _timed(lambda: st2.append_many(anns), repeats=1)

    # a window covering ~10x10 cells, placed at 20% of the grid extent
    wx0, wy0 = 100 * (w // 5), 100 * (h // 5)
    wx1, wy1 = wx0 + 100 * min(10, w), wy0 + 100 * min(10, h)
    window = (wx0, wy0, wx1, wy1)
    poly = Polygon(
        [(wx0, wy0), (wx1, wy0 + 100), (wx1 - 100, wy1),
         (wx0 + 100, wy1 - 100), (wx0, wy0)]
    )

    t_bquery, boxes = _timed(lambda: st.bquery(window))
    t_query, geoms = _timed(lambda: st.query(window))
    t_qpoly, in_poly = _timed(lambda: st.query(poly))
    t_pquery, cls0 = _timed(
        lambda: st.query(window, where='props["class"] == 0')
    )
    t_pcomplex, pcx = _timed(
        lambda: st.query(
            window, where='(props["n"] % 4 == 1) & (props["n"] > 40)'
        )
    )
    # neighbourhood query on a sub-window (nquery is O(k^2-ish); keep
    # the candidate set ~100 cells as the reference notebook does)
    t_nquery, pairs = _timed(
        lambda: st.nquery(
            where='props["class"] == 0',
            distance=150,
            geometry_predicate="bbox_intersects",
        ),
        repeats=1,
    )
    t_nq_boxpoint, bp_pairs = _timed(
        lambda: st.nquery(
            where='props["class"] == 0', distance=150,
            mode="boxpoint-boxpoint",
        ),
        repeats=1,
    )
    t_nq_boxbox, bb_pairs = _timed(
        lambda: st.nquery(
            where='props["class"] == 0', distance=150, mode="box-box"
        ),
        repeats=1,
    )

    return {
        "store": store,
        "n": n,
        "append_s": round(t_append, 4),
        "append_many_s": round(t_bulk, 4),
        "bquery_ms": round(t_bquery * 1e3, 2),
        "bquery_hits": len(boxes),
        "query_box_ms": round(t_query * 1e3, 2),
        "query_poly_ms": round(t_qpoly * 1e3, 2),
        "query_poly_hits": len(in_poly),
        "pquery_ms": round(t_pquery * 1e3, 2),
        "pquery_hits": len(cls0),
        "pquery_complex_ms": round(t_pcomplex * 1e3, 2),
        "pquery_complex_hits": len(pcx),
        "nquery_s": round(t_nquery, 3),
        "nquery_hits": len(pairs),
        "nquery_boxpoint_s": round(t_nq_boxpoint, 3),
        "nquery_boxpoint_hits": len(bp_pairs),
        "nquery_boxbox_s": round(t_nq_boxbox, 3),
        "nquery_boxbox_hits": len(bb_pairs),
    }


def run_isolated(size: tuple[int, int], store: str) -> dict:
    args = [
        sys.executable, __file__,
        "-S", str(size[0]), str(size[1]),
        "-s", store, "--json",
    ]
    out = subprocess.run(
        args, capture_output=True, text=True, check=True, cwd=str(REPO_ROOT)
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def full_table(size: tuple[int, int]) -> None:
    rows = [run_isolated(size, store) for store in ("dict", "sqlite")]
    n = size[0] * size[1]
    print(f"\n{n} annotations ({size[0]}x{size[1]} grid), best-of-3:\n")
    cols = [k for k in rows[0] if k not in ("store", "n")]
    print("| metric | " + " | ".join(r["store"] for r in rows) + " |")
    print("| ------ | " + " | ".join("---" for _ in rows) + " |")
    for c in cols:
        print(f"| {c} | " + " | ".join(str(r[c]) for r in rows) + " |")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-S", "--size", type=int, nargs=2, default=(100, 100))
    parser.add_argument("-s", "--store", choices=("dict", "sqlite"), default="sqlite")
    parser.add_argument("--json", action="store_true", help="one JSON line out")
    parser.add_argument("--all", action="store_true", help="full table, isolated runs")
    args = parser.parse_args()
    if args.all:
        full_table(tuple(args.size))
        return
    result = run_benchmark(tuple(args.size), args.store)
    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
