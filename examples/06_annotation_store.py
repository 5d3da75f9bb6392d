"""Spatially-indexed annotation stores + query DSL
(reference: annotation-store notebook)."""

import numpy as np

from tiatoolbox_tpu.annotation.geometry import Point, Polygon
from tiatoolbox_tpu.annotation.storage import Annotation, SQLiteStore

store = SQLiteStore("/tmp/example_store.db")
store.clear()
rng = np.random.default_rng(0)
cells = [
    Annotation(Point(x, y).buffer(6),
               {"type": "cell", "prob": float(rng.uniform())})
    for x, y in rng.uniform(0, 5000, (2000, 2))
]
store.append_many(cells)
store.append(Annotation(Polygon.from_bounds(1000, 1000, 2000, 2000),
                        {"type": "tumour", "grade": 3}))

# spatial query with a DSL predicate (compiled to SQL on this backend)
hits = store.query((900, 900, 2100, 2100),
                   where='(props["type"] == "cell") & (props["prob"] > 0.8)')
print("high-prob cells near tumour:", len(hits))
print("distinct types:", store.pquery('props["type"]'))
store.dump("/tmp/example_store_out.db")
